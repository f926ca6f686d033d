package graft

import org.scalatest.funsuite.AnyFunSuite

/** Positive plan assertions for the round-10 staging rewrite: the
  * kNN-graph / embedding-pair generators score pairs INSIDE the
  * cell-keyed join (vectors attached to assignment rows once), so no
  * pair-sized relation of full vector arrays is ever exchanged — the
  * regression that spilled at the 30× corpus (knn staging 205.7 s →
  * 20.1 s, emb pairs 101.3 s → 3.5 s after the rewrite). Pin the
  * shape so a pair-list-first plan can't sneak back.
  */
class R10PlanShapeSpec extends AnyFunSuite with SparkSuite {

  private def stagePlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("kNN-graph stage: joins are cell-keyed; no exchange ever carries a pair of vector arrays") {
    val p = stagePlan(graft.ops.Similarity.knnGraphUnsorted(spark, sfDir))
    // the scoring join must be keyed on the cell
    assert(p.contains("cell"), s"expected a cell-keyed join:\n$p")
    // no exchange may ship BOTH sides' vector arrays (va AND vb in one
    // hashpartitioning row = the pair-sized wide shuffle we removed);
    // the post-score aggregate exchanges only skinny (a, b, sim) rows
    val wideExchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .count(l => l.contains("va") && l.contains("vb"))
    assert(wideExchanges == 0,
      s"an exchange carries both vector arrays (pair-sized wide shuffle):\n$p")
    // the dedupe aggregate is keyed on the skinny pair, after scoring
    assert(p.contains("vec_a") && p.contains("vec_b"))
  }

  test("embedding-pair stage: same cell-local shape, tau filter before the pair aggregate") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val p = stagePlan(graft.ops.Dedup.embeddingPairsIvf(emb, 0.4))
    val wideExchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .count(l => l.contains("va") && l.contains("vb"))
    assert(wideExchanges == 0,
      s"an exchange carries both vector arrays (pair-sized wide shuffle):\n$p")
  }
}
