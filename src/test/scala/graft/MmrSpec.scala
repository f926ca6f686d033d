package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** sim_mmr must equal a driver-side greedy MMR over the same exact
  * integer sims (the unrolled DataFrame steps ARE the algorithm, not
  * an approximation of it), and etl_k_anonymity must conserve rows.
  */
class MmrSpec extends AnyFunSuite with SparkSuite {

  test("sim_mmr equals a driver-side greedy MMR over exact sim4 integers") {
    val emb = Tables.load(spark, sfDir, "embeddings").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    def sim4(a: Array[Double], b: Array[Double]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = a.map(x => x * x).sum; val nb = b.map(x => x * x).sum
      math.round(10000 * dot / math.sqrt(na * nb))
    }
    val queries = emb.keys.filter(_ < 20).toSeq.sorted
    val expected = queries.flatMap { q =>
      val pool = emb.keys.filter(_ != q).toSeq
        .map(c => c -> sim4(emb(q), emb(c)))
        .sortBy { case (c, s0) => (-s0, c) }.take(20)
      val poolMap = pool.toMap
      var sel = Vector.empty[(Long, Long, Long)] // (cid, sim4, score10)
      for (k <- 1 to 5) {
        val pick =
          if (k == 1) { val (c, s0) = pool.head; (c, s0, 7 * s0) }
          else {
            pool.filterNot { case (c, _) => sel.exists(_._1 == c) }
              .map { case (c, s0) =>
                val pen = sel.map(x => sim4(emb(c), emb(x._1))).max
                (c, s0, 7 * s0 - 3 * pen)
              }.minBy { case (c, _, sc) => (-sc, c) }
          }
        sel = sel :+ pick
      }
      sel.zipWithIndex.map { case ((c, s0, sc), i) => (q, (i + 1).toLong, c, s0, sc) }
    }.toSet

    val got = Registry.byName("sim_mmr").run(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("sim4"), r.getAs[Long]("score10")))
      .toSet
    assert(got == expected)
    // diversification is real: for some query the MMR set differs
    // from the plain top-5 (otherwise the penalty term is inert)
    val plainTop5 = queries.flatMap { q =>
      emb.keys.filter(_ != q).toSeq.map(c => c -> sim4(emb(q), emb(c)))
        .sortBy { case (c, s0) => (-s0, c) }.take(5).map(c => (q, c._1))
    }.toSet
    val mmrPairs = got.map { case (q, _, c, _, _) => (q, c) }
    assert(mmrPairs != plainTop5, "MMR never diverged from plain top-5")
  }

  test("etl_k_anonymity conserves rows and verdicts match sizes") {
    val out = Registry.byName("etl_k_anonymity").run(spark, sfDir).collect()
    val total = out.map(_.getAs[Long]("n")).sum
    assert(total == Tables.load(spark, sfDir, "customer").count())
    for (r <- out)
      assert((r.getAs[Int]("is_safe") == 1) == (r.getAs[Long]("n") >= 5))
  }
}
