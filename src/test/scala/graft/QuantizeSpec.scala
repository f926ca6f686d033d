package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization invariants beyond the oracle hash check:
  * encode completeness, compression accounting, and ADC recall
  * against exact L2 ground truth (PQ approximates L2 distance —
  * cosine ops have their own LSH/IVF paths).
  */
class QuantizeSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("ADC top-k recalls most of the exact-L2 top-k") {
    val e = Dedup.withNorm(Tables.load(spark, sfDir, "embeddings"))
      .select(col("vec_id"), col("v"), col("nrm")).cache()
    // exact L2² top-5 per query: |q|² − 2q·c + |c|²
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d2"), col("neighbor_id"))
    val exact = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("d2", col("qn") - lit(2) * expr("graft_array_dot(qv, cv)") + col("cn"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val pq = run("emb_pq").cache()
    val got = pq.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    info(s"emb_pq ADC recall vs exact L2 top-5: $recall")
    // 4-byte codes vs 256-byte vectors: the ADC shortlist + exact
    // re-rank must still land most of the true neighborhood
    assert(recall >= 0.7, s"PQ recall collapsed: $recall")
    // rank column well-formed
    assert(pq.filter(col("rank") < 1 || col("rank") > 5).count() == 0)
    assert(pq.groupBy("query_id").count().filter(col("count") =!= 5).count() == 0)
  }

  test("deterministic across runs and output sorted") {
    val a = run("emb_pq").collect().toSeq
    val b = run("emb_pq").collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("sim_ivf_pq recalls most of the exact cosine top-k") {
    // normalized L2 ranks exactly like cosine, so the ground truth is
    // the brute cosine op's (query, neighbor) set
    val exact = run("sim_knn_brute").select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = run("sim_ivf_pq").cache()
    val pairs = got.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(pairs.contains).toDouble / exact.size
    info(s"sim_ivf_pq recall vs exact cosine top-5: $recall")
    // cell pruning (nprobe=2 of ~sqrt(N) cells) + 4-bit ADC shortlist
    // compound; the composed index must still land most of the truth
    assert(recall >= 0.5, s"IVF-PQ recall collapsed: $recall")
    assert(got.groupBy("query_id").count().filter(col("count") =!= 5).count() == 0)
    got.unpersist()
  }
}
