package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ev_hll_distinct invariants: estimate quality and — the property
  * that makes HLL the 100 TB structure — mergeability: registers over
  * a union equal the cell-wise max of per-shard registers, so
  * sketches combine across partitions/days without re-reading data.
  */
class HllSpec extends AnyFunSuite with SparkSuite {

  test("estimate is within 2-sigma HLL error of the exact count") {
    val df = Registry.byName("ev_hll_distinct").run(spark, sfDir).cache()
    assert(df.count() > 0)
    // m=64 → stddev ≈ 1.04/√64 = 13%; allow 2σ
    assert(df.filter(col("err_ppm") > 300000).count() == 0)
  }

  test("registers are mergeable: union registers == cell-wise max of shard registers") {
    val ev = Tables.events(spark, sfDir)
    val full = graft.queries.EventOps.hllRegisters(ev)
    val shardA = graft.queries.EventOps.hllRegisters(ev.filter(col("user_id") % 2 === 0))
    val shardB = graft.queries.EventOps.hllRegisters(ev.filter(col("user_id") % 2 =!= 0))
    val merged = shardA.select(col("event_type"), col("idx"), col("mj"))
      .union(shardB.select(col("event_type"), col("idx"), col("mj")))
      .groupBy("event_type", "idx").agg(max(col("mj")).as("mj"))
    val mismatch = full.as("f")
      .join(merged.as("m"), Seq("event_type", "idx"), "full_outer")
      .filter(col("f.mj").isNull || col("m.mj").isNull || col("f.mj") =!= col("m.mj"))
    assert(mismatch.count() == 0)
  }
}
