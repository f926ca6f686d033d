package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ev_quantile_sketch invariants: the log2-bucket estimate's
  * by-construction envelope (exact ≤ est < 2·exact) and — the 100 TB
  * property — mergeability: cells over a union equal the cell-wise
  * SUM of per-shard cells, so per-day/per-partition sketches combine
  * without re-reading data.
  */
class QuantileSketchSpec extends AnyFunSuite with SparkSuite {

  test("estimate envelope: exact <= est < 2*exact for every (type, q)") {
    val df = Registry.byName("ev_quantile_sketch").run(spark, sfDir).cache()
    assert(df.count() > 0)
    assert(df.filter(col("est_cents") < col("exact_cents")).count() == 0)
    assert(df.filter(col("est_cents") >= col("exact_cents") * 2).count() == 0)
    // slack audit is consistent with the two columns it summarizes
    assert(df.filter(col("slack_ppm") < 0 || col("slack_ppm") >= 1000000L).count() == 0)
  }

  test("cells are mergeable: union cells == cell-wise sum of shard cells") {
    val ev = Tables.events(spark, sfDir)
    val full = graft.queries.EventOps.qsketchCells(ev)
    val shardA = graft.queries.EventOps.qsketchCells(ev.filter(col("user_id") % 2 === 0))
    val shardB = graft.queries.EventOps.qsketchCells(ev.filter(col("user_id") % 2 =!= 0))
    val merged = shardA.union(shardB)
      .groupBy("event_type", "bucket").agg(sum(col("cnt")).as("cnt"))
    val mismatch = full.as("f")
      .join(merged.as("m"), Seq("event_type", "bucket"), "full_outer")
      .filter(col("f.cnt").isNull || col("m.cnt").isNull || col("f.cnt") =!= col("m.cnt"))
    assert(mismatch.count() == 0)
  }
}
