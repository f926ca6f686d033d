package graft

import graft.etl.{IncrementalTracker, Merger}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class IncrementalTrackerSpec extends AnyFunSuite with SparkSuite {

  test("incremental batches cover the full table; boundary ties re-deliver, never drop") {
    val orders = Tables.load(spark, sfDir, "orders")
    val early = orders.filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
    // run 1: only early data exists
    val (b1, w1) = IncrementalTracker.incrementalBatch(early, "o_orderdate", None)
    assert(b1.count() == early.count())
    // run 2: full table arrives; batch 2 = at-or-later rows (ties at
    // the stored watermark RE-deliver — at-least-once, nothing missed)
    val (b2, w2) = IncrementalTracker.incrementalBatch(orders, "o_orderdate", w1)
    assert(b1.count() + b2.count() >= orders.count())
    val expected = orders.filter(col("o_orderdate") >=
      lit(w1.get).cast(orders.schema("o_orderdate").dataType)).count()
    assert(b2.count() == expected)
    assert(w2.get >= w1.get)
    // union-then-dedup on the key reconstructs exactly the full table
    val replayed = Merger.dedupLatest(
      b1.unionByName(b2), Seq("o_orderkey"), Seq(col("o_orderdate").desc))
    assert(replayed.count() == orders.count())
  }

  test("late rows sharing the watermark timestamp are picked up on the next run") {
    import spark.implicits._
    val run1 = Seq((1L, "2001-01-01 00:00:00"), (2L, "2001-01-02 00:00:00"))
      .toDF("id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val (b1, w1) = IncrementalTracker.incrementalBatch(run1, "ts", None)
    assert(b1.count() == 2)
    // a late row lands with EXACTLY the stored watermark timestamp
    val run2 = Seq((1L, "2001-01-01 00:00:00"), (2L, "2001-01-02 00:00:00"),
        (3L, "2001-01-02 00:00:00"))
      .toDF("id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val (b2, _) = IncrementalTracker.incrementalBatch(run2, "ts", w1)
    assert(b2.select("id").as[Long].collect().toSet == Set(2L, 3L)) // 3 not lost
    // strictBatch (unique-watermark fast path) would have missed id=3
    val (s2, _) = IncrementalTracker.strictBatch(run2, "ts", w1)
    assert(s2.count() == 0)
  }

  test("exactlyOnceLoad: re-delivered boundary rows collapse in the keyed merge") {
    import spark.implicits._
    val target = Seq((1L, "2001-01-01 00:00:00", "a"), (2L, "2001-01-02 00:00:00", "b"))
      .toDF("id", "ts", "payload").withColumn("ts", col("ts").cast("timestamp"))
    val (_, w1) = IncrementalTracker.incrementalBatch(target, "ts", None)
    val arrivals = Seq((2L, "2001-01-02 00:00:00", "b"), (3L, "2001-01-02 00:00:00", "c"),
        (4L, "2001-01-03 00:00:00", "d"))
      .toDF("id", "ts", "payload").withColumn("ts", col("ts").cast("timestamp"))
    val (merged, w2) = IncrementalTracker.exactlyOnceLoad(
      target, arrivals, "ts", w1, Seq("id"), Seq(col("ts").desc))
    assert(merged.count() == 4) // 1,2,3,4 — no dup of 2, no loss of 3
    assert(w2.get > w1.get)
  }

  test("timestamp watermark string round-trip keeps sub-second precision") {
    import spark.implicits._
    val df = Seq((1L, "2001-01-01 00:00:00.123456"))
      .toDF("id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val (_, w) = IncrementalTracker.incrementalBatch(df, "ts", None)
    assert(w.get == "2001-01-01 00:00:00.123456")
    // a row 1µs later is strictly above the recovered bound
    val df2 = Seq((1L, "2001-01-01 00:00:00.123456"), (2L, "2001-01-01 00:00:00.123457"))
      .toDF("id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val (s, _) = IncrementalTracker.strictBatch(df2, "ts", w)
    assert(s.select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("watermark store round-trips through parquet") {
    val tmp = Files.createTempDirectory("graft_wm").toString
    assert(IncrementalTracker.loadWatermarks(spark, tmp).isEmpty)
    IncrementalTracker.saveWatermarks(spark, tmp,
      Map("orders" -> "2001-08-01 00:00:00", "lineitem" -> "2001-11-04 00:00:00"))
    val back = IncrementalTracker.loadWatermarks(spark, tmp)
    assert(back == Map("orders" -> "2001-08-01 00:00:00", "lineitem" -> "2001-11-04 00:00:00"))
  }
}
