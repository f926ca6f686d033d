package graft

import graft.etl.IncrementalTracker
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class IncrementalTrackerSpec extends AnyFunSuite with SparkSuite {

  test("two incremental batches cover exactly the full table, no overlap") {
    val orders = Tables.load(spark, sfDir, "orders")
    val early = orders.filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
    // run 1: only early data exists
    val (b1, w1) = IncrementalTracker.incrementalBatch(early, "o_orderdate", None)
    assert(b1.count() == early.count())
    // run 2: full table arrives; batch 2 = strictly-later rows only
    val (b2, w2) = IncrementalTracker.incrementalBatch(orders, "o_orderdate", w1)
    assert(b1.count() + b2.count() <= orders.count()) // ties at the watermark stay excluded
    val expected = orders.filter(col("o_orderdate") >
      lit(w1.get).cast(orders.schema("o_orderdate").dataType)).count()
    assert(b2.count() == expected)
    assert(w2.get >= w1.get)
    // run 3: nothing new → empty batch, watermark retained
    val (b3, w3) = IncrementalTracker.incrementalBatch(orders, "o_orderdate", w2)
    assert(b3.count() == 0 && w3 == w2)
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
