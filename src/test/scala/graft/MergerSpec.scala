package graft

import graft.etl.Merger
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MergerSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def dw = Seq((1L, 1, "a"), (2L, 1, "b"), (3L, 1, "c")).toDF("k", "version", "v")
  private def stg = Seq((2L, 2, "b2"), (4L, 1, "d")).toDF("k", "version", "v")

  test("upsert: updates win, inserts land, untouched rows survive") {
    val m = Merger.upsert(dw, stg, Seq("k"), Seq(col("version").desc))
      .orderBy("k").as[(Long, Int, String)].collect().toSeq
    assert(m == Seq((1L, 1, "a"), (2L, 2, "b2"), (3L, 1, "c"), (4L, 1, "d")))
  }

  test("upsert is idempotent") {
    val once = Merger.upsert(dw, stg, Seq("k"), Seq(col("version").desc))
    val twice = Merger.upsert(once, stg, Seq("k"), Seq(col("version").desc))
    assert(twice.orderBy("k").collect().toSeq == once.orderBy("k").collect().toSeq)
  }

  test("dedupLatest keeps exactly the newest row per key") {
    val replayed = dw.unionByName(dw).unionByName(stg.filter($"k" === 2L))
    val d = Merger.dedupLatest(replayed, Seq("k"), Seq(col("version").desc))
    assert(d.count() == 3)
    assert(d.filter($"k" === 2L).select("v").as[String].head() == "b2")
  }

  test("scd2: contiguous ranges, sentinel end, single current per key") {
    val hist = Seq((1L, 1, "2020-01-01"), (1L, 2, "2020-02-01"), (1L, 3, "2020-03-01"))
      .toDF("k", "version", "eff").withColumn("eff", col("eff").cast("date"))
    val out = Merger.scd2(hist, Seq("k"), Seq(col("version")), col("eff"))
      .orderBy("version")
      .select("valid_from", "valid_to", "is_current")
      .as[(java.sql.Date, java.sql.Date, Int)].collect().toSeq
    assert(out.map(_._3) == Seq(0, 0, 1))
    assert(out(0)._2 == out(1)._1) // contiguous
    assert(out(2)._2.toString == Merger.OpenEnd)
  }
}
