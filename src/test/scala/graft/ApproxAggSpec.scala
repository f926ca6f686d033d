package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate aggregates (HLL distinct, quantile sketches) — the
  * 100 TB substitutes for exact distinct/percentile. Not
  * oracle-checkable (sketch internals are engine-specific), so the
  * contract here is tolerance against the exact answers.
  */
class ApproxAggSpec extends AnyFunSuite with SparkSuite {

  test("approx_count_distinct within 5% of exact on every grouping") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val rows = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("exact"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (e, a) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e < 0.05, s"${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("approx_percentile brackets the exact median") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val approx = li.agg(expr("approx_percentile(l_extendedprice, 0.5, 1000)")).head().getDouble(0)
    val exact = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0).head
    assert(math.abs(approx - exact) / exact < 0.02)
  }
}
