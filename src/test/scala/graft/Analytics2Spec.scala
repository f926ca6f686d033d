package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the second analytics pack (cross-checking the
  * DuckDB oracle with structural properties the SQL can't state).
  */
class Analytics2Spec extends AnyFunSuite with SparkSuite {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("q13: the distribution accounts for every customer exactly once") {
    val total = run("q13_customer_distribution")
      .agg(sum(col("custdist"))).head().getLong(0)
    assert(total == Tables.load(spark, sfDir, "customer").count())
  }

  test("q_cube: the grand-total cell equals the table rowcount; gid partitions nest") {
    val cube = run("q_cube").cache()
    val n = Tables.load(spark, sfDir, "lineitem").count()
    val grand = cube.filter(col("gid") === 3).agg(sum(col("n_lines"))).head().getLong(0)
    assert(grand == n)
    // every gid slice re-sums to the same grand total
    Seq(0, 1, 2).foreach { g =>
      assert(cube.filter(col("gid") === g).agg(sum(col("n_lines"))).head().getLong(0) == n)
    }
  }

  test("q15: every returned supplier carries the same (maximum) revenue") {
    val rows = run("q15_top_supplier").select("total_revenue").distinct().count()
    assert(rows == 1)
  }

  test("q_ntile_cume: only the top quartile survives and cume is in (0, 1]") {
    val df = run("q_ntile_cume").cache()
    assert(df.filter(col("quartile") =!= 4).count() == 0)
    assert(df.filter(col("cume") <= 0 || col("cume") > 1).count() == 0)
  }

  test("q22: counted churned customers are a subset of the recent-order anti-join") {
    val idle = Tables.load(spark, sfDir, "customer")
      .join(Tables.load(spark, sfDir, "orders")
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti").count()
    val counted = run("q22_idle_customers").agg(sum(col("n_custs"))).head().getLong(0)
    assert(counted <= idle && counted > 0)
  }

  test("q_window_range: trailing sum >= day total, equality on isolated days") {
    val df = run("q_window_range")
    assert(df.filter(col("trailing_7d") < col("day_total")).count() == 0)
  }

  test("q_mom_growth: growth matches the revenue pair it reports") {
    val bad = run("q_mom_growth")
      .withColumn("recomputed",
        round((col("revenue") - col("prev_revenue")) / col("prev_revenue") * 100, 4))
      .filter(col("recomputed") =!= col("growth_pct"))
    assert(bad.count() == 0)
  }

  test("q7/q8/q12/q19/q21 run non-empty at sf0.001") {
    Seq("q7_nation_volume", "q8_market_share", "q12_late_lines",
      "q19_disjunctive", "q21_sole_blame").foreach { name =>
      assert(run(name).count() > 0, s"$name returned no rows")
    }
  }
}
