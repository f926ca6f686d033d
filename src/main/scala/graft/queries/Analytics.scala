package graft.queries

import graft.{Op, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Analytical warehouse workload over the star schema.
  *
  * The reference's DW is built for exactly this consumption layer
  * (ref: /root/reference/source_code/sql/1. Metadata Creation.sql —
  * DW_Output_* tables feed an analytical warehouse); the reference
  * repo leaves the queries implicit, so we provide a TPC-H-shaped
  * suite over the same table shapes.
  *
  * Oracle-parity rules (SURVEY.md §5):
  *  - Money arithmetic casts each FACTOR to decimal before
  *    multiplying (decimal×decimal is exact in any engine); casting a
  *    multi-factor double product directly to decimal is
  *    engine-dependent at FP midpoints.
  *  - Aggregate sums stay decimal (exact, order-independent), then
  *    the final value is rounded to DECIMAL(38,4) and cast to DOUBLE
  *    (unscaled < 2^53 ⇒ the double is exact and bit-identical across
  *    engines and dataframe libraries).
  *  - Top-N is always a strict total order (measure DESC, unique key)
  *    so LIMIT is deterministic and plans as TakeOrderedAndProject.
  */
object Analytics {

  /** 2-dp money column, cast exactly. */
  private def money(c: Column): Column = c.cast("decimal(18,2)")

  /** Small rate factor (1±discount/tax), 4 dp. */
  private def rate(c: Column): Column = c.cast("decimal(8,4)")

  /** Final output normalization: round exact decimal to 4 dp, emit
    * double (exact for |unscaled| < 2^53).
    */
  private def fin(c: Column): Column = c.cast("decimal(38,4)").cast("double")

  private def revenueRow: Column =
    money(col("l_extendedprice")) * rate(lit(1) - col("l_discount"))
  private def chargeRow: Column = revenueRow * rate(lit(1) + col("l_tax"))

  /** SQL fragments mirroring the helpers above, byte-for-byte the same semantics. */
  private val revSql = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1-l_discount AS DECIMAL(8,4))"
  private val chargeSql = s"$revSql * CAST(1+l_tax AS DECIMAL(8,4))"
  // round() first: DuckDB's decimal→decimal scale-down cast TRUNCATES,
  // while Spark's rounds HALF_UP; DuckDB round() is half-away (== Spark
  // HALF_UP for the non-negative money values here).
  private def finSql(inner: String): String =
    s"CAST(CAST(round($inner, 4) AS DECIMAL(28,4)) AS DOUBLE)"

  private def li(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "lineitem")
  private def ord(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "orders")
  private def cust(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "customer")

  // ---------------------------------------------------------------
  // q1_pricing_summary — multi-aggregate scan (TPC-H Q1 shape).
  // Single shuffle on a 6-value grouping key; partial aggregation
  // does virtually all the work map-side at 100 TB.
  // ---------------------------------------------------------------
  private def q1(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        fin(sum(money(col("l_quantity")))).as("sum_qty"),
        fin(sum(money(col("l_extendedprice")))).as("sum_base_price"),
        fin(sum(revenueRow)).as("sum_disc_price"),
        fin(sum(chargeRow)).as("sum_charge"),
        round(sum(money(col("l_quantity"))).cast("double") / count(lit(1)), 4).as("avg_qty"),
        round(sum(rate(col("l_discount"))).cast("double") / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q1Sql =
    s"""SELECT l_returnflag, l_linestatus,
      | ${finSql("sum(CAST(l_quantity AS DECIMAL(18,2)))")} AS sum_qty,
      | ${finSql("sum(CAST(l_extendedprice AS DECIMAL(18,2)))")} AS sum_base_price,
      | ${finSql(s"sum($revSql)")} AS sum_disc_price,
      | ${finSql(s"sum($chargeSql)")} AS sum_charge,
      | round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/count(*), 4) AS avg_qty,
      | round(CAST(sum(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE)/count(*), 6) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------
  // q3_top_orders — shipping-priority style: 3-way join + agg +
  // deterministic top-10 (strict order ⇒ TakeOrderedAndProject).
  // ---------------------------------------------------------------
  private def q3(s: SparkSession, dir: String): DataFrame = {
    val c = cust(s, dir).filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = ord(s, dir).filter(col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
    val l = li(s, dir).filter(col("l_shipdate") > lit("1997-07-01").cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), to_date(col("o_orderdate")).as("orderdate"), col("o_orderpriority"))
      .agg(fin(sum(revenueRow)).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  private val q3Sql =
    s"""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority,
      | ${finSql(s"sum($revSql)")} AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-07-01 00:00:00'
      |GROUP BY o_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------
  // q4_order_priority — EXISTS via left-semi join (semi stops at
  // first match; no fact-side dedup shuffle).
  // ---------------------------------------------------------------
  private def q4(s: SparkSession, dir: String): DataFrame = {
    val o = ord(s, dir)
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
    val returned = li(s, dir).filter(col("l_returnflag") === "R").select("l_orderkey")
    o.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  private val q4Sql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------
  // q5_region_revenue — 6-way star join. Dims (region, nation,
  // supplier) are broadcast: at warehouse ratios they stay tiny
  // relative to the facts, so the only shuffles are fact-side
  // joins/agg.
  // ---------------------------------------------------------------
  private def q5(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = Tables.load(s, dir, "nation")
    val sup = Tables.load(s, dir, "supplier")
    val nr = broadcast(n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name"))
    val c = cust(s, dir).join(nr, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val o = ord(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    li(s, dir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(fin(sum(revenueRow)).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q5Sql =
    s"""SELECT n_name,
      | ${finSql(s"sum($revSql)")} AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------
  // q6_revenue_delta — selective scan + single-row agg; filters and
  // the 4-column projection push to the parquet reader.
  // ---------------------------------------------------------------
  private def q6(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(
        fin(sum(money(col("l_extendedprice")) * rate(col("l_discount")))).as("revenue"),
        count(lit(1)).as("n_lines"))

  private val q6Sql =
    s"""SELECT
      | ${finSql("sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(8,4)))")} AS revenue,
      | count(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------
  // q10_returned_customers — returned-item revenue per customer,
  // deterministic top-20.
  // ---------------------------------------------------------------
  private def q10(s: SparkSession, dir: String): DataFrame = {
    val o = ord(s, dir)
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
    val l = li(s, dir).filter(col("l_returnflag") === "R")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cust(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name", "c_mktsegment")
      .agg(fin(sum(revenueRow)).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  private val q10Sql =
    s"""SELECT c_custkey, c_name, c_mktsegment,
      | ${finSql(s"sum($revSql)")} AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
      |GROUP BY c_custkey, c_name, c_mktsegment
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------
  // q_anti_join — customers with no URGENT orders (left-anti).
  // ---------------------------------------------------------------
  private def qAnti(s: SparkSession, dir: String): DataFrame = {
    val urgent = ord(s, dir).filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    cust(s, dir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  private val qAntiSql =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------
  // q_topn_per_group — top-3 parts by revenue per brand. The window
  // is PARTITIONed (one shuffle on p_brand), never a global sort.
  // ---------------------------------------------------------------
  private def qTopN(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part").select("p_partkey", "p_name", "p_brand")
    val rev = li(s, dir)
      .groupBy("l_partkey")
      .agg(fin(sum(revenueRow)).as("revenue"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val w = Window.partitionBy(col("p_brand")).orderBy(col("revenue").desc, col("p_partkey"))
    rev.withColumn("rank_in_brand", row_number().over(w))
      .filter(col("rank_in_brand") <= 3)
      .select("p_brand", "rank_in_brand", "p_partkey", "p_name", "revenue")
      .orderBy("p_brand", "rank_in_brand")
  }

  private val qTopNSql =
    s"""SELECT p_brand, rank_in_brand, p_partkey, p_name, revenue FROM (
      |  SELECT p_brand, p_partkey, p_name, revenue,
      |    row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rank_in_brand
      |  FROM (
      |    SELECT l_partkey,
      |      ${finSql(s"sum($revSql)")} AS revenue
      |    FROM lineitem GROUP BY l_partkey
      |  ) r JOIN part ON l_partkey = p_partkey
      |) x WHERE rank_in_brand <= 3
      |ORDER BY p_brand, rank_in_brand""".stripMargin

  // ---------------------------------------------------------------
  // q_running_total — daily totals + running sum. Aggregate FIRST
  // (to ~date cardinality), window after: the unpartitioned window
  // only ever sees #days rows, not the fact table. The running sum
  // stays decimal inside the window (exact prefix sums), doubles out.
  // ---------------------------------------------------------------
  private def qRunning(s: SparkSession, dir: String): DataFrame = {
    val daily = ord(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("order_day"))
      .agg(sum(money(col("o_totalprice"))).as("day_total_dec"), count(lit(1)).as("n_orders"))
    val w = Window.orderBy("order_day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("running_total", fin(sum(col("day_total_dec")).over(w)))
      .select(col("order_day"), fin(col("day_total_dec")).as("day_total"),
        col("n_orders"), col("running_total"))
      .orderBy("order_day")
  }

  private val qRunningSql =
    s"""SELECT order_day, ${finSql("day_total_dec")} AS day_total, n_orders,
      | ${finSql("sum(day_total_dec) OVER (ORDER BY order_day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS running_total
      |FROM (
      |  SELECT CAST(o_orderdate AS DATE) AS order_day,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS day_total_dec,
      |    count(*) AS n_orders
      |  FROM orders GROUP BY CAST(o_orderdate AS DATE)
      |) d
      |ORDER BY order_day""".stripMargin

  // ---------------------------------------------------------------
  // q_rollup — hierarchical region→nation subtotals + grand total.
  // ---------------------------------------------------------------
  private def qRollup(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.load(s, dir, "nation")
    val r = Tables.load(s, dir, "region")
    cust(s, dir)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), fin(sum(money(col("c_acctbal")))).as("sum_acctbal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("n_customers"), col("sum_acctbal"))
      .orderBy("region_name", "nation_name")
  }

  private val qRollupSql =
    s"""SELECT coalesce(r_name, 'ALL') AS region_name, coalesce(n_name, 'ALL') AS nation_name,
      | count(*) AS n_customers,
      | ${finSql("sum(CAST(c_acctbal AS DECIMAL(18,2)))")} AS sum_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY region_name, nation_name""".stripMargin

  // ---------------------------------------------------------------
  // q_conditional_pivot — manual pivot via conditional aggregation
  // (explicit aliases; portable, unlike dialect PIVOT).
  // ---------------------------------------------------------------
  private def qPivot(s: SparkSession, dir: String): DataFrame = {
    def flagSum(flag: String): Column =
      fin(sum(when(col("l_returnflag") === flag, money(col("l_quantity")))))
    li(s, dir)
      .groupBy("l_linestatus")
      .agg(
        flagSum("A").as("qty_a"),
        flagSum("N").as("qty_n"),
        flagSum("R").as("qty_r"),
        count(lit(1)).as("n_lines"))
      .orderBy("l_linestatus")
  }

  private val qPivotSql = {
    def flagSumSql(flag: String) =
      finSql(s"sum(CASE WHEN l_returnflag='$flag' THEN CAST(l_quantity AS DECIMAL(18,2)) END)")
    s"""SELECT l_linestatus,
      | ${flagSumSql("A")} AS qty_a,
      | ${flagSumSql("N")} AS qty_n,
      | ${flagSumSql("R")} AS qty_r,
      | count(*) AS n_lines
      |FROM lineitem
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin
  }

  // ---------------------------------------------------------------
  // q14_promo_ratio — conditional revenue share (promo vs total) in
  // a ship-date window.
  // ---------------------------------------------------------------
  private def q14(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part").select("p_partkey", "p_type")
    li(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        fin(sum(when(col("p_type") === "PROMO", revenueRow))).as("promo_revenue"),
        fin(sum(revenueRow)).as("total_revenue"),
        count(lit(1)).as("n_lines"))
      .withColumn("promo_pct",
        round(col("promo_revenue") / col("total_revenue") * 100, 4))
  }

  private val q14Sql =
    s"""SELECT promo_revenue, total_revenue, n_lines,
      | round(promo_revenue / total_revenue * 100, 4) AS promo_pct
      |FROM (
      |  SELECT
      |    ${finSql(s"sum(CASE WHEN p_type='PROMO' THEN $revSql END)")} AS promo_revenue,
      |    ${finSql(s"sum($revSql)")} AS total_revenue,
      |    count(*) AS n_lines
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |) t""".stripMargin

  // ---------------------------------------------------------------
  // q17_small_quantity — correlated aggregate subquery: lines whose
  // quantity is below half their part's average. Expressed as
  // aggregate-then-join after an r3 A/B against the r2 window form
  // (sf0.1, local[32], min of 3 warm runs): agg-join 0.740s vs
  // window 0.822s. The plans explain why at 100 TB too: the window
  // form Exchange+Sorts the ENTIRE fact on l_partkey (the sort spill
  // is the scale risk), where this form map-side-combines the per-part
  // averages (partial HashAggregate → small shuffle) and
  // broadcast-joins them back — the fact table itself is never
  // shuffled or sorted, just scanned twice (cheap: column-pruned
  // 3-column scan). The decimal sum keeps the average engine-exact.
  // ---------------------------------------------------------------
  private def q17(s: SparkSession, dir: String): DataFrame = {
    val l = li(s, dir)
    val avgs = l.groupBy("l_partkey")
      .agg((sum(money(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"))
    l.select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(avgs, "l_partkey")
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(
        count(lit(1)).as("n_small_lines"),
        fin(sum(money(col("l_extendedprice")))).as("small_qty_revenue"))
  }

  private val q17Sql =
    s"""SELECT count(*) AS n_small_lines,
      | ${finSql("sum(CAST(l_extendedprice AS DECIMAL(18,2)))")} AS small_qty_revenue
      |FROM lineitem l
      |JOIN (SELECT l_partkey AS pk,
      |        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_qty
      |      FROM lineitem GROUP BY l_partkey) t
      |  ON l.l_partkey = t.pk
      |WHERE l.l_quantity < 0.5 * t.avg_qty""".stripMargin

  // ---------------------------------------------------------------
  // q18_large_orders — HAVING over a fact aggregate, enriched and
  // deterministically top-20.
  // ---------------------------------------------------------------
  private def q18(s: SparkSession, dir: String): DataFrame = {
    val big = li(s, dir)
      .groupBy("l_orderkey")
      .agg(sum(money(col("l_quantity"))).as("sum_qty_dec"))
      .filter(col("sum_qty_dec") > 150)
    big.join(ord(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(cust(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), to_date(col("o_orderdate")).as("orderdate"),
        fin(col("sum_qty_dec")).as("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey"))
      .limit(20)
  }

  private val q18Sql =
    s"""SELECT o_orderkey, c_name, CAST(o_orderdate AS DATE) AS orderdate,
      | ${finSql("sum_qty_dec")} AS sum_qty
      |FROM (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty_dec
      |      FROM lineitem GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150) b
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY sum_qty DESC, o_orderkey
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------
  // q_percentiles — exact interpolated percentiles per group (Spark
  // `percentile` == DuckDB `quantile_cont` linear interpolation).
  // ---------------------------------------------------------------
  private def qPct(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50_price"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
        count(lit(1)).as("n_lines"))
      .orderBy("l_returnflag")

  private val qPctSql =
    """SELECT l_returnflag,
      | round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
      | round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
      | round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
      | count(*) AS n_lines
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------
  // q_percentiles_hist — the SAME exact interpolated percentiles, but
  // shuffle-bounded: Spark's exact `percentile` buffers every raw
  // value of a group in one task's memory (billions of doubles per
  // group at 100×), where this path aggregates the (group, value)
  // VALUE-GRID first — prices live on a finite 2-dp grid, so the
  // histogram is orders of magnitude smaller than the data and the
  // cumulative-rank window sorts a bounded, spillable relation. The
  // interpolation replays percentile's formula (pos = p·(n−1),
  // x_lo + frac·(x_hi − x_lo)) over cumulative counts, so results are
  // value-identical to q_percentiles / quantile_cont.
  // ---------------------------------------------------------------
  private def histQuantiles(df: DataFrame, groupCol: String, valCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df.groupBy(col(groupCol), col(valCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy(groupCol).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCol)
    var based = hist
      .withColumn("cum", sum(col("c")).over(wOrd))
      .withColumn("n", sum(col("c")).over(wAll))
    ps.foreach { case (name, p) =>
      val pos = lit(p) * (col("n") - lit(1)).cast("double") // 0-based rank
      val kf = floor(pos) // lower order statistic (0-based)
      based = based
        // rank kf+1 (1-based) falls inside this value's [cum-c+1, cum] run
        .withColumn(s"${name}_lo",
          when(col("cum") - col("c") <= kf && col("cum") >= kf + 1, col("v")))
        .withColumn(s"${name}_hi",
          when(col("cum") - col("c") <= kf + 1 && col("cum") >= kf + 2, col("v")))
        .withColumn(s"${name}_frac", pos - kf)
    }
    val aggCols = ps.map { case (name, _) =>
      val lo = max(col(s"${name}_lo"))
      val hi = max(col(s"${name}_hi"))
      val frac = max(col(s"${name}_frac")) // constant within the group
      round(when(frac === 0.0, lo).otherwise(lo + frac * (hi - lo)), 4).as(name)
    }
    based.groupBy(col(groupCol)).agg(aggCols.head, aggCols.tail: _*)
  }

  private def qPctHist(s: SparkSession, dir: String): DataFrame = {
    val l = li(s, dir)
    val price = histQuantiles(l, "l_returnflag", "l_extendedprice",
      Seq(("p50_price", 0.5), ("p90_price", 0.9)))
    val qty = histQuantiles(l, "l_returnflag", "l_quantity", Seq(("p50_qty", 0.5)))
    val counts = l.groupBy("l_returnflag").agg(count(lit(1)).as("n_lines"))
    price.join(qty, "l_returnflag").join(counts, "l_returnflag")
      .select("l_returnflag", "p50_price", "p90_price", "p50_qty", "n_lines")
      .orderBy("l_returnflag")
  }

  val ops: Seq[Op] = Seq(
    Op("q1_pricing_summary", q1, Some(q1Sql)),
    Op("q_percentiles", qPct, Some(qPctSql)),
    Op("q_percentiles_hist", qPctHist, Some(qPctSql)),
    Op("q14_promo_ratio", q14, Some(q14Sql)),
    Op("q17_small_quantity", q17, Some(q17Sql)),
    Op("q18_large_orders", q18, Some(q18Sql)),
    Op("q3_top_orders", q3, Some(q3Sql)),
    Op("q4_order_priority", q4, Some(q4Sql)),
    Op("q5_region_revenue", q5, Some(q5Sql)),
    Op("q6_revenue_delta", q6, Some(q6Sql)),
    Op("q10_returned_customers", q10, Some(q10Sql)),
    Op("q_anti_join", qAnti, Some(qAntiSql)),
    Op("q_topn_per_group", qTopN, Some(qTopNSql)),
    Op("q_running_total", qRunning, Some(qRunningSql)),
    Op("q_rollup", qRollup, Some(qRollupSql)),
    Op("q_conditional_pivot", qPivot, Some(qPivotSql)))
}
