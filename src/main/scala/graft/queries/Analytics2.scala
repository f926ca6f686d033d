package graft.queries

import graft.{Op, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Second analytics pack — the remaining TPC-H-shaped workload
  * expressible directly over the available star schema (the
  * partsupp-dependent Q2/Q11/Q16/Q20 shapes live in [[Analytics3]],
  * adapted over the observed supply relation), plus
  * window-function coverage (ntile/cume_dist, RANGE frames, lag-based
  * growth) and CUBE grouping. (ref: /root/reference/source_code/sql/
  * "1. Metadata Creation.sql" DW_Output_* — the warehouse these
  * queries consume is the one that metadata model loads.)
  *
  * Same oracle-parity discipline as [[Analytics]] (SURVEY.md §5):
  * decimal-exact money sums, round-then-cast finalization, strict
  * total orders on every ranked output, matched integer widths.
  */
object Analytics2 {

  private def money(c: Column): Column = c.cast("decimal(18,2)")
  private def rate(c: Column): Column = c.cast("decimal(8,4)")
  private def fin(c: Column): Column = c.cast("decimal(38,4)").cast("double")
  private def revenueRow: Column =
    money(col("l_extendedprice")) * rate(lit(1) - col("l_discount"))

  private val revSql = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1-l_discount AS DECIMAL(8,4))"
  private def finSql(inner: String): String =
    s"CAST(CAST(round($inner, 4) AS DECIMAL(28,4)) AS DOUBLE)"

  private def li(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "lineitem")
  private def ord(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "orders")
  private def cust(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "customer")
  private def sup(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "supplier")
  private def nat(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "nation")

  // ---------------------------------------------------------------
  // q7_nation_volume — TPC-H Q7 shape: cross-border shipping volume
  // between two trading blocs (ASIA-based suppliers selling to
  // EUROPE-based customers and vice versa) by (supplier nation,
  // customer nation, ship year). Both nation→region lookups
  // broadcast; the facts shuffle only on the join keys.
  // ---------------------------------------------------------------
  private val RegionA = "ASIA"
  private val RegionB = "EUROPE"

  private def q7(s: SparkSession, dir: String): DataFrame = {
    val n = nat(s, dir)
      .join(broadcast(Tables.load(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
    val sn = broadcast(sup(s, dir).join(n, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"), col("r_name").as("supp_region")))
    val cn = cust(s, dir).join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"), col("r_name").as("cust_region"))
    li(s, dir)
      .join(ord(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(cn, col("o_custkey") === col("c_custkey"))
      .join(sn, col("l_suppkey") === col("s_suppkey"))
      .filter((col("supp_region") === RegionA && col("cust_region") === RegionB) ||
        (col("supp_region") === RegionB && col("cust_region") === RegionA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("int").as("l_year"))
      .agg(fin(sum(revenueRow)).as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  private val q7Sql =
    s"""SELECT supp_nation, cust_nation, l_year,
      | ${finSql("sum(volume)")} AS revenue, count(*) AS n_lines
      |FROM (
      |  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS INT) AS l_year, $revSql AS volume
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  JOIN region sr ON sn.n_regionkey = sr.r_regionkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  JOIN region cr ON cn.n_regionkey = cr.r_regionkey
      |  WHERE (sr.r_name = '$RegionA' AND cr.r_name = '$RegionB')
      |     OR (sr.r_name = '$RegionB' AND cr.r_name = '$RegionA')
      |) v
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // ---------------------------------------------------------------
  // q8_market_share — TPC-H Q8 shape: a supplier nation's share of
  // STANDARD-part volume sold into ASIA customers, per order year.
  // Share is a ratio of two decimal-exact sums (one pass, conditional
  // aggregation — no second scan for the denominator).
  // ---------------------------------------------------------------
  private val ShareNation = "NATION_3"

  private def q8(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part").filter(col("p_type") === "STANDARD").select("p_partkey")
    val n = nat(s, dir)
    val r = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
    val cn = cust(s, dir)
      .join(broadcast(n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey")), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val sn = broadcast(sup(s, dir).join(n, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    li(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(ord(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cn, col("o_custkey") === col("c_custkey"))
      .join(sn, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(
        fin(sum(when(col("supp_nation") === ShareNation, revenueRow))).as("nation_volume"),
        fin(sum(revenueRow)).as("total_volume"))
      .withColumn("mkt_share_pct",
        round(col("nation_volume") / col("total_volume") * 100, 4))
      .orderBy("o_year")
  }

  private val q8Sql =
    s"""SELECT o_year, nation_volume, total_volume,
      | round(nation_volume / total_volume * 100, 4) AS mkt_share_pct
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |    ${finSql(s"sum(CASE WHEN sn.n_name = '$ShareNation' THEN $revSql END)")} AS nation_volume,
      |    ${finSql(s"sum($revSql)")} AS total_volume
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  JOIN region ON cn.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY CAST(year(o_orderdate) AS INT)
      |) v
      |ORDER BY o_year""".stripMargin

  // ---------------------------------------------------------------
  // q9_product_profit — TPC-H Q9 shape (no partsupp/supplycost table,
  // so unit cost = 80% of p_retailprice): profit by supplier nation ×
  // order year over one part-color slice. Decimal widths are chosen so the
  // 3-factor product stays ≤ 38 digits in BOTH engines (Spark trims
  // scale silently past 38; DuckDB errors) — (12,2)·(12,2)·(3,2) ⇒
  // scale 6, precision ≤ 28, exact everywhere.
  // ---------------------------------------------------------------
  private def q9(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part")
      .filter(col("p_name").contains("blue"))
      .select("p_partkey", "p_retailprice")
    val n = nat(s, dir).select("n_nationkey", "n_name")
    val sn = broadcast(sup(s, dir).join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation")))
    val costRow = col("l_quantity").cast("decimal(12,2)") *
      col("p_retailprice").cast("decimal(12,2)") * lit(0.8).cast("decimal(3,2)")
    li(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(ord(s, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(sn, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(fin(sum(revenueRow - costRow)).as("profit"), count(lit(1)).as("n_lines"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  private val q9Sql =
    s"""SELECT nation, o_year, ${finSql("sum(amount)")} AS profit, count(*) AS n_lines
      |FROM (
      |  SELECT sn.n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      |    $revSql - CAST(l_quantity AS DECIMAL(12,2)) * CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.8 AS DECIMAL(3,2)) AS amount
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  WHERE p_name LIKE '%blue%'
      |) v
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC""".stripMargin

  // ---------------------------------------------------------------
  // q12_late_lines — TPC-H Q12 shape (no shipmode column in the
  // schema, so the dimension is l_linestatus): lines shipped >90 days
  // after the order date, split by order-priority criticality.
  // ---------------------------------------------------------------
  private def q12(s: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li(s, dir)
      .join(ord(s, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))) > 90)
      .groupBy("l_linestatus")
      .agg(
        sum(when(high, 1).otherwise(0)).cast("bigint").as("high_line_count"),
        sum(when(high, 0).otherwise(1)).cast("bigint").as("low_line_count"))
      .orderBy("l_linestatus")
  }

  private val q12Sql =
    """SELECT l_linestatus,
      | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 90
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  // ---------------------------------------------------------------
  // q13_customer_distribution — TPC-H Q13: orders-per-customer via
  // LEFT join (customers with zero orders kept), then the histogram
  // of those counts. Two shuffles: custkey, then c_count.
  // ---------------------------------------------------------------
  private def q13(s: SparkSession, dir: String): DataFrame = {
    val perCust = cust(s, dir)
      .join(ord(s, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val q13Sql =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey
      |) c
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------
  // q15_top_supplier — TPC-H Q15: supplier(s) achieving the maximum
  // quarterly revenue. The max is compared on the EXACT decimal sum
  // (engine-independent); only the output is rounded. The global max
  // is a 1-row broadcast against the per-supplier aggregate — an
  // unpartitioned window here would funnel every supplier's row into
  // one task at scale.
  // ---------------------------------------------------------------
  private def q15(s: SparkSession, dir: String): DataFrame = {
    val rev = li(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(revenueRow).as("rev_dec"))
    val maxRev = rev.agg(max(col("rev_dec")).as("max_rev"))
    rev.crossJoin(broadcast(maxRev))
      .filter(col("rev_dec") === col("max_rev"))
      .join(broadcast(sup(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), fin(col("rev_dec")).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  private val q15Sql =
    s"""WITH rev AS (
      |  SELECT l_suppkey, sum($revSql) AS rev_dec
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, ${finSql("rev_dec")} AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rev_dec = (SELECT max(rev_dec) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------
  // q19_disjunctive — TPC-H Q19 shape: OR-of-ANDs bracket predicates
  // over brand × size × quantity. One scan; the disjunction stays
  // inside codegen (no union-of-scans rewrite needed).
  // ---------------------------------------------------------------
  private def q19(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part").select("p_partkey", "p_brand", "p_size")
    def bracket(brand: String, sizeMax: Int, qMin: Int, qMax: Int): Column =
      col("p_brand") === brand && col("p_size").between(1, sizeMax) &&
        col("l_quantity").between(qMin, qMax)
    li(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(bracket("Brand#12", 5, 1, 11) ||
        bracket("Brand#23", 10, 10, 20) ||
        bracket("Brand#3", 15, 20, 30))
      .agg(fin(sum(revenueRow)).as("revenue"), count(lit(1)).as("n_lines"))
  }

  private val q19Sql =
    s"""SELECT ${finSql(s"sum($revSql)")} AS revenue, count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // ---------------------------------------------------------------
  // q21_sole_blame — TPC-H Q21 shape (no commit-date column, so
  // "kept the order waiting" = sole supplier with returned lines):
  // multi-supplier orders where EXACTLY ONE supplier's lines came
  // back 'R' — charge that supplier. One groupBy(orderkey) computes
  // all three facts (distinct suppliers, distinct offending
  // suppliers, the offender id) in a single shuffle.
  // ---------------------------------------------------------------
  private def q21(s: SparkSession, dir: String): DataFrame = {
    // pre-aggregate to distinct (order, supplier) pairs first: two
    // countDistincts in one agg would EXPAND the fact table 2×; the
    // pair grain is far smaller and needs only plain counts after
    val perPair = li(s, dir)
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("has_r"))
    val perOrder = perPair
      .groupBy("l_orderkey")
      .agg(
        count(lit(1)).as("n_supp"),
        sum(col("has_r")).as("n_r_supp"),
        max(when(col("has_r") === 1, col("l_suppkey"))).as("blame_supp"))
    perOrder
      .filter(col("n_supp") >= 2 && col("n_r_supp") === 1)
      .groupBy("blame_supp")
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(sup(s, dir)), col("blame_supp") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(20)
  }

  private val q21Sql =
    """SELECT s_suppkey, s_name, numwait
      |FROM (
      |  SELECT blame_supp, count(*) AS numwait
      |  FROM (
      |    SELECT l_orderkey,
      |      count(DISTINCT l_suppkey) AS n_supp,
      |      count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_r_supp,
      |      max(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS blame_supp
      |    FROM lineitem GROUP BY l_orderkey
      |  ) o
      |  WHERE n_supp >= 2 AND n_r_supp = 1
      |  GROUP BY blame_supp
      |) w JOIN supplier ON blame_supp = s_suppkey
      |ORDER BY numwait DESC, s_suppkey
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------
  // q22_idle_customers — TPC-H Q22 shape: above-average-balance
  // customers with no RECENT orders (the synthetic data gives every
  // customer some order ever, so the anti-join windows on the churn
  // horizon), grouped by a customer-code (last two digits of the
  // fixed-width name — the schema has no phone column). The global
  // average is a 1-row broadcast, not a rescan per row.
  // ---------------------------------------------------------------
  private val ChurnHorizon = "2000-01-01"

  private def q22(s: SparkSession, dir: String): DataFrame = {
    val c = cust(s, dir)
    // exact decimal average of the positive balances (portable double)
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg((sum(money(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_bal"))
    val recent = ord(s, dir)
      .filter(col("o_orderdate") >= lit(ChurnHorizon).cast("timestamp"))
      .select("o_custkey")
    val idle = c.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
    idle.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .groupBy(substring(col("c_name"), 17, 2).as("cust_code"))
      .agg(count(lit(1)).as("n_custs"), fin(sum(money(col("c_acctbal")))).as("total_bal"))
      .orderBy("cust_code")
  }

  private val q22Sql =
    s"""SELECT substr(c_name, 17, 2) AS cust_code,
      | count(*) AS n_custs,
      | ${finSql("sum(CAST(c_acctbal AS DECIMAL(18,2)))")} AS total_bal
      |FROM customer
      |WHERE c_acctbal > (
      |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/count(*)
      |    FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '$ChurnHorizon 00:00:00')
      |GROUP BY substr(c_name, 17, 2)
      |ORDER BY cust_code""".stripMargin

  // ---------------------------------------------------------------
  // q_cube — full CUBE over (returnflag, linestatus) with an explicit
  // grouping id; subtotal rows distinguished from data 'ALL' via
  // grouping() (portable: grouping(a)*2 + grouping(b) both engines).
  // ---------------------------------------------------------------
  private def qCube(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
          .cast("int").as("gid"),
        count(lit(1)).as("n_lines"),
        fin(sum(money(col("l_quantity")))).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("gid"), col("n_lines"), col("sum_qty"))
      .orderBy("gid", "returnflag", "linestatus")

  private val qCubeSql =
    s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      | coalesce(l_linestatus, 'ALL') AS linestatus,
      | CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS INT) AS gid,
      | count(*) AS n_lines,
      | ${finSql("sum(CAST(l_quantity AS DECIMAL(18,2)))")} AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY gid, returnflag, linestatus""".stripMargin

  // ---------------------------------------------------------------
  // q_ntile_cume — distribution windows per market segment: quartile
  // (ntile), cumulative distribution, percent rank. The window order
  // is (acctbal, custkey) — strictly total, so every rank function is
  // deterministic and cume_dist peer groups are singletons (identical
  // across engines).
  // ---------------------------------------------------------------
  private def qNtile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    cust(s, dir)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        round(cume_dist().over(w), 6).as("cume"),
        round(percent_rank().over(w), 6).as("prank"))
      .filter(col("quartile") === 4) // top quartile per segment
      .orderBy("c_mktsegment", "c_custkey")
  }

  private val qNtileSql =
    """SELECT c_mktsegment, c_custkey, c_acctbal, quartile, cume, prank
      |FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    CAST(ntile(4) OVER w AS INT) AS quartile,
      |    round(cume_dist() OVER w, 6) AS cume,
      |    round(percent_rank() OVER w, 6) AS prank
      |  FROM customer
      |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |) x WHERE quartile = 4
      |ORDER BY c_mktsegment, c_custkey""".stripMargin

  // ---------------------------------------------------------------
  // q_window_range — RANGE-frame window: trailing-7-day order revenue
  // per day. Aggregate to day grain FIRST (the range window sees
  // ~#days rows, not the fact table); the frame is a true RANGE over
  // an integer day number, so gap days genuinely widen the window.
  // ---------------------------------------------------------------
  private def qRange(s: SparkSession, dir: String): DataFrame = {
    val daily = ord(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("order_day"))
      .agg(sum(money(col("o_totalprice"))).as("day_total_dec"))
      .withColumn("day_num", datediff(col("order_day"), lit("1970-01-01").cast("date")))
    val w = Window.orderBy(col("day_num")).rangeBetween(-6, 0)
    daily
      .select(col("order_day"), fin(col("day_total_dec")).as("day_total"),
        fin(sum(col("day_total_dec")).over(w)).as("trailing_7d"))
      .orderBy("order_day")
  }

  private val qRangeSql =
    s"""SELECT order_day, ${finSql("day_total_dec")} AS day_total,
      | ${finSql("sum(day_total_dec) OVER (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)")} AS trailing_7d
      |FROM (
      |  SELECT CAST(o_orderdate AS DATE) AS order_day,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS day_total_dec,
      |    CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INT) AS day_num
      |  FROM orders GROUP BY 1, 3
      |) d
      |ORDER BY order_day""".stripMargin

  // ---------------------------------------------------------------
  // q_mom_growth — month-over-month revenue growth via lag. Monthly
  // sums stay decimal through the lag (exact), doubles only in the
  // final ratio; the first month (no prior) is excluded rather than
  // emitting a NULL-ratio row.
  // ---------------------------------------------------------------
  private def qMom(s: SparkSession, dir: String): DataFrame = {
    val monthly = ord(s, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(sum(money(col("o_totalprice"))).as("rev_dec"))
    val w = Window.orderBy(col("month"))
    monthly
      .withColumn("prev_dec", lag(col("rev_dec"), 1).over(w))
      .filter(col("prev_dec").isNotNull)
      .select(col("month"), fin(col("rev_dec")).as("revenue"),
        fin(col("prev_dec")).as("prev_revenue"),
        round((fin(col("rev_dec")) - fin(col("prev_dec"))) / fin(col("prev_dec")) * 100, 4)
          .as("growth_pct"))
      .orderBy("month")
  }

  private val qMomSql =
    s"""SELECT month, ${finSql("rev_dec")} AS revenue, ${finSql("prev_dec")} AS prev_revenue,
      | round((${finSql("rev_dec")} - ${finSql("prev_dec")}) / ${finSql("prev_dec")} * 100, 4) AS growth_pct
      |FROM (
      |  SELECT month, rev_dec, lag(rev_dec) OVER (ORDER BY month) AS prev_dec
      |  FROM (
      |    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |      sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
      |    FROM orders GROUP BY 1
      |  ) m
      |) x WHERE prev_dec IS NOT NULL
      |ORDER BY month""".stripMargin

  // ---------------------------------------------------------------
  // q_grouping_sets — arbitrary GROUPING SETS (the general construct
  // behind rollup/cube): (flag,status), (flag), (status) — but NOT
  // the grand total, which neither rollup nor cube can express alone.
  // Via the SQL entry path (spark.sql over a temp view).
  // ---------------------------------------------------------------
  private val groupingSetsText =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      | coalesce(l_linestatus, 'ALL') AS linestatus,
      | count(*) AS n_lines
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
      |ORDER BY returnflag, linestatus""".stripMargin

  private def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    li(s, dir).createOrReplaceTempView("lineitem")
    s.sql(groupingSetsText)
  }

  // ---------------------------------------------------------------
  // q_set_ops — INTERSECT / EXCEPT composition: customers active in
  // BOTH halves of the order history vs ONLY the early half. Set
  // operators plan as aggregates/anti-joins — one shuffle each.
  // ---------------------------------------------------------------
  private def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val split = lit("1998-01-01").cast("timestamp")
    val early = ord(s, dir).filter(col("o_orderdate") < split).select("o_custkey")
    val late = ord(s, dir).filter(col("o_orderdate") >= split).select("o_custkey")
    val both = early.intersect(late).withColumn("cohort", lit("both_halves"))
    val earlyOnly = early.except(late).withColumn("cohort", lit("early_only"))
    both.unionByName(earlyOnly)
      .groupBy("cohort")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("cohort")
  }

  private val qSetOpsSql =
    """WITH early AS (SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
      |late AS (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'),
      |u AS (
      |  SELECT o_custkey, 'both_halves' AS cohort FROM (SELECT * FROM early INTERSECT SELECT * FROM late) b
      |  UNION ALL
      |  SELECT o_custkey, 'early_only' FROM (SELECT * FROM early EXCEPT SELECT * FROM late) e)
      |SELECT cohort, count(*) AS n_customers
      |FROM u GROUP BY cohort
      |ORDER BY cohort""".stripMargin

  // ---------------------------------------------------------------
  // q_sql_correlated — the spark.sql() entry path with a correlated
  // EXISTS + scalar subquery, exactly as a warehouse user would write
  // it; Catalyst decorrelates both into joins (no per-row execution).
  // ---------------------------------------------------------------
  private val correlatedText =
    """SELECT c_mktsegment, count(*) AS n_big_spenders
      |FROM customer
      |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
      |                   FROM customer)
      |  AND EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  private def qCorrelated(s: SparkSession, dir: String): DataFrame = {
    cust(s, dir).createOrReplaceTempView("customer")
    ord(s, dir).createOrReplaceTempView("orders")
    s.sql(correlatedText)
  }

  val ops: Seq[Op] = Seq(
    Op("q_grouping_sets", qGroupingSets, Some(groupingSetsText)),
    Op("q_set_ops", qSetOps, Some(qSetOpsSql)),
    Op("q_sql_correlated", qCorrelated, Some(correlatedText)),
    Op("q7_nation_volume", q7, Some(q7Sql)),
    Op("q8_market_share", q8, Some(q8Sql)),
    Op("q9_product_profit", q9, Some(q9Sql)),
    Op("q12_late_lines", q12, Some(q12Sql)),
    Op("q13_customer_distribution", q13, Some(q13Sql)),
    Op("q15_top_supplier", q15, Some(q15Sql)),
    Op("q19_disjunctive", q19, Some(q19Sql)),
    Op("q21_sole_blame", q21, Some(q21Sql)),
    Op("q22_idle_customers", q22, Some(q22Sql)),
    Op("q_cube", qCube, Some(qCubeSql)),
    Op("q_ntile_cume", qNtile, Some(qNtileSql)),
    Op("q_window_range", qRange, Some(qRangeSql)),
    Op("q_mom_growth", qMom, Some(qMomSql)))
}
