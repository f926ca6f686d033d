package graft.queries

import graft.{Op, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical-test pack — the distribution-level checks an analyst
  * (or a data-curation pipeline deciding whether two corpus slices
  * differ) runs over warehouse facts: chi-square independence of two
  * categoricals, Gini concentration of spend, a two-sample
  * Kolmogorov–Smirnov distance, and Pearson correlation of per-entity
  * facts. The reference ships the raw aggregates these tests consume
  * (ref: queries/monthly_sales_analysis.sql builds the same
  * fact-by-category matrices); the tests themselves are the natural
  * next layer for a warehouse at curation scale.
  *
  * Engine-parity design (SURVEY §5): every statistic is computed in
  * exact integer / DECIMAL(38,0) cross-multiplication and emitted as
  * a truncating ppm/milli ratio — the ONLY floats in any output are
  * `round(x, 6)` finals derived from exact integer moments, so Spark
  * and DuckDB hash identically.
  */
object StatOps {

  /** money-exact cents: double → DECIMAL(18,2) (exact for 2-dp data)
    * → integer cents. Same expression both engines.
    */
  private def cents(c: Column): Column = (c.cast("decimal(18,2)") * 100).cast("long")

  // ---------------------------------------------------------------
  // q_chi_square — chi-square independence of market segment ×
  // order priority over the customer⨝orders fact. Per cell:
  //   expected_milli = (rowTot · colTot · 1000) DIV N
  //   contrib_milli  = (1000·observed − expected_milli)²
  //                      DIV greatest(expected_milli, 1)
  // i.e. the χ² cell contribution ×1000, exact given the floor-milli
  // expected (both engines truncate identically — determinism over
  // last-digit fidelity, SURVEY §5).
  //
  // Scale bounds: (1000·O)² ≤ 10⁶·N² — safe in DECIMAL(38,0) to
  // N ≈ 10¹⁵ fact rows; rowTot·colTot·1000 ≤ 10³·N² likewise. The
  // 5×5 contingency never lets expected_milli hit the greatest()
  // floor in practice (expected ≈ N/25).
  //
  // Plan shape: the fact join broadcasts nothing (orders⨝customer is
  // the big shuffle join, AQE-planned) and is executed ONCE: the
  // marginals and the N total are UNPARTITIONED/keyed WINDOW sums
  // over the 25-row contingency aggregate, not separate aggregate
  // branches — a re-aggregate-and-join-back would recompute the
  // whole fact join per marginal (Spark cannot reuse exchanges
  // across differently-keyed aggregates), i.e. 4 scans of a 100 TB
  // fact instead of 1. Windows over a bounded aggregate are the
  // PlanGuardSpec-sanctioned way to carry group totals.
  // ---------------------------------------------------------------
  private def chiSquare(s: SparkSession, dir: String): DataFrame = {
    val cell = Tables.load(s, dir, "orders")
      .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).as("observed"))
    cell
      .withColumn("rt", sum(col("observed")).over(Window.partitionBy("seg")))
      .withColumn("ct", sum(col("observed")).over(Window.partitionBy("pri")))
      .withColumn("n", sum(col("observed")).over(Window.partitionBy()))
      .withColumn("expected_milli",
        expr("CAST((CAST(rt AS DECIMAL(38,0)) * ct * 1000) DIV n AS BIGINT)"))
      .select(col("seg"), col("pri"), col("observed"), col("expected_milli"),
        expr("""CAST((CAST(1000 AS DECIMAL(38,0)) * observed - expected_milli)
               |  * (CAST(1000 AS DECIMAL(38,0)) * observed - expected_milli)
               |  DIV greatest(expected_milli, 1) AS BIGINT)""".stripMargin)
          .as("contrib_milli"))
      .orderBy("seg", "pri")
  }

  private val chiSquareSql =
    """WITH cell AS (
      |  SELECT c_mktsegment AS seg, o_orderpriority AS pri,
      |         CAST(count(*) AS BIGINT) AS observed
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |rowt AS (SELECT seg, sum(observed) AS rt FROM cell GROUP BY 1),
      |colt AS (SELECT pri, sum(observed) AS ct FROM cell GROUP BY 1),
      |tot AS (SELECT sum(observed) AS n FROM cell),
      |e AS (
      |  SELECT seg, pri, observed,
      |         CAST((rt * ct * 1000) // n AS BIGINT) AS expected_milli
      |  FROM cell JOIN rowt USING (seg) JOIN colt USING (pri) CROSS JOIN tot)
      |SELECT seg, pri, observed, expected_milli,
      |       CAST((1000 * observed - expected_milli)
      |            * (1000 * observed - expected_milli)
      |            // greatest(expected_milli, 1) AS BIGINT) AS contrib_milli
      |FROM e
      |ORDER BY seg, pri""".stripMargin

  // ---------------------------------------------------------------
  // q_gini — Gini concentration of customer lifetime spend, per
  // nation. With per-nation spend x₁ ≤ … ≤ xₙ (cents, custkey
  // tiebreak — tie order cannot change Σi·xᵢ when the tied x are
  // equal, so the tiebreak is for rank determinism only):
  //   gini_ppm = (2·Σi·xᵢ − (n+1)·Σx) · 10⁶ DIV (n·Σx)
  // the exact mean-difference form of Gini, in truncating ppm.
  //
  // Scale bounds: Σi·xᵢ ≤ n²·maxCents — summed as DECIMAL(38,0),
  // good to n ≈ 10¹⁴ customers per nation at 10⁹ cents each.
  //
  // Plan shape: per-customer spend is one map-side-combined groupBy
  // on o_custkey (the big shuffle); the customer join carries only
  // (custkey → nationkey); ranking shuffles once on nationkey with
  // an in-partition sort — exactly the partitioned-window pattern
  // that holds at 100 TB because nations partition the work 25 ways
  // (and per-nation rank windows stream, they don't buffer).
  // ---------------------------------------------------------------
  private def gini(s: SparkSession, dir: String): DataFrame = {
    val spend = Tables.load(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("spend_cents"))
      .join(Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
    val ranked = spend.withColumn("i",
      row_number().over(Window.partitionBy(col("c_nationkey"))
        .orderBy(col("spend_cents"), col("c_custkey"))))
    ranked.groupBy(col("c_nationkey").as("nationkey"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("spend_cents")).as("total_cents"),
        sum(expr("CAST(i AS DECIMAL(38,0)) * spend_cents")).as("w"))
      .select(col("nationkey"), col("n_customers"), col("total_cents"),
        expr("""CAST(((CAST(2 AS DECIMAL(38,0)) * w
               |      - (CAST(n_customers AS DECIMAL(38,0)) + 1) * total_cents)
               |      * 1000000)
               |     DIV (CAST(n_customers AS DECIMAL(38,0)) * total_cents)
               |     AS BIGINT)""".stripMargin).as("gini_ppm"))
      .orderBy("nationkey")
  }

  private val giniSql =
    """WITH spend AS (
      |  SELECT o_custkey,
      |         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |           AS spend_cents
      |  FROM orders GROUP BY 1),
      |ranked AS (
      |  SELECT c_nationkey, spend_cents,
      |         row_number() OVER (PARTITION BY c_nationkey
      |                            ORDER BY spend_cents, c_custkey) AS i
      |  FROM spend JOIN customer ON o_custkey = c_custkey)
      |SELECT c_nationkey AS nationkey,
      |       CAST(count(*) AS BIGINT) AS n_customers,
      |       CAST(sum(spend_cents) AS BIGINT) AS total_cents,
      |       CAST(((2 * sum(i * spend_cents)
      |              - (count(*) + 1) * sum(spend_cents)) * 1000000)
      |            // (count(*) * sum(spend_cents)) AS BIGINT) AS gini_ppm
      |FROM ranked
      |GROUP BY 1
      |ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------
  // q_ks_test — exact two-sample Kolmogorov–Smirnov distance between
  // the order-value distributions of two customer segments
  // (BUILDING vs MACHINERY). Group order prices to distinct cents
  // values with per-sample counts, take running totals ordered by
  // value, and the statistic is
  //   D_ppm = max |cum₁·n₂ − cum₂·n₁| · 10⁶ DIV (n₁·n₂)
  // evaluated AT distinct values (the sup of |F₁−F₂| is always
  // attained at a jump). Reported at the smallest value attaining
  // the max (row_number tiebreak, never bare LIMIT — SURVEY §5.3).
  //
  // Scale bounds: cum·n ≤ N², ×10⁶ → safe in DECIMAL(38,0) to
  // N ≈ 10¹⁵ orders.
  //
  // Plan shape: one shuffle to the distinct-value aggregate; the
  // running-CDF window is a GLOBAL sort over DISTINCT price points —
  // bounded by the value domain (≤ ~10⁸ distinct cents), not the
  // row count, which is what makes a global window acceptable here
  // (SURVEY §4 global-window rule); n₁/n₂ are unpartitioned window
  // sums over the same bounded relation, so the fact join runs once.
  // ---------------------------------------------------------------
  private val KsSegA = "BUILDING"
  private val KsSegB = "MACHINERY"

  private def ksTest(s: SparkSession, dir: String): DataFrame = {
    val fact = Tables.load(s, dir, "orders")
      .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin(KsSegA, KsSegB))
      .select(cents(col("o_totalprice")).as("v"),
        when(col("c_mktsegment") === KsSegA, 1L).otherwise(0L).as("a"),
        when(col("c_mktsegment") === KsSegB, 1L).otherwise(0L).as("b"))
    val pts = fact.groupBy("v").agg(sum("a").as("ca"), sum("b").as("cb"))
    // n1/n2 as unpartitioned window sums over the distinct-value
    // aggregate — a separate 1-row aggregate joined back would rerun
    // the fact join (no exchange reuse across aggregate shapes)
    val cum = pts
      .withColumn("cum1", sum(col("ca")).over(Window.orderBy("v")))
      .withColumn("cum2", sum(col("cb")).over(Window.orderBy("v")))
      .withColumn("n1", sum(col("ca")).over(Window.partitionBy()))
      .withColumn("n2", sum(col("cb")).over(Window.partitionBy()))
      .select(col("v"), col("n1"), col("n2"),
        expr("""CAST(abs(CAST(cum1 AS DECIMAL(38,0)) * n2
               |        - CAST(cum2 AS DECIMAL(38,0)) * n1) * 1000000
               |     DIV (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)""".stripMargin)
          .as("diff_ppm"))
    cum.withColumn("rk",
        row_number().over(Window.orderBy(col("diff_ppm").desc, col("v"))))
      .filter(col("rk") === 1)
      .select(col("n1"), col("n2"), col("diff_ppm").as("ks_ppm"),
        col("v").as("at_cents"))
  }

  private val ksTestSql =
    s"""WITH fact AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
      |         CASE WHEN c_mktsegment = '$KsSegA' THEN 1 ELSE 0 END AS a,
      |         CASE WHEN c_mktsegment = '$KsSegB' THEN 1 ELSE 0 END AS b
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IN ('$KsSegA', '$KsSegB')),
      |pts AS (SELECT v, sum(a) AS ca, sum(b) AS cb FROM fact GROUP BY 1),
      |tot AS (SELECT sum(ca) AS n1, sum(cb) AS n2 FROM pts),
      |cum AS (
      |  SELECT v, n1, n2,
      |         CAST(abs(sum(ca) OVER (ORDER BY v) * n2
      |                  - sum(cb) OVER (ORDER BY v) * n1) * 1000000
      |              // (n1 * n2) AS BIGINT) AS diff_ppm
      |  FROM pts CROSS JOIN tot),
      |best AS (
      |  SELECT *, row_number() OVER (ORDER BY diff_ppm DESC, v) AS rk FROM cum)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |       diff_ppm AS ks_ppm, v AS at_cents
      |FROM best WHERE rk = 1""".stripMargin

  // ---------------------------------------------------------------
  // q_pearson_corr — per-nation Pearson correlation between a
  // customer's order count and lifetime spend. The five moments
  // (Σx, Σy, Σxy, Σx², Σy²) are summed EXACTLY as DECIMAL(38,0)
  // (order-independent — never float-summed, SURVEY §5.1); only the
  // final
  //   r = (n·Σxy − Σx·Σy) / √((n·Σx² − Σx²ᵗᵒᵗ)(n·Σy² − Σy²ᵗᵒᵗ))
  // drops to DOUBLE — one cast, one IEEE sqrt, one divide, then
  // round(…, 6) (SURVEY §5.4). Zero-variance nations yield NULL via
  // an explicit CASE in both engines.
  //
  // Scale bounds: n·Σy² with cents ≤ 10⁹ is DECIMAL(38,0)-safe to
  // ~10¹⁰ customers per nation; beyond that, re-unit y to whole
  // dollars (the op's constant, not its shape).
  //
  // Plan shape: one map-side-combined groupBy on o_custkey, a
  // (custkey → nationkey) join, then a 25-group moment aggregate —
  // the same two-shuffle skeleton as q_gini but with no window.
  // ---------------------------------------------------------------
  private def pearson(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.load(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("x"), sum(cents(col("o_totalprice"))).as("y"))
      .join(Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
    perCust.groupBy(col("c_nationkey").as("nationkey"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      .select(col("nationkey"), col("n_customers"),
        expr("""round(CASE
               |  WHEN n_customers * sxx - sx * sx = 0
               |    OR n_customers * syy - sy * sy = 0 THEN NULL
               |  ELSE CAST(n_customers * sxy - sx * sy AS DOUBLE)
               |       / sqrt(CAST(n_customers * sxx - sx * sx AS DOUBLE)
               |              * CAST(n_customers * syy - sy * sy AS DOUBLE))
               |END, 6)""".stripMargin).as("r"))
      .orderBy("nationkey")
  }

  private val pearsonSql =
    """WITH percust AS (
      |  SELECT o_custkey, count(*) AS x,
      |         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |           AS y
      |  FROM orders GROUP BY 1),
      |m AS (
      |  SELECT c_nationkey AS nationkey,
      |         CAST(count(*) AS BIGINT) AS n_customers,
      |         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
      |         sum(CAST(x AS HUGEINT) * y) AS sxy,
      |         sum(CAST(x AS HUGEINT) * x) AS sxx,
      |         sum(CAST(y AS HUGEINT) * y) AS syy
      |  FROM percust JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1)
      |SELECT nationkey, n_customers,
      |       round(CASE
      |         WHEN n_customers * sxx - sx * sx = 0
      |           OR n_customers * syy - sy * sy = 0 THEN NULL
      |         ELSE CAST(n_customers * sxy - sx * sy AS DOUBLE)
      |              / sqrt(CAST(n_customers * sxx - sx * sx AS DOUBLE)
      |                     * CAST(n_customers * syy - sy * sy AS DOUBLE))
      |       END, 6) AS r
      |FROM m
      |ORDER BY nationkey""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("q_chi_square", chiSquare, Some(chiSquareSql)),
    Op("q_gini", gini, Some(giniSql)),
    Op("q_ks_test", ksTest, Some(ksTestSql)),
    Op("q_pearson_corr", pearson, Some(pearsonSql)))
}
