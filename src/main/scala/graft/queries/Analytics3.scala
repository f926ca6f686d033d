package graft.queries

import graft.{Op, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Third analytics pack — the four TPC-H shapes (Q2, Q11, Q16, Q20)
  * whose classic form needs a `partsupp` table the testdata lacks.
  * Each is re-expressed over the observable supply relation instead:
  * DISTINCT (l_partkey, l_suppkey) from lineitem IS the part-supplier
  * bridge, and the minimum extended price a supplier ever charged for
  * a part is its cost. The structural shape of each query — the thing
  * the reference workload exercises — is preserved exactly:
  * correlated-min subquery (Q2), scalar-subquery threshold over an
  * aggregate (Q11), distinct-count with NOT-IN exclusion (Q16),
  * nested semi-join chain (Q20). (ref: /root/reference/source_code/
  * sql/"1. Metadata Creation.sql" DW_Output_* — the warehouse those
  * configs load is the star schema these run over.)
  *
  * Same oracle-parity discipline as [[Analytics]] (SURVEY.md §5):
  * decimal-exact money mins/sums, cast-to-double only at the final
  * projection, strict total orders on ranked output. l_quantity is
  * integer-valued, so double sums of it are exact on both engines.
  *
  * Scale shape: every dimension side (scoped parts, region-filtered
  * suppliers, negative-balance suppliers) broadcasts; the only
  * fact-sized shuffles are the supply-relation aggregations on
  * (l_partkey, l_suppkey) — one per query, map-side combined.
  */
object Analytics3 {

  private def money(c: Column): Column = c.cast("decimal(18,2)")
  private def rate(c: Column): Column = c.cast("decimal(8,4)")
  private def fin(c: Column): Column = c.cast("decimal(38,4)").cast("double")
  private def revenueRow: Column =
    money(col("l_extendedprice")) * rate(lit(1) - col("l_discount"))
  private val revSql = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1-l_discount AS DECIMAL(8,4))"
  private def finSql(inner: String): String =
    s"CAST(CAST(round($inner, 4) AS DECIMAL(28,4)) AS DOUBLE)"

  private def li(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "lineitem")
  private def sup(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "supplier")
  private def nat(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "nation")
  private def reg(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "region")
  private def part(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "part")

  // ---------------------------------------------------------------
  // q2_min_cost_supplier — TPC-H Q2 shape: for each scoped part, the
  // supplier(s) in a region offering the minimum cost, where cost =
  // min decimal extended price ever charged for that (part, supplier).
  // The classic correlated `cost = (SELECT min ...)` decorrelates to
  // aggregate-then-join (the same rewrite Catalyst performs and the
  // q17 A/B test already proved faster): min per part over the
  // region-scoped supply, equi-joined back on exact decimal equality.
  // ---------------------------------------------------------------
  private val Q2Size = 15
  private val Q2Type = "MEDIUM"
  private val Q2Region = "ASIA"

  private def q2(s: SparkSession, dir: String): DataFrame = {
    val regionSup = broadcast(
      sup(s, dir)
        .join(broadcast(nat(s, dir)
          .join(broadcast(reg(s, dir).filter(col("r_name") === Q2Region)),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name")))
    val scopedParts = broadcast(
      part(s, dir).filter(col("p_size") === Q2Size && col("p_type") === Q2Type)
        .select("p_partkey", "p_name"))
    val scopedSupply = li(s, dir)
      .join(scopedParts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("l_suppkey"))
      .agg(min(money(col("l_extendedprice"))).as("cost"))
      .join(regionSup, col("l_suppkey") === col("s_suppkey"))
    val minCost = scopedSupply.groupBy(col("p_partkey").as("mc_partkey"))
      .agg(min(col("cost")).as("min_cost"))
    scopedSupply
      .join(minCost,
        col("p_partkey") === col("mc_partkey") && col("cost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("cost").cast("double").as("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  private val q2Sql =
    s"""WITH supply AS (
      |  SELECT l_partkey, l_suppkey, min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, CAST(cost AS DOUBLE) AS cost
      |FROM part, supply, supplier, nation, region
      |WHERE p_partkey = supply.l_partkey AND s_suppkey = supply.l_suppkey
      |  AND p_size = $Q2Size AND p_type = '$Q2Type'
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = '$Q2Region'
      |  AND cost = (SELECT min(s2.cost)
      |              FROM supply s2, supplier sp2, nation n2, region r2
      |              WHERE s2.l_partkey = p_partkey AND sp2.s_suppkey = s2.l_suppkey
      |                AND sp2.s_nationkey = n2.n_nationkey
      |                AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = '$Q2Region')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  // ---------------------------------------------------------------
  // q11_important_parts — TPC-H Q11 shape: parts whose stocked value
  // from one nation's suppliers exceeds a threshold that is a scalar
  // subquery over the same aggregate. The classic fraction is scaled
  // by 1/SF precisely because per-part shares shrink as the corpus
  // grows; the scale-invariant equivalent is "more than 2× the
  // per-part average", compared exactly by cross-multiplying with the
  // part count (value·n > 2·total) — no decimal-vs-double averaging
  // at the boundary on either engine. The 1-row threshold joins back
  // as a broadcast nested-loop (never a cartesian); only the final
  // projection goes double.
  // ---------------------------------------------------------------
  private val Q11Nation = "NATION_13"

  private def q11(s: SparkSession, dir: String): DataFrame = {
    val nationSup = broadcast(
      sup(s, dir)
        .join(broadcast(nat(s, dir).filter(col("n_name") === Q11Nation)),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey"))
    val value = li(s, dir)
      .join(nationSup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey").as("partkey"))
      .agg(sum(revenueRow).as("value"))
    val threshold = value
      .agg(sum(col("value")).as("total"), count(lit(1)).as("n_parts"))
    value.join(broadcast(threshold))
      .filter(col("value") * col("n_parts") > col("total") * lit(2))
      .select(col("partkey"), fin(col("value")).as("part_value"))
      .orderBy(col("part_value").desc, col("partkey"))
  }

  private val q11Sql =
    s"""WITH val AS (
      |  SELECT l_partkey AS partkey, sum($revSql) AS value
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = '$Q11Nation'
      |  GROUP BY 1)
      |SELECT partkey, ${finSql("value")} AS part_value
      |FROM val
      |WHERE value * (SELECT count(*) FROM val) > (SELECT sum(value) * 2 FROM val)
      |ORDER BY part_value DESC, partkey""".stripMargin

  // ---------------------------------------------------------------
  // q16_supplier_variety — TPC-H Q16 shape: how many distinct
  // suppliers can furnish each surviving (brand, type, size) bucket,
  // excluding one brand, a type prefix, off-list sizes, and suppliers
  // flagged by the complaints analog (negative account balance — the
  // testdata has no comment column). The part-supplier bridge is
  // DISTINCT over the fact table; exclusion is a broadcast anti-join
  // (NOT IN on a provably non-null key column).
  // ---------------------------------------------------------------
  private val Q16Brand = "BRAND_5"
  private val Q16TypePrefix = "MEDIUM"
  private val Q16Sizes = Seq(1, 4, 9, 14, 19, 24, 29, 34)

  private def q16(s: SparkSession, dir: String): DataFrame = {
    val scopedParts = broadcast(
      part(s, dir)
        .filter(col("p_brand") =!= Q16Brand &&
          !col("p_type").startsWith(Q16TypePrefix) &&
          col("p_size").isin(Q16Sizes: _*))
        .select("p_partkey", "p_brand", "p_type", "p_size"))
    val flagged = broadcast(
      sup(s, dir).filter(col("s_acctbal") < 0).select("s_suppkey"))
    li(s, dir)
      .select("l_partkey", "l_suppkey").distinct()
      .join(scopedParts, col("l_partkey") === col("p_partkey"))
      .join(flagged, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  private val q16Sql =
    s"""SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> '$Q16Brand'
      |  AND p_type NOT LIKE '$Q16TypePrefix%'
      |  AND p_size IN (${Q16Sizes.mkString(", ")})
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ---------------------------------------------------------------
  // q20_excess_shippers — TPC-H Q20 shape: suppliers in one nation
  // who moved more than half of their all-time volume of some
  // name-prefixed part inside one year (the availability-vs-shipped
  // comparison of the classic, on observable data). Nested semi-join
  // chain: prefix parts (broadcast) → per-(supplier, part) window/
  // total quantity aggregate → qualifying suppliers → semi-join into
  // the nation-scoped supplier dimension. l_quantity is
  // integer-valued, so the double sums compare exactly.
  // ---------------------------------------------------------------
  private val Q20Nation = "NATION_13"
  private val Q20Prefix = "small"
  private val Q20From = "1995-01-01"
  private val Q20Until = "1996-01-01"

  private def q20(s: SparkSession, dir: String): DataFrame = {
    val prefixParts = broadcast(
      part(s, dir).filter(col("p_name").startsWith(Q20Prefix)).select("p_partkey"))
    val inWindow = col("l_shipdate") >= lit(Q20From).cast("timestamp") &&
      col("l_shipdate") < lit(Q20Until).cast("timestamp")
    val qualified = li(s, dir)
      .join(prefixParts, col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(
        sum(when(inWindow, col("l_quantity")).otherwise(lit(0.0))).as("qty_win"),
        sum(col("l_quantity")).as("qty_all"))
      .filter(col("qty_win") > lit(0.5) * col("qty_all"))
      .select("l_suppkey").distinct()
    sup(s, dir)
      .join(broadcast(nat(s, dir).filter(col("n_name") === Q20Nation)),
        col("s_nationkey") === col("n_nationkey"))
      .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_name", "s_acctbal")
      .orderBy("s_name")
  }

  private val q20Sql =
    s"""SELECT s_name, s_acctbal
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = '$Q20Nation'
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM (
      |      SELECT l_suppkey, l_partkey,
      |        sum(CASE WHEN l_shipdate >= TIMESTAMP '$Q20From'
      |                  AND l_shipdate < TIMESTAMP '$Q20Until'
      |                 THEN l_quantity ELSE 0 END) AS qty_win,
      |        sum(l_quantity) AS qty_all
      |      FROM lineitem
      |      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '$Q20Prefix%')
      |      GROUP BY 1, 2) g
      |    WHERE qty_win > 0.5 * qty_all)
      |ORDER BY s_name""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("q2_min_cost_supplier", q2, Some(q2Sql)),
    Op("q11_important_parts", q11, Some(q11Sql)),
    Op("q16_supplier_variety", q16, Some(q16Sql)),
    Op("q20_excess_shippers", q20, Some(q20Sql)))
}
