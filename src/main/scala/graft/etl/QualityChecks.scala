package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality audit over staged tables: null checks on key
  * columns, duplicate-PK detection, referential integrity. The
  * reference records per-table RowCount in DW_Process_Stage_Detail;
  * this extends that audit surface to correctness metrics a DW load
  * gate needs.
  *
  * Output contract: (check_name, table_name, metric) — one row per
  * check, stable ordering, BIGINT metric.
  */
object QualityChecks {

  def nullCount(df: DataFrame, table: String, column: String): DataFrame =
    df.filter(col(column).isNull)
      .agg(count(lit(1)).as("metric"))
      .select(lit(s"null_$column").as("check_name"), lit(table).as("table_name"), col("metric"))

  def duplicateKeyCount(df: DataFrame, table: String, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(coalesce(sum(col("n") - 1), lit(0L)).as("metric"))
      .select(lit("dup_key_rows").as("check_name"), lit(table).as("table_name"),
        col("metric").cast("bigint").as("metric"))

  /** Rows in `child` whose `childKey` has no match in `parent.parentKey`. */
  def orphanCount(child: DataFrame, childTable: String, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey)), col(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).as("metric"))
      .select(lit(s"orphan_$childKey").as("check_name"), lit(childTable).as("table_name"), col("metric"))

  def rowCount(df: DataFrame, table: String): DataFrame =
    df.agg(count(lit(1)).as("metric"))
      .select(lit("rowcount").as("check_name"), lit(table).as("table_name"), col("metric"))

  /** The standard audit bundle over the star schema — SINGLE-PASS:
    * the naive bundle (one subplan per check, unioned) scans lineitem
    * 3× and orders 4×, because every check re-reads its table. Here
    * each table is read once and its checks ride the same pass:
    *
    *  - orders: one left join to the (distinct) customer PKs carries
    *    the null-key count, the orphan count (a NULL probe key never
    *    matches, exactly NOT EXISTS semantics) and the rowcount in a
    *    single aggregate;
    *  - lineitem: the duplicate-PK grain aggregate IS the pass —
    *    rowcount = Σn, dup rows = Σ(n−1 | n>1), and the orphan check
    *    joins the (already grain-reduced) keys to orders.
    *
    * The 1-row metric vectors unpivot via stack() into the same
    * (check_name, table_name, metric) contract as the per-check
    * helpers (which remain the à-la-carte API).
    */
  def audit(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.load(spark, dir, "lineitem")
    val o = graft.Tables.load(spark, dir, "orders")
    val c = graft.Tables.load(spark, dir, "customer")
    val oStats = o.select(col("o_custkey"))
      .join(c.select(col("c_custkey")).distinct(),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_o_custkey"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("orphan_o_custkey"),
        count(lit(1)).as("rowcount"))
    val liStats = li.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("n"))
      .join(o.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"), "left")
      .agg(
        coalesce(sum(when(col("n") > 1, col("n") - 1)), lit(0L)).as("dup_key_rows"),
        coalesce(sum(when(col("o_orderkey").isNull, col("n"))), lit(0L))
          .as("orphan_l_orderkey"),
        sum(col("n")).as("rowcount"))
    oStats.selectExpr(
      """stack(3,
        |  'null_o_custkey', 'orders', null_o_custkey,
        |  'orphan_o_custkey', 'orders', orphan_o_custkey,
        |  'rowcount', 'orders', rowcount) AS (check_name, table_name, metric)"""
        .stripMargin)
      .unionByName(liStats.selectExpr(
        """stack(3,
          |  'dup_key_rows', 'lineitem', dup_key_rows,
          |  'orphan_l_orderkey', 'lineitem', orphan_l_orderkey,
          |  'rowcount', 'lineitem', rowcount) AS (check_name, table_name, metric)"""
          .stripMargin))
      .orderBy("check_name", "table_name")
  }
}
