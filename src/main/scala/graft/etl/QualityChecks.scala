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

  /** The standard audit bundle over the star schema. */
  def audit(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.load(spark, dir, "lineitem")
    val o = graft.Tables.load(spark, dir, "orders")
    val c = graft.Tables.load(spark, dir, "customer")
    Seq(
      nullCount(o, "orders", "o_custkey"),
      duplicateKeyCount(li, "lineitem", Seq("l_orderkey", "l_linenumber")),
      orphanCount(o, "orders", "o_custkey", c, "c_custkey"),
      orphanCount(li, "lineitem", "l_orderkey", o, "o_orderkey"),
      rowCount(o, "orders"),
      rowCount(li, "lineitem")
    ).reduce(_.unionByName(_)).orderBy("check_name", "table_name")
  }
}
