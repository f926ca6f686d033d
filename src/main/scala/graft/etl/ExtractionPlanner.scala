package graft.etl

import graft.Tables
import graft.meta.{ColumnConfig, ExtractSpec, OutputColumnConfig}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Metadata-driven extraction — the Spark-native form of the
  * reference's generated `SELECT <cols> FROM <t> [WHERE <filter>]`
  * (ref: /root/reference/source_code/sql/
  * Staging_Extraction_Metadata_Query.sql, whole file; and
  * staging_data_extraction.py extract_table_data).
  *
  * Instead of concatenating a SQL string and pulling chunks through
  * the driver, we build a `Seq[Column]` of Catalyst expressions and
  * let the optimizer push the filter and the column pruning into the
  * source scan. Chunking is Spark's split planning — no driver
  * round-trips, no chunk files.
  */
object ExtractionPlanner {

  /** Effective select-list expression for one column config:
    * TransformationLogic wins over the bare column, AliasName over
    * ColumnName (ref: Staging_Extraction_Metadata_Query.sql
    * columnDetail CTE: CASE WHEN TransformationLogic IS NULL OR
    * TRIM(...)='' THEN ColumnName ELSE TransformationLogic END AS
    * IF(AliasName IS NULL, ColumnName, AliasName)).
    */
  def columnExpr(c: ColumnConfig): Column =
    expr(c.transformationLogic.map(_.trim).filter(_.nonEmpty).getOrElse(c.columnName))
      .as(c.aliasName.getOrElse(c.columnName))

  def projection(cols: Seq[ColumnConfig]): Seq[Column] =
    cols.filter(_.includeFlag).sortBy(_.columnId).map(columnExpr)

  /** Plan the extraction for one configured table over an SF dir.
    * INCREMENTAL applies the filter before projection (the filter
    * references source column names, as in the reference).
    */
  def extract(spark: SparkSession, dir: String, spec: ExtractSpec): DataFrame =
    extractFrom(Tables.load(spark, dir, spec.table.tableName), spec)

  /** Same plan over an arbitrary base relation (parquet, JDBC, …) —
    * the filter/projection are Catalyst expressions, so the source
    * connector decides what it can push (a JDBC source ships the
    * incremental WHERE to the remote DB; parquet prunes row groups).
    */
  def extractFrom(base: DataFrame, spec: ExtractSpec): DataFrame = {
    val filtered = spec.table.incrementalFilter match {
      case Some(f) if spec.table.loadType == "INCREMENTAL" => base.where(expr(f))
      case _ => base
    }
    filtered.select(projection(spec.columns): _*)
  }

  /** Render the equivalent SQL string — audit parity with the
    * reference's extractionQuery CTE output (DataExtractQuery).
    */
  def renderSql(spec: ExtractSpec): String = {
    val cols = spec.columns.filter(_.includeFlag).sortBy(_.columnId).map { c =>
      val body = c.transformationLogic.map(_.trim).filter(_.nonEmpty).getOrElse(c.columnName)
      s"$body AS ${c.aliasName.getOrElse(c.columnName)}"
    }
    val where = spec.table.incrementalFilter match {
      case Some(f) if spec.table.loadType == "INCREMENTAL" => s" WHERE $f"
      case _ => ""
    }
    s"SELECT ${cols.mkString(", ")} FROM ${spec.table.schemaName}.${spec.table.tableName}$where"
  }

  /** Map a config TargetDataType (SQL spelling) to a Spark cast type. */
  def sparkType(targetDataType: String): String = {
    val t = targetDataType.trim.toUpperCase
    if (t.startsWith("VARCHAR") || t == "TEXT" || t == "STRING") "string"
    else if (t == "BIGINT") "bigint"
    else if (t == "INT" || t == "INTEGER") "int"
    else if (t == "DOUBLE" || t == "FLOAT8") "double"
    else if (t == "DATE") "date"
    else if (t == "TIMESTAMP" || t == "DATETIME") "timestamp"
    else if (t.startsWith("DECIMAL") || t.startsWith("NUMERIC")) t.toLowerCase
    else if (t == "BOOLEAN") "boolean"
    else sys.error(s"unsupported TargetDataType: $targetDataType")
  }

  /** Apply the DW output mapping: AdditionalTransform (over staged
    * column names), cast to TargetDataType, name TargetColumnName,
    * order by TargetPosition (ref: DW_Output_Column_Config —
    * TargetPosition "Controls ordering").
    */
  def mapToOutput(staged: DataFrame, outCols: Seq[OutputColumnConfig]): DataFrame = {
    val cols = outCols.sortBy(_.targetPosition).map { oc =>
      val body = oc.additionalTransform.map(_.trim).filter(_.nonEmpty).getOrElse(oc.targetColumnName)
      expr(body).cast(sparkType(oc.targetDataType)).as(oc.targetColumnName)
    }
    staged.select(cols: _*)
  }
}
