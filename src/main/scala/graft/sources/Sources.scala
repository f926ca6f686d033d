package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink layer — the Spark-native generalization of the
  * reference's single-format staging zone (ref:
  * staging_data_extraction.py writes snappy parquet chunks; config
  * declares StagingZonePath/CuratedZonePath per table).
  *
  * Readers take explicit schemas where the format can't self-describe
  * (csv/json) — schema inference is a full extra pass at 100 TB.
  * The writer is size-aware and supports hive-style partition
  * columns; one-file-per-table is the small-file anti-pattern the
  * Consolidator exists to fix.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Write parquet with optional hive-style partitioning and a target
    * file count (explicit repartition → deterministic layout; rely on
    * AQE coalescing when targetFiles is None).
    */
  def writeParquet(
      df: DataFrame,
      path: String,
      partitionBy: Seq[String] = Nil,
      targetFiles: Option[Int] = None,
      mode: SaveMode = SaveMode.Overwrite
  ): Unit = {
    val sized = targetFiles match {
      case Some(n) if partitionBy.isEmpty => df.repartition(n)
      case Some(n) => df.repartition(n, partitionBy.map(df.col): _*)
      case None => df
    }
    val w = sized.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", header.toString).csv(path)

  /** XML source/sink (built into Spark 4's datasource set): schema'd
    * read — inference would be an extra full pass at scale, same rule
    * as csv/json.
    */
  def xml(spark: SparkSession, path: String, schema: StructType,
      rowTag: String): DataFrame =
    spark.read.schema(schema).option("rowTag", rowTag).xml(path)

  def writeXml(df: DataFrame, path: String, rowTag: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("rowTag", rowTag).xml(path)
}
