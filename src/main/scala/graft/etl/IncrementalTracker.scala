package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** High-watermark incremental loading — the dynamic form of the
  * reference's static `IncrementalFilter` text (ref: DW_Table_Config
  * IncrementalFilter; the reference re-runs a fixed predicate, so
  * reloads overlap or miss late data). A tracker persists the max
  * loaded watermark per table and derives the next filter from it.
  *
  * The watermark store is a tiny parquet dataset (cluster-readable,
  * atomically replaced per run) — no RDBMS on the batch path.
  */
object IncrementalTracker {

  final case class Watermark(tableName: String, watermark: String)

  def loadWatermarks(spark: SparkSession, dir: String): Map[String, String] = {
    import spark.implicits._
    val path = new java.io.File(s"$dir/watermarks")
    if (!path.exists()) Map.empty
    else spark.read.parquet(path.toString).as[Watermark].collect()
      .map(w => w.tableName -> w.watermark).toMap
  }

  def saveWatermarks(spark: SparkSession, dir: String, marks: Map[String, String]): Unit = {
    import spark.implicits._
    marks.toSeq.map { case (t, w) => Watermark(t, w) }.toDS()
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/watermarks")
  }

  /** Rows strictly above the stored watermark (everything on first
    * run), plus the new high watermark observed in this batch.
    */
  def incrementalBatch(
      df: DataFrame,
      watermarkCol: String,
      previous: Option[String]
  ): (DataFrame, Option[String]) = {
    val filtered = previous match {
      case Some(w) => df.filter(col(watermarkCol) > lit(w).cast(df.schema(watermarkCol).dataType))
      case None => df
    }
    val next = filtered.agg(max(col(watermarkCol)).cast("string")).head().getString(0)
    (filtered, Option(next).orElse(previous))
  }
}
