package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** High-watermark incremental loading — the dynamic form of the
  * reference's static `IncrementalFilter` text (ref: DW_Table_Config
  * IncrementalFilter; the reference re-runs a fixed predicate, so
  * reloads overlap or miss late data). A tracker persists the max
  * loaded watermark per table and derives the next filter from it.
  *
  * Delivery semantics: [[incrementalBatch]] re-reads rows AT the
  * stored watermark too (`>=`), so rows that arrive late but share
  * the boundary timestamp are never lost — the batch is AT-LEAST-ONCE
  * and the boundary rows of the previous run are re-delivered.
  * Compose with a keyed [[Merger.upsert]] / [[Merger.dedupLatest]]
  * (both idempotent) for end-to-end exactly-once, as
  * [[exactlyOnceLoad]] does. Use [[strictBatch]] only when the
  * watermark column is known unique (then `>` is exact and cheaper).
  *
  * The watermark store is a tiny parquet dataset (cluster-readable,
  * atomically replaced per run) — no RDBMS on the batch path.
  */
object IncrementalTracker {

  final case class Watermark(tableName: String, watermark: String)

  def loadWatermarks(spark: SparkSession, dir: String): Map[String, String] = {
    import spark.implicits._
    // existence probe via the Hadoop FileSystem — the watermark store
    // lives beside the data (object-store paths included), never on
    // the driver's POSIX view
    if (!graft.sources.Fs.exists(spark, s"$dir/watermarks")) Map.empty
    else spark.read.parquet(s"$dir/watermarks").as[Watermark].collect()
      .map(w => w.tableName -> w.watermark).toMap
  }

  def saveWatermarks(spark: SparkSession, dir: String, marks: Map[String, String]): Unit = {
    import spark.implicits._
    marks.toSeq.map { case (t, w) => Watermark(t, w) }.toDS()
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/watermarks")
  }

  /** Lossless string image of the watermark value. Timestamps are
    * formatted with full microsecond precision (Spark timestamps ARE
    * micros, so parse-back is exact); other types use the plain cast.
    * A bare `cast(string)` on a timestamp can drop ".000000" vs
    * ".5" asymmetrically across writers — formatting pins the shape.
    */
  private def watermarkString(df: DataFrame, watermarkCol: String, c: Column): Column =
    df.schema(watermarkCol).dataType match {
      case TimestampType => date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
      case _ => c.cast("string")
    }

  /** At-least-once batch: rows at-or-above the stored watermark
    * (everything on first run), plus the new high watermark observed.
    * Boundary rows re-deliver on the next run — follow with a keyed
    * idempotent merge (see [[exactlyOnceLoad]]).
    */
  def incrementalBatch(
      df: DataFrame,
      watermarkCol: String,
      previous: Option[String]
  ): (DataFrame, Option[String]) =
    batch(df, watermarkCol, previous, inclusive = true)

  /** Strictly-above batch — exact only when `watermarkCol` is unique
    * across rows; otherwise rows sharing the boundary value that land
    * after a run are missed (AT-MOST-ONCE). Prefer [[incrementalBatch]].
    */
  def strictBatch(
      df: DataFrame,
      watermarkCol: String,
      previous: Option[String]
  ): (DataFrame, Option[String]) =
    batch(df, watermarkCol, previous, inclusive = false)

  private def batch(
      df: DataFrame,
      watermarkCol: String,
      previous: Option[String],
      inclusive: Boolean
  ): (DataFrame, Option[String]) = {
    val wm = col(watermarkCol)
    val filtered = previous match {
      case Some(w) =>
        val bound = lit(w).cast(df.schema(watermarkCol).dataType)
        df.filter(if (inclusive) wm >= bound else wm > bound)
      case None => df
    }
    val next = filtered.agg(watermarkString(df, watermarkCol, max(wm))).head().getString(0)
    (filtered, Option(next).orElse(previous))
  }

  /** End-to-end exactly-once incremental load: at-least-once batch
    * (re-reads watermark ties) merged into `target` by `keys` with
    * latest-wins order — re-delivered boundary rows collapse in the
    * merge, so the composition is exactly-once regardless of ties.
    */
  def exactlyOnceLoad(
      target: DataFrame,
      arrivals: DataFrame,
      watermarkCol: String,
      previous: Option[String],
      keys: Seq[String],
      order: Seq[Column]
  ): (DataFrame, Option[String]) = {
    val (batchDf, next) = incrementalBatch(arrivals, watermarkCol, previous)
    (Merger.upsert(target, batchDf, keys, order), next)
  }
}
