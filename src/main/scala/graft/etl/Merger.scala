package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Key-based warehouse load semantics the reference's metadata
  * declares but leaves unimplemented (ref: DW_Output_Column_Config
  * IsKey — "Used for MERGE keys"; SMFG_DW_ETL_DAG.py load_stage
  * placeholder).
  *
  * All three operations are one shuffle on the key set (window over
  * partitionBy(keys)) — no driver loops, no per-key round trips; at
  * 100 TB the shuffle is hash-partitioned and AQE-coalesced.
  */
object Merger {

  /** Latest-wins upsert: union current + updates, keep the first row
    * per key under `order` (e.g. version DESC). Idempotent.
    */
  def upsert(current: DataFrame, updates: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    current.unionByName(updates)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** In-table dedup keep-latest-per-key (staging replay protection —
    * the reference re-extracts chunks on retry, so downstream loads
    * must collapse replays).
    */
  def dedupLatest(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    upsert(df, df.limit(0), keys, order)

  /** SCD2 historization: all versions per key become rows with
    * [validFrom, validTo) ranges; open-ended current row flagged.
    * `effective` must be strictly increasing per key under `versionOrder`.
    */
  /** Open-ended rows carry the conventional high-date sentinel
    * instead of NULL (keeps range predicates sargable and the column
    * non-nullable).
    */
  val OpenEnd = "9999-12-31"

  def scd2(df: DataFrame, keys: Seq[String], versionOrder: Seq[Column], effective: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(versionOrder: _*)
    df.withColumn("valid_from", effective)
      .withColumn("__next", lead(effective, 1).over(w))
      .withColumn("is_current", when(col("__next").isNull, lit(1)).otherwise(lit(0)))
      .withColumn("valid_to", coalesce(col("__next"), lit(OpenEnd).cast("date")))
      .drop("__next")
  }
}
