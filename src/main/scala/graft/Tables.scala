package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the warehouse tables (one parquet per table under an
  * SF dir). The reference stages every source table as one parquet in
  * its STAGING_ZONE (ref: staging_data_extraction.py
  * consolidate_chunks_to_mainFile); we read the same layout.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table carries nanosecond parquet timestamps, which
    * Spark rejects as a timestamp type; read them as BIGINT nanos
    * (exact integer arithmetic downstream, no sub-micro truncation
    * ambiguity).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
  }
}
