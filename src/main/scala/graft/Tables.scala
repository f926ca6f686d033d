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
    * Spark rejects as a timestamp type; graft sessions read them as
    * BIGINT nanos (exact integer arithmetic downstream, no sub-micro
    * truncation ambiguity). The `nanosAsLong` conf this needs is part
    * of the session contract — set once in [[GraftSession.build]] /
    * [[GraftSession.tune]], NOT here: a conf flip inside a loader
    * would race concurrent reads and silently retype other nanos
    * columns mid-session.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "graft sessions read parquet nanos as BIGINT; build the session via GraftSession.build/tune")
    load(spark, dir, "events")
  }
}
