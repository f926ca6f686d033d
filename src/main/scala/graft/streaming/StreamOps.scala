package graft.streaming

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming surfaced through the driver contract: the op
  * below DRIVES a real streaming query (file source → watermarked
  * tumbling aggregate → Trigger.AvailableNow → memory sink) and
  * returns its drained result, so streaming execution passes the SAME
  * DuckDB hash gate as every batch operator — not just its own
  * ScalaTest reconciliation (StreamingSpec covers the wider feature
  * set: sessionization, stream-stream joins, dedup, RocksDB state).
  *
  * The aggregate mirrors EventOps.ev_tumbling's bucketing (epoch-hour
  * grain; Spark's window() aligns to the epoch) minus the distinct
  * user count — distinct aggregates aren't supported inside streaming
  * aggregations, which is itself a documented engine semantic.
  */
object StreamOps {

  private val runCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  private def streamTumbling(s: SparkSession, dir: String): DataFrame = {
    // stage a micro-precision streamable copy (graft sessions read the
    // events nanos column as BIGINT; streams watermark on TIMESTAMP)
    val src = graft.sources.SourceOps.tmpDir("graft_stream_src")
    Tables.events(s, dir)
      .select(expr("timestamp_micros(ts DIV 1000)").as("ts"),
        col("event_type"), col("value"))
      .write.mode("overwrite").parquet(src)
    val schema = s.read.parquet(src).schema
    val name = s"graft_stream_tumbling_${runCounter.incrementAndGet()}"
    val ckpt = graft.sources.SourceOps.tmpDir("graft_stream_ckpt")
    val agg = s.readStream.schema(schema).parquet(src)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sum_dec"))
    EventStream.runAvailableNow(agg, name, OutputMode.Complete(), ckpt)
    s.table(name)
      .select(
        unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n_events"),
        col("sum_dec").cast("decimal(28,4)").cast("double").as("sum_value"))
      .orderBy("hour_epoch", "event_type")
  }

  private val streamTumblingSql =
    """SELECT hour_epoch, event_type, count(*) AS n_events,
      | CAST(CAST(round(sum(CAST(value AS DECIMAL(18,2))), 4) AS DECIMAL(28,4)) AS DOUBLE) AS sum_value
      |FROM (SELECT es - (es % 3600) AS hour_epoch, event_type, value
      |      FROM (SELECT epoch_ns(ts)//1000000000 AS es, event_type, value FROM events) e) b
      |GROUP BY hour_epoch, event_type
      |ORDER BY hour_epoch, event_type""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("stream_tumbling", streamTumbling, Some(streamTumblingSql)))
}
