package graft.ops

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline-health pack — the monitoring ops a production curation
  * pipeline runs BETWEEN ingest and training export: has the fact
  * distribution drifted since the last training snapshot, how much
  * compute does padded batching waste at each sequence-length bucket,
  * and which "users" in the event stream are machines. All three are
  * first-class curation citizens at 100 TB: drift gates retraining,
  * padding waste prices the export layout, bot filtering removes the
  * highest-volume noise source before any text ever ships.
  */
object PipelineHealth {

  // ---------------------------------------------------------------
  // etl_dist_drift — train/serve distribution drift of the order-
  // value distribution between two date periods (the snapshot the
  // model trained on vs the window it serves), the PSI-class check
  // run before every retrain. Fixed $25k-cent bands (clipped to 20)
  // rather than learned quantile edges: fixed edges are the
  // production choice precisely because they stay comparable across
  // snapshots and never depend on either period's data. Per band the
  // exact per-period shares and the cross-multiplied share delta
  //   delta_ppm = |n_a·N_b − n_b·N_a| · 10⁶ DIV (N_a·N_b)
  // (ONE truncation, not a difference of two truncated shares; the
  // band L1 total = 2× total-variation distance). PSI's ln(pA/pB)
  // term is a runtime transcendental — hash-drift — so the op emits
  // the exact TV geometry instead (SURVEY §5).
  //
  // Scale bounds: n·N ≤ N², ×10⁶ → DECIMAL(38,0)-safe to 10¹⁵ rows.
  //
  // Plan shape: one fact scan → 20-group map-side-combined
  // aggregate; per-period totals are unpartitioned window sums over
  // the 20-row band relation (a re-aggregate-and-join would rescan
  // the fact — no exchange reuse across aggregate shapes). A 100 TB
  // orders table costs exactly one scan, no shuffle beyond 20 groups.
  // ---------------------------------------------------------------
  private val DriftPivot = "1998-01-01"
  private val BandCents = 2500000L // $25k bands
  private val MaxBand = 19

  private def distDrift(s: SparkSession, dir: String): DataFrame = {
    val banded = Tables.load(s, dir, "orders")
      .select(
        least(expr(s"CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) DIV $BandCents"),
          lit(MaxBand.toLong)).as("band"),
        when(col("o_orderdate").cast("date") < lit(DriftPivot).cast("date"), 1L)
          .otherwise(0L).as("a"),
        when(col("o_orderdate").cast("date") >= lit(DriftPivot).cast("date"), 1L)
          .otherwise(0L).as("b"))
      .groupBy("band").agg(sum("a").as("n_a"), sum("b").as("n_b"))
    banded
      .withColumn("na", sum(col("n_a")).over(Window.partitionBy()))
      .withColumn("nb", sum(col("n_b")).over(Window.partitionBy()))
      .select(col("band"), col("n_a"), col("n_b"),
        expr("CAST(CAST(n_a AS DECIMAL(38,0)) * 1000000 DIV na AS BIGINT)").as("share_a_ppm"),
        expr("CAST(CAST(n_b AS DECIMAL(38,0)) * 1000000 DIV nb AS BIGINT)").as("share_b_ppm"),
        expr("""CAST(abs(CAST(n_a AS DECIMAL(38,0)) * nb - CAST(n_b AS DECIMAL(38,0)) * na)
               |  * 1000000 DIV (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)""".stripMargin)
          .as("delta_ppm"))
      .orderBy("band")
  }

  private val distDriftSql =
    s"""WITH banded AS (
      |  SELECT least(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |               // $BandCents, $MaxBand) AS band,
      |         CASE WHEN CAST(o_orderdate AS DATE) < DATE '$DriftPivot'
      |              THEN 1 ELSE 0 END AS a,
      |         CASE WHEN CAST(o_orderdate AS DATE) >= DATE '$DriftPivot'
      |              THEN 1 ELSE 0 END AS b
      |  FROM orders),
      |cell AS (SELECT band, CAST(sum(a) AS BIGINT) AS n_a,
      |                CAST(sum(b) AS BIGINT) AS n_b
      |         FROM banded GROUP BY 1),
      |tot AS (SELECT sum(n_a) AS na, sum(n_b) AS nb FROM cell)
      |SELECT band, n_a, n_b,
      |       CAST(n_a * 1000000 // na AS BIGINT) AS share_a_ppm,
      |       CAST(n_b * 1000000 // nb AS BIGINT) AS share_b_ppm,
      |       CAST(abs(n_a * nb - n_b * na) * 1000000
      |            // (na * nb) AS BIGINT) AS delta_ppm
      |FROM cell CROSS JOIN tot
      |ORDER BY band""".stripMargin

  // ---------------------------------------------------------------
  // exp_length_buckets — padded-batching waste by power-of-2
  // sequence-length bucket (the report that decides a training
  // export's bucket boundaries): each document pads to the next
  // power of 2 of its whitespace token count; per bucket the doc
  // count, true token total, and
  //   waste_ppm = (cap·n_docs − Σtokens) · 10⁶ DIV (cap·n_docs)
  // — the fraction of batch FLOPs spent on padding if batches are
  // drawn bucket-pure. Next-pow2 with zero transcendentals:
  //   cap = 1 << length(bin(tok − 1))   (tok ≥ 2; 1 otherwise)
  // — the bitlen idiom proven engine-identical by txt_surprisal.
  //
  // Plan shape: map-only length extraction (codegen'd split/size;
  // the text column is never carried past the map) → ≤ ~24-group
  // map-side-combined aggregate. One scan, no real shuffle.
  // ---------------------------------------------------------------
  private def lengthBuckets(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "documents")
      .select(expr("size(split(trim(text), '\\\\s+'))").as("tok"))
      .select(col("tok"),
        expr("CASE WHEN tok <= 1 THEN CAST(1 AS BIGINT) " +
          "ELSE CAST(shiftleft(1, length(bin(tok - 1))) AS BIGINT) END").as("bucket_cap"))
      .groupBy("bucket_cap")
      .agg(count(lit(1)).as("n_docs"), sum(col("tok").cast("long")).as("sum_tokens"))
      .select(col("bucket_cap"), col("n_docs"), col("sum_tokens"),
        expr("""CAST((CAST(bucket_cap AS DECIMAL(38,0)) * n_docs - sum_tokens) * 1000000
               |  DIV (CAST(bucket_cap AS DECIMAL(38,0)) * n_docs) AS BIGINT)""".stripMargin)
          .as("waste_ppm"))
      .orderBy("bucket_cap")
  }

  private val lengthBucketsSql =
    """WITH t AS (
      |  SELECT len(regexp_split_to_array(trim(text), '\s+')) AS tok
      |  FROM documents),
      |b AS (
      |  SELECT tok,
      |         CASE WHEN tok <= 1 THEN CAST(1 AS BIGINT)
      |              ELSE CAST(1 << length(bin(tok - 1)) AS BIGINT) END AS bucket_cap
      |  FROM t),
      |cell AS (
      |  SELECT bucket_cap, CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sum(tok) AS BIGINT) AS sum_tokens
      |  FROM b GROUP BY 1)
      |SELECT bucket_cap, n_docs, sum_tokens,
      |       CAST((bucket_cap * n_docs - sum_tokens) * 1000000
      |            // (bucket_cap * n_docs) AS BIGINT) AS waste_ppm
      |FROM cell
      |ORDER BY bucket_cap""".stripMargin

  // ---------------------------------------------------------------
  // ev_bot_detect — machine-traffic screen over the event stream,
  // the standard pre-curation filter (bot users dominate raw event
  // volume and poison every downstream count). Two exact signals per
  // qualifying user (≥ MinEvents):
  //   rate_per_hr_milli = n·3600·1000 DIV span_s   (sustained rate)
  //   cv2_ppm = (m·Σg² − (Σg)²)·10⁶ DIV (Σg)²      (gap regularity —
  //     squared coefficient of variation of inter-event gaps; m·Σg²
  //     ≥ (Σg)² by Cauchy–Schwarz so the DIV numerator is never
  //     negative, and a metronome scores ~0 where humans are bursty)
  // is_bot flags rate ≥ RateThreshold OR cv² ≤ RegularityThreshold;
  // the top SuspectLimit by (rate DESC, cv² ASC, user) are emitted —
  // deterministic rank, never bare LIMIT (SURVEY §5.3).
  //
  // Scale bounds: gaps in whole seconds; Σg ≤ m·span, m·Σg² summed
  // as DECIMAL(38,0) — safe to ~10¹² events per user at year spans.
  //
  // Plan shape: one user-keyed window shuffle (lag) feeding a
  // user-keyed map-side-combined aggregate ON THE SAME partitioning
  // — Catalyst reuses the exchange, so the fact is shuffled once;
  // the final top-k window runs over the ≥MinEvents survivors.
  // ---------------------------------------------------------------
  private val MinEvents = 30
  private val RateThresholdMilli = 100000L // ≥ 100 events/hour sustained
  private val RegularityThresholdPpm = 250000L // cv² ≤ 0.25 (cv ≤ 0.5)
  private val SuspectLimit = 50

  private def botDetect(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("es", "event_id")
    val g = Tables.events(s, dir)
      .select(col("user_id"), expr("ts DIV 1000000000").as("es"), col("event_id"))
      .withColumn("gap_s", col("es") - lag(col("es"), 1).over(byUser))
    val stats = g.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        (max(col("es")) - min(col("es"))).as("span_s"),
        sum(expr("CAST(gap_s AS DECIMAL(38,0))")).as("sg"),
        sum(expr("CAST(gap_s AS DECIMAL(38,0)) * gap_s")).as("sgg"))
      .filter(col("n") >= MinEvents)
      .select(col("user_id"), col("n"), col("span_s"),
        expr("CAST(CAST(n AS DECIMAL(38,0)) * 3600000 DIV greatest(span_s, 1) AS BIGINT)")
          .as("rate_per_hr_milli"),
        expr("""CAST(((CAST(n AS DECIMAL(38,0)) - 1) * sgg - sg * sg) * 1000000
               |  DIV greatest(sg * sg, 1) AS BIGINT)""".stripMargin).as("cv2_ppm"))
    stats
      .withColumn("is_bot",
        (col("rate_per_hr_milli") >= RateThresholdMilli ||
          col("cv2_ppm") <= RegularityThresholdPpm).cast("int"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rate_per_hr_milli").desc, col("cv2_ppm"), col("user_id"))))
      .filter(col("rk") <= SuspectLimit)
      .select("rk", "user_id", "n", "span_s", "rate_per_hr_milli", "cv2_ppm", "is_bot")
      .orderBy("rk")
  }

  private val botDetectSql =
    s"""WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 1000000000 AS es, event_id FROM events),
      |g AS (
      |  SELECT user_id, es,
      |         es - lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id)
      |           AS gap_s
      |  FROM e),
      |st AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
      |         CAST(max(es) - min(es) AS BIGINT) AS span_s,
      |         sum(CAST(gap_s AS HUGEINT)) AS sg,
      |         sum(CAST(gap_s AS HUGEINT) * gap_s) AS sgg
      |  FROM g GROUP BY 1 HAVING count(*) >= $MinEvents),
      |r AS (
      |  SELECT user_id, n, span_s,
      |         CAST(n * 3600000 // greatest(span_s, 1) AS BIGINT)
      |           AS rate_per_hr_milli,
      |         CAST(((n - 1) * sgg - sg * sg) * 1000000
      |              // greatest(sg * sg, 1) AS BIGINT) AS cv2_ppm
      |  FROM st),
      |rk AS (
      |  SELECT *, row_number() OVER (
      |           ORDER BY rate_per_hr_milli DESC, cv2_ppm, user_id) AS rk
      |  FROM r)
      |SELECT CAST(rk AS INT) AS rk, user_id, n, span_s, rate_per_hr_milli,
      |       cv2_ppm,
      |       CAST(CASE WHEN rate_per_hr_milli >= $RateThresholdMilli
      |                   OR cv2_ppm <= $RegularityThresholdPpm
      |            THEN 1 ELSE 0 END AS INT) AS is_bot
      |FROM rk WHERE rk <= $SuspectLimit
      |ORDER BY rk""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("etl_dist_drift", distDrift, Some(distDriftSql)),
    Op("exp_length_buckets", lengthBuckets, Some(lengthBucketsSql)),
    Op("ev_bot_detect", botDetect, Some(botDetectSql)))
}
