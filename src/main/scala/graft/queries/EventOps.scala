package graft.queries

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch time-series ops over the events table. Timestamps are
  * nanosecond parquet INT64 — read as BIGINT nanos (see
  * Tables.events) and reduced to integer epoch seconds, so every
  * derived value is integer arithmetic (exact in any engine).
  * Streaming equivalents live in graft.streaming.
  */
object EventOps {

  private def finSql(inner: String): String =
    s"CAST(CAST(round($inner, 4) AS DECIMAL(28,4)) AS DOUBLE)"

  private[graft] def withEs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).withColumn("es", expr("ts DIV 1000000000"))

  // ---------------------------------------------------------------
  // ev_tumbling — tumbling 1h window aggregate (batch analog of the
  // streaming window; same bucketing arithmetic).
  // ---------------------------------------------------------------
  private def tumbling(s: SparkSession, dir: String): DataFrame =
    withEs(s, dir)
      .withColumn("hour_epoch", col("es") - (col("es") % 3600))
      .groupBy("hour_epoch", "event_type")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(28,4)").cast("double").as("sum_value"))
      .orderBy("hour_epoch", "event_type")

  private val tumblingSql =
    s"""SELECT hour_epoch, event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
      | ${finSql("sum(CAST(value AS DECIMAL(18,2)))")} AS sum_value
      |FROM (SELECT es - (es % 3600) AS hour_epoch, event_type, user_id, value
      |      FROM (SELECT epoch_ns(ts)//1000000000 AS es, event_type, user_id, value FROM events) e) b
      |GROUP BY hour_epoch, event_type
      |ORDER BY hour_epoch, event_type""".stripMargin

  // ---------------------------------------------------------------
  // ev_sessionize — 30-min-gap sessionization: lag → new-session
  // flag → running session number → per-session stats. Both windows
  // partition by user_id (no global sort at any scale).
  // ---------------------------------------------------------------
  private def sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("es", "event_id")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withEs(s, dir)
      .select("user_id", "event_id", "es", "value")
      .withColumn("prev_es", lag(col("es"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_es").isNull || col("es") - col("prev_es") > 1800, lit(1)).otherwise(lit(0)))
      .withColumn("session_no", sum(col("is_new")).over(cum))
      .groupBy("user_id", "session_no")
      .agg(
        min(col("es")).as("session_start"),
        max(col("es")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(28,4)").cast("double").as("sum_value"))
      .orderBy("user_id", "session_no")
  }

  private[graft] val sessionizeSql =
    s"""WITH e AS (SELECT user_id, event_id, epoch_ns(ts)//1000000000 AS es, value FROM events),
      |f AS (SELECT *, CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
      |g AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY es, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no FROM f)
      |SELECT user_id, session_no, min(es) AS session_start, max(es) AS session_end,
      |  count(*) AS n_events, ${finSql("sum(CAST(value AS DECIMAL(18,2)))")} AS sum_value
      |FROM g GROUP BY user_id, session_no
      |ORDER BY user_id, session_no""".stripMargin

  // ---------------------------------------------------------------
  // ev_json_props — semi-structured property extraction from the
  // JSON props column, aggregated per event type.
  // ---------------------------------------------------------------
  private def jsonProps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  private val jsonPropsSql = // CAST sums: DuckDB sum(INT) is HUGEINT, Spark's is BIGINT
    """SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
      |FROM (SELECT event_type, CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT) AS k FROM events) e
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  // ev_asof_join — as-of join (each purchase matched to the latest
  // signup at-or-before it, per user). Spark lacks the operator;
  // preference order (a) applies: compose it as tagged-union +
  // ignore-nulls last over one partitioned window — a single shuffle
  // on the key, no per-row lookups, scales like any window.
  // ---------------------------------------------------------------
  private def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = withEs(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("es"), col("event_id"), col("value"), lit(1).as("tag"),
        lit(null).cast("bigint").as("r_es"), lit(null).cast("double").as("r_value"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("es"), col("event_id"), lit(null).cast("double").as("value"),
        lit(0).as("tag"), col("es").as("r_es"), col("value").as("r_value"))
    val w = Window.partitionBy("user_id").orderBy("es", "tag", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(signups)
      .withColumn("signup_es", last(col("r_es"), ignoreNulls = true).over(w))
      .withColumn("signup_value", last(col("r_value"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("user_id"), col("es"), col("event_id"), col("value"),
        coalesce(col("signup_es"), lit(-1L)).as("signup_es"),
        coalesce(col("signup_value"), lit(-1.0)).as("signup_value"))
      .orderBy("user_id", "es", "event_id")
  }

  private val asofJoinSql =
    """WITH e AS (SELECT user_id, epoch_ns(ts)//1000000000 AS es, event_id, event_type, value FROM events),
      |u AS (
      |  SELECT user_id, es, event_id, value, 1 AS tag,
      |         CAST(NULL AS BIGINT) AS r_es, CAST(NULL AS DOUBLE) AS r_value
      |  FROM e WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id, es, event_id, CAST(NULL AS DOUBLE), 0, es, value
      |  FROM e WHERE event_type = 'signup'),
      |c AS (SELECT *,
      |        last_value(r_es IGNORE NULLS) OVER w AS signup_es,
      |        last_value(r_value IGNORE NULLS) OVER w AS signup_value
      |      FROM u
      |      WINDOW w AS (PARTITION BY user_id ORDER BY es, tag, event_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT user_id, es, event_id, value,
      |  coalesce(signup_es, -1) AS signup_es,
      |  coalesce(signup_value, -1.0) AS signup_value
      |FROM c WHERE tag = 1
      |ORDER BY user_id, es, event_id""".stripMargin

  // ---------------------------------------------------------------
  // ev_funnel — signup→purchase conversion: per-user first-signup /
  // first-subsequent-purchase, integer ppm conversion rate. One
  // aggregation per stage + one join, all on user_id.
  // ---------------------------------------------------------------
  private def funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = withEs(s, dir)
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("es")).as("signup_es"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("es"))
    val converted = signups.join(purchases, "user_id")
      .filter(col("es") >= col("signup_es"))
      .select("user_id").distinct()
    val total = ev.select("user_id").distinct().count()
    val nSignup = signups.count()
    val nConv = converted.count()
    import s.implicits._
    Seq((total, nSignup, nConv, nConv * 1000000L / nSignup))
      .toDF("n_users", "n_signup_users", "n_converted", "conversion_ppm")
  }

  private val funnelSql =
    """WITH e AS (SELECT user_id, epoch_ns(ts)//1000000000 AS es, event_type FROM events),
      |s AS (SELECT user_id, min(es) AS signup_es FROM e WHERE event_type = 'signup' GROUP BY user_id),
      |c AS (SELECT DISTINCT s.user_id
      |      FROM s JOIN e ON e.user_id = s.user_id
      |      WHERE e.event_type = 'purchase' AND e.es >= s.signup_es)
      |SELECT (SELECT count(DISTINCT user_id) FROM e) AS n_users,
      |       (SELECT count(*) FROM s) AS n_signup_users,
      |       (SELECT count(*) FROM c) AS n_converted,
      |       (SELECT count(*) FROM c) * 1000000 // (SELECT count(*) FROM s) AS conversion_ppm""".stripMargin

  // ---------------------------------------------------------------
  // ev_sliding — batch sliding-window aggregate: 1 h windows sliding
  // every 15 min, so each event contributes to exactly 4 windows.
  // Window membership is integer epoch arithmetic (explode of 4 shard
  // ids — identical bucketing to Structured Streaming's
  // window(ts, '1 hour', '15 minutes'), but portable to the oracle).
  // The 4× row expansion happens BEFORE the shuffle but map-side
  // partial aggregation collapses it to window cardinality.
  // ---------------------------------------------------------------
  private def sliding(s: SparkSession, dir: String): DataFrame =
    withEs(s, dir)
      .select(col("user_id"), col("es"), col("value"),
        explode(sequence(lit(0), lit(3))).as("k"))
      // `%` (not pmod): DuckDB's % keeps the dividend's sign, and the
      // oracle buckets with `es % 900` — pmod would silently shift
      // window starts for pre-1970 (negative-epoch) timestamps
      .withColumn("win_start", col("es") - col("es") % 900 - col("k") * 900)
      .groupBy("win_start")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(28,4)").cast("double").as("sum_value"))
      .orderBy("win_start")

  private val slidingSql =
    s"""SELECT win_start, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
      | ${finSql("sum(CAST(value AS DECIMAL(18,2)))")} AS sum_value
      |FROM (
      |  SELECT user_id, value, es - (es % 900) - k * 900 AS win_start
      |  FROM (SELECT user_id, value, epoch_ns(ts)//1000000000 AS es, unnest(range(0, 4)) AS k
      |        FROM events) e
      |) w
      |GROUP BY win_start
      |ORDER BY win_start""".stripMargin

  // ---------------------------------------------------------------
  // ev_retention — monthly cohort retention: users cohorted by first-
  // activity month; per (cohort, month offset) the share of the
  // cohort still active. All month math is integer (year*12+month),
  // the rate is integer ppm — no calendar/float drift across engines.
  // ---------------------------------------------------------------
  private def retention(s: SparkSession, dir: String): DataFrame = {
    val act = withEs(s, dir)
      .withColumn("t", timestamp_seconds(col("es")))
      .select(col("user_id"),
        (year(col("t")) * 12 + month(col("t"))).cast("int").as("ym"))
      .distinct()
    val cohort = act.groupBy("user_id").agg(min(col("ym")).as("cohort_ym"))
    val sizes = cohort.groupBy("cohort_ym").agg(countDistinct(col("user_id")).as("n_cohort"))
    act.join(cohort, "user_id")
      .groupBy(col("cohort_ym"), (col("ym") - col("cohort_ym")).as("month_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(sizes, "cohort_ym")
      .select(col("cohort_ym"), col("month_offset"), col("n_active"), col("n_cohort"),
        // integer DIV (== DuckDB // for positives); a double `/` then
        // cast can round up in Spark where // floors in DuckDB
        expr("n_active * CAST(1000000 AS BIGINT) DIV n_cohort").as("retention_ppm"))
      .orderBy("cohort_ym", "month_offset")
  }

  private val retentionSql =
    """WITH act AS (
      |  SELECT DISTINCT user_id,
      |    CAST(year(t) * 12 + month(t) AS INT) AS ym
      |  FROM (SELECT user_id, make_timestamp((epoch_ns(ts)//1000000000) * 1000000) AS t
      |        FROM events) e),
      |cohort AS (SELECT user_id, min(ym) AS cohort_ym FROM act GROUP BY user_id),
      |sizes AS (SELECT cohort_ym, count(DISTINCT user_id) AS n_cohort FROM cohort GROUP BY cohort_ym),
      |r AS (
      |  SELECT c.cohort_ym, a.ym - c.cohort_ym AS month_offset,
      |    count(DISTINCT a.user_id) AS n_active
      |  FROM act a JOIN cohort c ON a.user_id = c.user_id
      |  GROUP BY 1, 2)
      |SELECT r.cohort_ym, month_offset, n_active, n_cohort,
      |  n_active * 1000000 // n_cohort AS retention_ppm
      |FROM r JOIN sizes ON r.cohort_ym = sizes.cohort_ym
      |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  // ev_top_paths — behavioral path mining: the most common
  // consecutive event-type transitions per user (ordered by time with
  // the event id as the total-order tiebreak). One partitioned window
  // (shuffle on user_id) + a vocabulary-sized transition aggregate.
  // ---------------------------------------------------------------
  private def topPaths(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("es", "event_id")
    withEs(s, dir)
      .select(col("user_id"), col("es"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("step1"), col("next_type").as("step2"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy(col("n_transitions").desc, col("step1"), col("step2"))
      .limit(20)
  }

  private val topPathsSql =
    """SELECT event_type AS step1, next_type AS step2, count(*) AS n_transitions
      |FROM (
      |  SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |                           ORDER BY epoch_ns(ts)//1000000000, event_id) AS next_type
      |  FROM events) p
      |WHERE next_type IS NOT NULL
      |GROUP BY event_type, next_type
      |ORDER BY n_transitions DESC, step1, step2
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------
  // ev_anomaly_days — volume anomaly detection: days whose event
  // count deviates from the corpus mean by more than 2σ. The z-score
  // test is algebraically cleared of divisions — flag day x iff
  // (n·x − S)² > 4·(n·SS − S²) with S = Σx, SS = Σx² over n days
  // (both sides are n²·(…): lhs = n²(x−μ)², rhs = 4·n²·σ²) —
  // so the whole detector is EXACT integer arithmetic (no float mean
  // or stddev to drift across engines). The daily series is tiny
  // post-aggregation; stats are a 1-row broadcast. The products fit
  // BIGINT up to ~10⁹ events/day × 10⁴ days; past that, lift lhs/rhs
  // to DECIMAL(38,0) on both sides (same exactness, wider headroom).
  // ---------------------------------------------------------------
  private def anomalyDays(s: SparkSession, dir: String): DataFrame = {
    val daily = withEs(s, dir)
      .groupBy(expr("es DIV 86400").as("day_num"))
      .agg(count(lit(1)).as("x"))
    val stats = daily.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("s"),
      sum(col("x") * col("x")).as("ss"))
    daily.crossJoin(broadcast(stats))
      .withColumn("lhs", (col("n") * col("x") - col("s")) * (col("n") * col("x") - col("s")))
      .withColumn("rhs", lit(4L) * (col("n") * col("ss") - col("s") * col("s")))
      .filter(col("lhs") > col("rhs"))
      .select(col("day_num"), col("x").as("n_events"),
        col("s"), col("ss"), col("n").as("n_days"))
      .orderBy("day_num")
  }

  private val anomalyDaysSql =
    """WITH daily AS (
      |  SELECT (epoch_ns(ts)//1000000000) // 86400 AS day_num, count(*) AS x
      |  FROM events GROUP BY 1),
      |st AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s,
      |              CAST(sum(x * x) AS BIGINT) AS ss FROM daily)
      |SELECT day_num, x AS n_events, s, ss, n AS n_days
      |FROM daily CROSS JOIN st
      |WHERE (n * x - s) * (n * x - s) > 4 * (n * ss - s * s)
      |ORDER BY day_num""".stripMargin

  // ---------------------------------------------------------------
  // ev_gap_fill — dense hourly series per event type with
  // last-observation-carried-forward: the complete hour spine from
  // the corpus min to max hour LEFT-joins the observed hourly
  // aggregates; missing hours emit n_events = 0, is_gap = 1, and
  // carry the most recent observed hour's exact integer-cent sum.
  // LOCF is the portable two-step — a running max of the OBSERVED
  // hour (max ignores NULLs identically on both engines; no reliance
  // on IGNORE-NULLS window syntax) then a join back to that hour's
  // value — instead of last_value(IGNORE NULLS). Scale shape: the
  // fact table partial-aggregates to the (type, hour) grain first;
  // the spine is |types| × |hours| (dimension-sized), and every
  // window is partitioned by type.
  // ---------------------------------------------------------------
  private def gapFill(s: SparkSession, dir: String): DataFrame = {
    val ev = withEs(s, dir)
      .withColumn("h", col("es") - (col("es") % 3600))
      .withColumn("cents", expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
    val agg = ev.groupBy("event_type", "h")
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
    val bounds = ev.agg(min(col("h")).as("h0"), max(col("h")).as("h1")).head()
    val (h0, h1) = (bounds.getLong(0), bounds.getLong(1))
    val spine = ev.select("event_type").distinct()
      .withColumn("h", explode(expr(s"sequence(${h0}L, ${h1}L, 3600L)")))
    val w = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val vals = agg.select(col("event_type"), col("h").as("prev_obs_h"),
      col("sum_cents").as("carried_cents"))
    spine.join(agg, Seq("event_type", "h"), "left")
      .withColumn("obs_h", when(col("n_events").isNotNull, col("h")))
      .withColumn("prev_obs_h", max(col("obs_h")).over(w))
      .join(vals, Seq("event_type", "prev_obs_h"), "left")
      .select(col("event_type"), col("h").as("hour_epoch"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        when(col("n_events").isNull, 1).otherwise(0).as("is_gap"),
        col("carried_cents"))
      .orderBy("event_type", "hour_epoch")
  }

  private val gapFillSql =
    """WITH e AS (SELECT epoch_ns(ts)//1000000000 AS es, event_type,
      |             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM events),
      |b AS (SELECT es - (es % 3600) AS h, event_type, cents FROM e),
      |agg AS (SELECT event_type, h, count(*) AS n_events,
      |          CAST(sum(cents) AS BIGINT) AS sum_cents
      |        FROM b GROUP BY event_type, h),
      |bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM b),
      |hours AS (SELECT CAST(unnest(range((SELECT h0 FROM bounds),
      |            (SELECT h1 FROM bounds) + 3600, 3600)) AS BIGINT) AS h),
      |spine AS (SELECT t.event_type, hours.h
      |          FROM (SELECT DISTINCT event_type FROM b) t, hours),
      |j AS (
      |  SELECT s.event_type, s.h, a.n_events,
      |    max(CASE WHEN a.n_events IS NOT NULL THEN s.h END)
      |      OVER (PARTITION BY s.event_type ORDER BY s.h
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_obs_h
      |  FROM spine s LEFT JOIN agg a ON s.event_type = a.event_type AND s.h = a.h)
      |SELECT j.event_type, j.h AS hour_epoch,
      |  coalesce(j.n_events, 0) AS n_events,
      |  CASE WHEN j.n_events IS NULL THEN 1 ELSE 0 END AS is_gap,
      |  v.sum_cents AS carried_cents
      |FROM j LEFT JOIN agg v ON j.event_type = v.event_type AND j.prev_obs_h = v.h
      |ORDER BY j.event_type, hour_epoch""".stripMargin

  // ---------------------------------------------------------------
  // ev_hll_distinct — HyperLogLog distinct-user sketch per event
  // type, next to the exact count it approximates. THE mergeable
  // cardinality structure at 100 TB: registers are max-reducible, so
  // partial aggregation combines map-side and sketches union across
  // partitions/days by cell-wise max — one narrow pass where exact
  // COUNT(DISTINCT) must shuffle every key. Everything is integer-
  // exact and engine-portable: a 60-bit md5 hash (15 hex chars)
  // splits into a 6-bit register index + 54-bit suffix; rho =
  // 55 - bitlength(suffix); the harmonic sum uses the common
  // denominator 2^55 so S = Σ 2^(55-rho_j) is an exact BIGINT
  // (≤ 2^61); the alpha·m² factor is a ppm-scaled integer embedded
  // identically in both engines; the small-range (linear-counting)
  // correction is a 63-entry integer lookup precomputed HERE and
  // string-interpolated into both plans — no runtime transcendental
  // ever executes on either engine, so the estimate hashes
  // identically. Relative error at m=64 is ~13%; the op surfaces
  // err_ppm against the exact count as its own audit.
  // ---------------------------------------------------------------
  private val HllM = 64
  private val HllTwoPow = 55L // bit budget of the 54-bit suffix + 1
  private val HllAlphaM2E6: Long = // round(alpha_64 * m^2 * 1e6)
    math.round(0.7213 / (1.0 + 1.079 / HllM) * HllM * HllM * 1e6)
  private val HllSmallCutoff = (2.5 * HllM).toLong // linear-counting range
  /** Linear-counting table: V empty registers → round(m·ln(m/V)). */
  private val HllSmall: Seq[(Int, Long)] =
    (1 until HllM).map(v => v -> math.round(HllM * math.log(HllM.toDouble / v)))

  /** Max-reduced HLL registers (event_type, idx, mj) — exposed so the
    * spec can prove mergeability: registers over a union equal the
    * cell-wise max of per-shard registers.
    */
  private[graft] def hllRegisters(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        expr("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .select(col("event_type"), expr(s"h % $HllM").as("idx"),
        expr(s"h DIV $HllM").as("w"))
      .withColumn("rho",
        when(col("w") === 0, lit(HllTwoPow))
          .otherwise(lit(HllTwoPow) - length(expr("bin(w)"))))
      .groupBy("event_type", "idx")
      .agg(max(col("rho")).as("mj"))

  /** Finalize max-reduced registers (event_type, idx, mj) into the
    * op's output beside the exact count — shared by the batch op and
    * the stream_hll gate (whose registers arrive from a drained
    * streaming state store instead of a batch aggregate).
    */
  private[graft] def hllFinalize(reg: DataFrame, exactEvents: DataFrame): DataFrame = {
    val smallCase = HllSmall.map { case (v, e) => s"WHEN $v THEN ${e}L" }
      .mkString("CASE v ", " ", " ELSE -1L END")
    val sketch = reg.groupBy("event_type")
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($HllTwoPow - mj AS INT))")).as("s_present"),
        count(lit(1)).as("n_reg"))
      .withColumn("v", (lit(HllM) - col("n_reg")).cast("int"))
      .withColumn("s_total",
        col("s_present") + col("v") * lit(1L << HllTwoPow))
      .withColumn("est_raw",
        expr(s"CAST((CAST($HllAlphaM2E6 AS DECIMAL(38,0)) * CAST(${1L << HllTwoPow} AS DECIMAL(38,0)))" +
          s" div (CAST(s_total AS DECIMAL(38,0)) * 1000000) AS BIGINT)"))
      .withColumn("hll_est",
        when(col("est_raw") <= HllSmallCutoff && col("v") > 0, expr(smallCase))
          .otherwise(col("est_raw")))
    val exact = exactEvents
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n_exact"))
    sketch.join(exact, "event_type")
      .select(col("event_type"), col("n_exact"), col("hll_est"),
        expr("abs(hll_est - n_exact) * CAST(1000000 AS BIGINT) DIV n_exact").as("err_ppm"))
      .orderBy("event_type")
  }

  private def hllDistinct(s: SparkSession, dir: String): DataFrame =
    hllFinalize(hllRegisters(Tables.events(s, dir)), Tables.events(s, dir))

  private[graft] val hllDistinctSql = {
    val smallCase = HllSmall.map { case (v, e) => s"WHEN $v THEN $e" }
      .mkString("CASE v ", " ", " ELSE -1 END")
    s"""WITH h AS (
      |  SELECT event_type,
      |    (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT) AS h
      |  FROM events),
      |reg AS (
      |  SELECT event_type, h % $HllM AS idx,
      |    max(CASE WHEN h // $HllM = 0 THEN $HllTwoPow
      |             ELSE $HllTwoPow - length(bin(h // $HllM)) END) AS mj
      |  FROM h GROUP BY 1, 2),
      |sk AS (
      |  SELECT event_type,
      |    CAST(sum(1::BIGINT << CAST($HllTwoPow - mj AS INT)) AS BIGINT) AS s_present,
      |    CAST($HllM - count(*) AS INT) AS v
      |  FROM reg GROUP BY 1),
      |est AS (
      |  SELECT event_type, v,
      |    CAST(($HllAlphaM2E6::HUGEINT * ${1L << HllTwoPow}::HUGEINT)
      |      // ((s_present + v * ${1L << HllTwoPow}::HUGEINT) * 1000000) AS BIGINT) AS est_raw
      |  FROM sk),
      |fin AS (
      |  SELECT event_type,
      |    CASE WHEN est_raw <= $HllSmallCutoff AND v > 0 THEN $smallCase
      |         ELSE est_raw END AS hll_est
      |  FROM est),
      |ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events GROUP BY 1)
      |SELECT fin.event_type, n_exact, hll_est,
      |  abs(hll_est - n_exact) * CAST(1000000 AS BIGINT) // n_exact AS err_ppm
      |FROM fin JOIN ex ON fin.event_type = ex.event_type
      |ORDER BY fin.event_type""".stripMargin
  }

  // ---------------------------------------------------------------
  // ev_quantile_sketch — mergeable quantile sketch per event type:
  // a log2-bucket histogram over integer cents (bucket = bit length
  // of the value in cents), whose cells (event_type, bucket, cnt)
  // are summable — partial aggregation combines map-side, and
  // per-day/per-partition sketches merge by cell-wise addition, the
  // same mergeability contract as the CMS / HLL / Bloom / MinHash
  // family. Quantile estimates read off the cumulative cell counts
  // (bucket upper bound 2^b − 1, so est ∈ [exact, 2·exact) by
  // construction — the spec locks that envelope). The exact-cents
  // audit column uses the shuffle-bounded value-grid histogram
  // (groupBy distinct cents + cumulative window), NOT a per-type
  // sort of raw events — at 100 TB the sketch is what ships; the
  // exact histogram is the (still bounded) audit beside it.
  // Everything is integer arithmetic off floor(value·100): both
  // engines run the identical IEEE multiply-then-floor, so cells
  // and estimates hash-match exactly.
  // ---------------------------------------------------------------
  private val QsQuantiles = Seq(50, 95, 99)

  /** Mergeable sketch cells (event_type, bucket, cnt) — exposed so
    * the spec can prove cells over a union equal the cell-wise sum
    * of per-shard cells.
    */
  private[graft] def qsketchCells(events: DataFrame): DataFrame =
    events
      .withColumn("c", expr("CAST(floor(value * 100) AS BIGINT)"))
      .withColumn("bucket",
        expr("CASE WHEN c <= 0 THEN 0 ELSE length(bin(c)) END"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("cnt"))

  private def quantileSketch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select(col("event_type"), expr("CAST(floor(value * 100) AS BIGINT)").as("c"))
    // sketch-sized (|types|·64 rows) and multi-consumer: truncate so
    // the totals branch, the cumulative window, and the est→exact
    // audit chain never re-scan the event fact (5 FileScans without)
    val cells = qsketchCells(Tables.events(s, dir)).localCheckpoint()
    val totals = cells.groupBy("event_type").agg(sum(col("cnt")).as("n"))
    val ranks = totals
      .join(broadcast(QsQuantiles.toDF("q")))
      .withColumn("r", expr("CAST((q * n + 99) DIV 100 AS BIGINT)"))
    val wb = Window.partitionBy("event_type").orderBy("bucket")
    val cum = cells.withColumn("cum", sum(col("cnt")).over(wb))
    val est = ranks.join(cum, "event_type")
      .filter(col("cum") >= col("r"))
      .groupBy("event_type", "q", "n", "r")
      .agg(min(col("bucket")).as("bucket"))
      .withColumn("est_cents",
        expr("CASE WHEN bucket = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT)) - 1 END"))
    // exact audit via the bounded value-grid histogram
    val wh = Window.partitionBy("event_type").orderBy("c")
    val hist = ev.groupBy("event_type", "c").agg(count(lit(1)).as("hcnt"))
      .withColumn("hcum", sum(col("hcnt")).over(wh))
    val exact = est.select("event_type", "q", "r")
      .join(hist, "event_type")
      .filter(col("hcum") >= col("r"))
      .groupBy("event_type", "q")
      .agg(min(col("c")).as("exact_cents"))
    est.join(exact, Seq("event_type", "q"))
      .select(col("event_type"), col("q"), col("n"),
        col("exact_cents"), col("est_cents"),
        // guard the ratio: a quantile rank landing on value 0 (bucket
        // 0) makes exact_cents 0, where Spark's non-ANSI DIV yields
        // NULL but DuckDB's // raises — a latent engine divergence
        // (ADVICE r5); both plans pin that case to 0
        expr("CASE WHEN exact_cents > 0 THEN " +
          "(est_cents - exact_cents) * CAST(1000000 AS BIGINT) DIV exact_cents " +
          "ELSE CAST(0 AS BIGINT) END")
          .as("slack_ppm"))
      .orderBy("event_type", "q")
  }

  private val quantileSketchSql =
    s"""WITH e AS (SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS c FROM events),
      |cells AS (
      |  SELECT event_type,
      |    CASE WHEN c <= 0 THEN 0 ELSE length(bin(c)) END AS bucket,
      |    count(*) AS cnt
      |  FROM e GROUP BY 1, 2),
      |tot AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM cells GROUP BY 1),
      |ranks AS (
      |  SELECT event_type, q, n, (q * n + 99) // 100 AS r
      |  FROM tot, (SELECT unnest([${QsQuantiles.mkString(", ")}]) AS q)),
      |cum AS (
      |  SELECT event_type, bucket,
      |    sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum
      |  FROM cells),
      |est AS (
      |  SELECT r.event_type, r.q, r.n, r.r, min(c.bucket) AS bucket
      |  FROM ranks r JOIN cum c ON r.event_type = c.event_type AND c.cum >= r.r
      |  GROUP BY 1, 2, 3, 4),
      |hist AS (
      |  SELECT event_type, c,
      |    sum(cnt) OVER (PARTITION BY event_type ORDER BY c) AS hcum
      |  FROM (SELECT event_type, c, count(*) AS cnt FROM e GROUP BY 1, 2) h),
      |ex AS (
      |  SELECT e2.event_type, e2.q, min(h.c) AS exact_cents
      |  FROM est e2 JOIN hist h ON e2.event_type = h.event_type AND h.hcum >= e2.r
      |  GROUP BY 1, 2)
      |SELECT est.event_type, est.q, est.n, ex.exact_cents,
      |  CASE WHEN est.bucket = 0 THEN CAST(0 AS BIGINT)
      |       ELSE (CAST(1 AS BIGINT) << CAST(est.bucket AS INT)) - 1 END AS est_cents,
      |  CASE WHEN ex.exact_cents > 0 THEN
      |    (CASE WHEN est.bucket = 0 THEN CAST(0 AS BIGINT)
      |          ELSE (CAST(1 AS BIGINT) << CAST(est.bucket AS INT)) - 1 END
      |     - ex.exact_cents) * CAST(1000000 AS BIGINT) // ex.exact_cents
      |  ELSE CAST(0 AS BIGINT) END AS slack_ppm
      |FROM est JOIN ex ON est.event_type = ex.event_type AND est.q = ex.q
      |ORDER BY est.event_type, est.q""".stripMargin

  // ---------------------------------------------------------------
  // ev_cep_pattern — complex-event-processing sequence detection
  // (the MATCH_RECOGNIZE class): per user, signup → FIRST view
  // within 24 h → FIRST purchase within 24 h of that view, emitting
  // one row per completed 3-step sequence. The scale shape avoids
  // per-user backtracking: one partitioned window precomputes every
  // view's next-purchase time (running min over the following
  // frame), so matching is two bounded joins — signups to their
  // first in-window view, then that view's precomputed next
  // purchase — never an events³ self-join. Ties are deterministic:
  // the window sorts by (es, event_type, event_id) and same-second
  // views collapse by min next-purchase on BOTH engines.
  // ---------------------------------------------------------------
  private val CepWindowS = 86400L

  private def cepPattern(s: SparkSession, dir: String): DataFrame = {
    val ev = withEs(s, dir).select(col("user_id"), col("event_type"), col("es"), col("event_id"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("es"), col("event_type"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    val vw = ev
      .withColumn("nxt_purch_es",
        min(when(col("event_type") === "purchase", col("es"))).over(w))
      .filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("es").as("view_es"))
      .agg(min(col("nxt_purch_es")).as("nxt_purch_es"))
    val sg = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("es").as("signup_es"))
    val firstView = sg.join(vw, Seq("user_id"))
      .filter(col("view_es") > col("signup_es") &&
        col("view_es") <= col("signup_es") + CepWindowS)
      .groupBy("user_id", "signup_es")
      .agg(min(col("view_es")).as("view_es"))
    firstView.join(vw, Seq("user_id", "view_es"))
      .filter(col("nxt_purch_es").isNotNull &&
        col("nxt_purch_es") <= col("view_es") + CepWindowS)
      .select(col("user_id"), col("signup_es"), col("view_es"),
        col("nxt_purch_es").as("purchase_es"))
      .orderBy("user_id", "signup_es")
  }

  private val cepPatternSql =
    s"""WITH ev AS (SELECT user_id, event_type, epoch_ns(ts)//1000000000 AS es, event_id FROM events),
      |vw0 AS (
      |  SELECT user_id, es, event_type,
      |    min(CASE WHEN event_type = 'purchase' THEN es END)
      |      OVER (PARTITION BY user_id ORDER BY es, event_type, event_id
      |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nxt_purch_es
      |  FROM ev),
      |vw AS (
      |  SELECT user_id, es AS view_es, min(nxt_purch_es) AS nxt_purch_es
      |  FROM vw0 WHERE event_type = 'view' GROUP BY 1, 2),
      |sg AS (SELECT user_id, es AS signup_es FROM ev WHERE event_type = 'signup'),
      |first_view AS (
      |  SELECT sg.user_id, sg.signup_es, min(vw.view_es) AS view_es
      |  FROM sg JOIN vw ON sg.user_id = vw.user_id
      |    AND vw.view_es > sg.signup_es AND vw.view_es <= sg.signup_es + $CepWindowS
      |  GROUP BY 1, 2)
      |SELECT f.user_id, f.signup_es, f.view_es, vw.nxt_purch_es AS purchase_es
      |FROM first_view f
      |JOIN vw ON f.user_id = vw.user_id AND f.view_es = vw.view_es
      |WHERE vw.nxt_purch_es IS NOT NULL AND vw.nxt_purch_es <= f.view_es + $CepWindowS
      |ORDER BY f.user_id, f.signup_es""".stripMargin

  // ---------------------------------------------------------------
  // ev_cep_negation — the ABSENCE half of CEP pattern matching
  // (MATCH_RECOGNIZE's NOT / Flink CEP's notFollowedBy): signups
  // with NO purchase inside the following 24 h — churn-risk
  // detection, the alert stream every activation funnel runs. Same
  // scale shape as ev_cep_pattern: ONE partitioned window precomputes
  // each event's next-purchase time, so "absence" is a filter on the
  // precomputed column (NULL or beyond the window) — never a
  // signups × purchases anti-join whose hot-user key explodes, and
  // the never-purchased case costs nothing extra. The nullable
  // next-purchase epoch is surfaced as −1 (both engines) so the
  // output stays NULL-free for the hash gate.
  // ---------------------------------------------------------------
  private def cepNegation(s: SparkSession, dir: String): DataFrame = {
    val ev = withEs(s, dir).select(col("user_id"), col("event_type"), col("es"), col("event_id"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("es"), col("event_type"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    ev.withColumn("nxt_purch_es",
        min(when(col("event_type") === "purchase", col("es"))).over(w))
      .filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("es").as("signup_es"))
      .agg(min(col("nxt_purch_es")).as("nxt_purch_es"))
      .filter(col("nxt_purch_es").isNull ||
        col("nxt_purch_es") > col("signup_es") + CepWindowS)
      .select(col("user_id"), col("signup_es"),
        coalesce(col("nxt_purch_es"), lit(-1L)).as("next_purchase_es"))
      .orderBy("user_id", "signup_es")
  }

  private val cepNegationSql =
    s"""WITH ev AS (SELECT user_id, event_type, epoch_ns(ts)//1000000000 AS es, event_id FROM events),
      |n0 AS (
      |  SELECT user_id, es, event_type,
      |    min(CASE WHEN event_type = 'purchase' THEN es END)
      |      OVER (PARTITION BY user_id ORDER BY es, event_type, event_id
      |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nxt_purch_es
      |  FROM ev),
      |sg AS (
      |  SELECT user_id, es AS signup_es, min(nxt_purch_es) AS nxt_purch_es
      |  FROM n0 WHERE event_type = 'signup' GROUP BY 1, 2)
      |SELECT user_id, signup_es,
      |  coalesce(nxt_purch_es, -1) AS next_purchase_es
      |FROM sg
      |WHERE nxt_purch_es IS NULL OR nxt_purch_es > signup_es + $CepWindowS
      |ORDER BY user_id, signup_es""".stripMargin

  // ---------------------------------------------------------------
  // ev_multitouch — linear multi-touch attribution: every purchase's
  // value splits EQUALLY across the same user's views in the
  // trailing 24 h (the marketing-analytics workload between
  // first-touch funnel and last-touch attribution). The touch count
  // comes from ONE event-time RANGE frame (RANGE BETWEEN 86400
  // PRECEDING AND 1 PRECEDING over integer epoch seconds, partition
  // by user) — never a purchases × views interval join whose hot
  // users explode. Credit is exact integer cents: value DIV n per
  // touch with the remainder carried explicitly, so
  // n_touches·credit + remainder ≡ cents reconstructs bit-for-bit
  // on both engines (the spec locks the identity).
  // ---------------------------------------------------------------
  private def multitouch(s: SparkSession, dir: String): DataFrame = {
    val ev = withEs(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("es"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
    val w = Window.partitionBy("user_id").orderBy("es").rangeBetween(-86400L, -1L)
    ev.withColumn("n_touches",
        coalesce(sum(when(col("event_type") === "view", 1L).otherwise(0L)).over(w), lit(0L)))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("es").as("purchase_es"), col("n_touches"), col("cents"),
        when(col("n_touches") > 0, expr("cents DIV n_touches")).otherwise(lit(0L))
          .as("credit_cents"),
        when(col("n_touches") > 0, col("cents") % col("n_touches")).otherwise(col("cents"))
          .as("remainder_cents"))
      .orderBy("user_id", "purchase_id")
  }

  private val multitouchSql =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, epoch_ns(ts)//1000000000 AS es,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |t AS (
      |  SELECT *,
      |    coalesce(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY es
      |            RANGE BETWEEN 86400 PRECEDING AND 1 PRECEDING), 0) AS n_touches
      |  FROM ev)
      |SELECT user_id, event_id AS purchase_id, es AS purchase_es,
      |  CAST(n_touches AS BIGINT) AS n_touches, cents,
      |  CAST(CASE WHEN n_touches > 0 THEN cents // n_touches ELSE 0 END AS BIGINT) AS credit_cents,
      |  CAST(CASE WHEN n_touches > 0 THEN cents % n_touches ELSE cents END AS BIGINT) AS remainder_cents
      |FROM t WHERE event_type = 'purchase'
      |ORDER BY user_id, purchase_id""".stripMargin

  // ---------------------------------------------------------------
  // ev_rfm — RFM quintile segmentation (recency / frequency /
  // monetary), the standard behavioral-scoring workload: per-user
  // aggregates in one map-side-combined pass, then THREE ntile(5)
  // bands over the per-user relation. The ntile windows are
  // unpartitioned but sit above the per-user Aggregate (PlanGuard's
  // rule — |users| rows, never the event corpus), and every ORDER BY
  // carries user_id as the tiebreak so bucket assignment is a total
  // order both engines reproduce exactly. Monetary is exact integer
  // cents over purchases only; rfm_code = 100r + 10f + m is the
  // segment key downstream campaign tooling filters on.
  // ---------------------------------------------------------------
  private def rfm(s: SparkSession, dir: String): DataFrame = {
    val per = withEs(s, dir)
      .groupBy("user_id")
      .agg(max(col("es")).as("last_es"),
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase",
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .otherwise(0L)).as("monetary_cents"))
    per
      .withColumn("r", ntile(5).over(Window.orderBy(col("last_es"), col("user_id")))
        .cast("bigint"))
      .withColumn("f", ntile(5).over(Window.orderBy(col("n_events"), col("user_id")))
        .cast("bigint"))
      .withColumn("m", ntile(5).over(Window.orderBy(col("monetary_cents"), col("user_id")))
        .cast("bigint"))
      .withColumn("rfm_code", col("r") * 100 + col("f") * 10 + col("m"))
      .orderBy("user_id")
  }

  private val rfmSql =
    """WITH e AS (SELECT user_id, event_type, epoch_ns(ts)//1000000000 AS es,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM events),
      |per AS (SELECT user_id, max(es) AS last_es, count(*) AS n_events,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END) AS BIGINT) AS monetary_cents
      |  FROM e GROUP BY 1),
      |sc AS (SELECT *,
      |    CAST(ntile(5) OVER (ORDER BY last_es, user_id) AS BIGINT) AS r,
      |    CAST(ntile(5) OVER (ORDER BY n_events, user_id) AS BIGINT) AS f,
      |    CAST(ntile(5) OVER (ORDER BY monetary_cents, user_id) AS BIGINT) AS m
      |  FROM per)
      |SELECT user_id, last_es, n_events, monetary_cents, r, f, m,
      |  r*100 + f*10 + m AS rfm_code
      |FROM sc
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------
  // ev_dau_wau — DAU / trailing-7-day WAU / stickiness (the product-
  // analytics daily health metric). Exact windowed DISTINCT counts
  // without a distinct-over-window (which Spark refuses) and without
  // a days×users self-join: dedup to (user, active-day) pairs once,
  // then EXPLODE each pair onto the 7 trailing cover days it makes
  // the user "weekly active" for — a bounded ×7 fan-out of the
  // already-deduped pair set, followed by one distinct + count per
  // cover day. Stickiness = DAU·10⁶ DIV WAU in exact ppm. Scale
  // shape: every step is keyed dedup/agg on (user, day) — map-side
  // combined, linear, skew-free (day cardinality is bounded, user
  // spread is the corpus's own).
  // ---------------------------------------------------------------
  private def dauWau(s: SparkSession, dir: String): DataFrame = {
    val ud = withEs(s, dir)
      .select(col("user_id"), expr("es DIV 86400").as("day")).distinct()
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"), explode(expr("sequence(day, day + 6)")).as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        expr("dau * CAST(1000000 AS BIGINT) DIV wau").as("stickiness_ppm"))
      .orderBy("day")
  }

  private val dauWauSql =
    """WITH ud AS (SELECT DISTINCT user_id, (epoch_ns(ts)//1000000000) // 86400 AS day FROM events),
      |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
      |cov AS (SELECT DISTINCT user_id, day FROM (
      |          SELECT user_id, CAST(unnest(range(day, day + 7)) AS BIGINT) AS day FROM ud) z),
      |wau AS (SELECT day, count(*) AS wau FROM cov GROUP BY 1)
      |SELECT dau.day, dau.dau, wau.wau,
      |  dau.dau * CAST(1000000 AS BIGINT) // wau.wau AS stickiness_ppm
      |FROM dau JOIN wau ON dau.day = wau.day
      |ORDER BY dau.day""".stripMargin

  // ---------------------------------------------------------------
  // ev_power_users — activity-concentration (Pareto) profile: users
  // ranked into activity deciles (ntile(10) over the per-user
  // aggregate, count-desc with user_id tiebreak), each decile's
  // exact event share in ppm against the 1-row corpus total
  // (broadcast scalar, the q11 pattern). Answers "do 10% of users
  // generate 80% of events" engine-exactly; the cumulative column
  // makes the crossing point readable. Unpartitioned windows sit
  // above the |users|-row Aggregate per PlanGuard's rule.
  // ---------------------------------------------------------------
  private def powerUsers(s: SparkSession, dir: String): DataFrame = {
    val per = withEs(s, dir).groupBy("user_id").agg(count(lit(1)).as("n"))
    val dec = per.withColumn("decile",
      ntile(10).over(Window.orderBy(col("n").desc, col("user_id"))).cast("bigint"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_events"))
    val total = dec.agg(sum(col("n_events")).as("total_events"))
    dec.crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("n_events * CAST(1000000 AS BIGINT) DIV total_events"))
      .withColumn("cum_events", sum(col("n_events")).over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("decile"), col("n_users"), col("n_events"), col("share_ppm"),
        expr("cum_events * CAST(1000000 AS BIGINT) DIV total_events").as("cum_share_ppm"))
      .orderBy("decile")
  }

  private val powerUsersSql =
    """WITH per AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
      |d AS (SELECT CAST(ntile(10) OVER (ORDER BY n DESC, user_id) AS BIGINT) AS decile, n FROM per),
      |g AS (SELECT decile, count(*) AS n_users, CAST(sum(n) AS BIGINT) AS n_events FROM d GROUP BY 1),
      |t AS (SELECT CAST(sum(n_events) AS BIGINT) AS total_events FROM g),
      |cu AS (SELECT g.*, t.total_events,
      |         CAST(sum(g.n_events) OVER (ORDER BY g.decile
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_events
      |       FROM g, t)
      |SELECT decile, n_users, n_events,
      |  n_events * CAST(1000000 AS BIGINT) // total_events AS share_ppm,
      |  cum_events * CAST(1000000 AS BIGINT) // total_events AS cum_share_ppm
      |FROM cu
      |ORDER BY decile""".stripMargin

  // ---------------------------------------------------------------
  // ev_anomaly_mad — robust anomaly days via MEDIAN absolute
  // deviation (the robust companion to ev_anomaly_days' 2σ z-score:
  // a mean/σ gate is itself dragged by the outliers it hunts; the
  // MAD breakdown point is 50%). Entirely in scaled integers so the
  // hash gate holds: med2 = c_lo + c_hi over the count-ranked days
  // (= 2·median, no halving), dev2 = |2c − med2| (= 2·|c − median|),
  // mad4 = dev2_lo + dev2_hi over the dev2-ranked days (= 4·MAD),
  // anomaly iff 2·dev2 > 3·mad4 ⇔ |c − med| > 3·MAD — cross-
  // multiplied, division-free. Ranking windows are unpartitioned but
  // run over the |days|-row aggregate (PlanGuard's rule); both
  // medians broadcast as 1-row scalars.
  // ---------------------------------------------------------------
  private def anomalyMad(s: SparkSession, dir: String): DataFrame = {
    // day-grain and four-consumer (both median passes + both
    // deviation joins) — truncate so the fact aggregates once, not 4×
    val daily = withEs(s, dir)
      .groupBy(expr("es DIV 86400").as("day"))
      .agg(count(lit(1)).as("n_events"))
      .localCheckpoint()
    def med2Of(df: DataFrame, valueCol: String): DataFrame = {
      val w = Window.orderBy(col(valueCol), col("day"))
      df.withColumn("rn", row_number().over(w).cast("bigint"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy()))
        .agg((sum(when(col("rn") === expr("(n + 1) DIV 2"), col(valueCol)).otherwise(0L))
          + sum(when(col("rn") === expr("n DIV 2 + 1"), col(valueCol)).otherwise(0L)))
          .as(s"m_$valueCol"))
    }
    val med2 = med2Of(daily, "n_events")
    val dev = daily.crossJoin(broadcast(med2))
      .withColumn("dev2", abs(lit(2) * col("n_events") - col("m_n_events")))
    val mad4 = med2Of(dev.select(col("day"), col("dev2")), "dev2")
    dev.crossJoin(broadcast(mad4))
      .select(col("day"), col("n_events"), col("m_n_events").as("med2"),
        col("dev2"), col("m_dev2").as("mad4"),
        when(lit(2) * col("dev2") > lit(3) * col("m_dev2"), 1L).otherwise(0L)
          .as("is_anomaly"))
      .orderBy("day")
  }

  private val anomalyMadSql =
    """WITH daily AS (SELECT (epoch_ns(ts)//1000000000) // 86400 AS day, count(*) AS n_events
      |              FROM events GROUP BY 1),
      |r1 AS (SELECT *, CAST(row_number() OVER (ORDER BY n_events, day) AS BIGINT) AS rn,
      |         CAST(count(*) OVER () AS BIGINT) AS n FROM daily),
      |m1 AS (SELECT CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN n_events ELSE 0 END)
      |         + sum(CASE WHEN rn = n // 2 + 1 THEN n_events ELSE 0 END) AS BIGINT) AS med2 FROM r1),
      |dv AS (SELECT d.day, d.n_events, m1.med2, abs(2 * d.n_events - m1.med2) AS dev2
      |       FROM daily d, m1),
      |r2 AS (SELECT *, CAST(row_number() OVER (ORDER BY dev2, day) AS BIGINT) AS rn,
      |         CAST(count(*) OVER () AS BIGINT) AS n FROM dv),
      |m2 AS (SELECT CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN dev2 ELSE 0 END)
      |         + sum(CASE WHEN rn = n // 2 + 1 THEN dev2 ELSE 0 END) AS BIGINT) AS mad4 FROM r2)
      |SELECT dv.day, dv.n_events, dv.med2, dv.dev2, m2.mad4,
      |  CAST(CASE WHEN 2 * dv.dev2 > 3 * m2.mad4 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
      |FROM dv, m2
      |ORDER BY dv.day""".stripMargin

  // ---------------------------------------------------------------
  // ev_cohort_ltv — the cohort-LTV TRIANGLE (signup-week cohort ×
  // weeks-since-signup → revenue), the companion to ev_retention
  // (which counts users; this sums value): per cohort row, the
  // cumulative exact-cents purchase revenue at each week offset —
  // what a growth team reads LTV curves off. Plan shape: first-event
  // week per user (one map-side-combined agg), broadcast back onto
  // the purchase stream (skinny |users|-row build side), one
  // (cohort, offset) aggregate, then a cumulative RANGE window
  // PARTITIONED by cohort over the tiny triangle relation.
  // ---------------------------------------------------------------
  private def cohortLtv(s: SparkSession, dir: String): DataFrame = {
    val ev = withEs(s, dir)
    val cohorts = ev.groupBy("user_id")
      .agg(expr("min(es) DIV 604800").as("cohort_week"))
    val cells = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("es DIV 604800").as("wk"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .join(broadcast(cohorts), "user_id")
      .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("revenue_cents"))
    val cum = Window.partitionBy("cohort_week").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_revenue_cents", sum(col("revenue_cents")).over(cum))
      .orderBy("cohort_week", "week_offset")
  }

  private val cohortLtvSql =
    """WITH e AS (SELECT user_id, event_type, epoch_ns(ts)//1000000000 AS es,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM events),
      |c AS (SELECT user_id, min(es) // 604800 AS cohort_week FROM e GROUP BY 1),
      |cells AS (
      |  SELECT c.cohort_week, e.es // 604800 - c.cohort_week AS week_offset,
      |    count(*) AS n_purchases, CAST(sum(e.cents) AS BIGINT) AS revenue_cents
      |  FROM e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase'
      |  GROUP BY 1, 2)
      |SELECT cohort_week, week_offset, n_purchases, revenue_cents,
      |  CAST(sum(revenue_cents) OVER (PARTITION BY cohort_week ORDER BY week_offset
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_revenue_cents
      |FROM cells
      |ORDER BY cohort_week, week_offset""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("ev_cohort_ltv", cohortLtv, Some(cohortLtvSql)),
    Op("ev_anomaly_mad", anomalyMad, Some(anomalyMadSql)),
    Op("ev_power_users", powerUsers, Some(powerUsersSql)),
    Op("ev_dau_wau", dauWau, Some(dauWauSql)),
    Op("ev_rfm", rfm, Some(rfmSql)),
    Op("ev_multitouch", multitouch, Some(multitouchSql)),
    Op("ev_quantile_sketch", quantileSketch, Some(quantileSketchSql)),
    Op("ev_cep_pattern", cepPattern, Some(cepPatternSql)),
    Op("ev_cep_negation", cepNegation, Some(cepNegationSql)),
    Op("ev_hll_distinct", hllDistinct, Some(hllDistinctSql)),
    Op("ev_gap_fill", gapFill, Some(gapFillSql)),
    Op("ev_anomaly_days", anomalyDays, Some(anomalyDaysSql)),
    Op("ev_top_paths", topPaths, Some(topPathsSql)),
    Op("ev_tumbling", tumbling, Some(tumblingSql)),
    Op("ev_funnel", funnel, Some(funnelSql)),
    Op("ev_sessionize", sessionize, Some(sessionizeSql)),
    Op("ev_json_props", jsonProps, Some(jsonPropsSql)),
    Op("ev_asof_join", asofJoin, Some(asofJoinSql)),
    Op("ev_sliding", sliding, Some(slidingSql)),
    Op("ev_retention", retention, Some(retentionSql)))
}
