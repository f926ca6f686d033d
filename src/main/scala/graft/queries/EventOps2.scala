package graft.queries

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second events pack — lifecycle and interval algebra the first
  * pack's windows/cohorts don't exercise.
  */
object EventOps2 {

  private def withEs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).withColumn("es", expr("ts DIV 1000000000"))

  // ---------------------------------------------------------------
  // ev_growth_accounting — weekly growth accounting (the
  // new / retained / resurrected / churned decomposition every
  // product-analytics stack reports): for each epoch week,
  //   new          = first-ever-active users,
  //   retained     = active this week AND last week,
  //   resurrected  = active this week, previously active, but NOT
  //                  last week,
  //   churned      = active last week, not this week
  //                  (= n_active(w-1) − n_retained(w)).
  // Distinct from ev_retention (cohort triangle: one row per
  // cohort×offset) and ev_dau_wau (rolling stickiness): this is the
  // per-period flow decomposition, and it carries its own
  // conservation law — n_active = new + retained + resurrected —
  // which GrowthConcurrencySpec locks.
  //
  // Plan shape: one distinct over (user, week) — the only fact-sized
  // shuffle, keyed on user_id; the lag window partitions BY USER
  // (never global); the per-week flow aggregate is |weeks|-sized, so
  // the churn self-join on week-1 joins two tiny relations. At
  // 100 TB: fact scan → user-partitioned distinct+window →
  // |weeks|-row algebra. Nothing else.
  // ---------------------------------------------------------------
  private def growthAccounting(s: SparkSession, dir: String): DataFrame = {
    val uw = withEs(s, dir)
      .select(col("user_id"), expr("es DIV 604800").as("wk"))
      .distinct()
    val byUser = Window.partitionBy("user_id").orderBy("wk")
    val flagged = uw
      .withColumn("prev_wk", lag(col("wk"), 1).over(byUser))
      .withColumn("state",
        when(col("prev_wk").isNull, lit("new"))
          .when(col("prev_wk") === col("wk") - 1, lit("retained"))
          .otherwise(lit("resurrected")))
    val flows = flagged.groupBy("wk").agg(
      count(lit(1)).as("n_active"),
      sum(when(col("state") === "new", 1L).otherwise(0L)).as("n_new"),
      sum(when(col("state") === "retained", 1L).otherwise(0L)).as("n_retained"),
      sum(when(col("state") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"))
    val prev = flows.select(col("wk") + 1 as "wk", col("n_active").as("prev_active"))
    flows.join(prev, Seq("wk"), "left")
      .select(col("wk"), col("n_active"), col("n_new"), col("n_retained"),
        col("n_resurrected"),
        coalesce(col("prev_active") - col("n_retained"), lit(0L)).as("n_churned"))
      .orderBy("wk")
  }

  private val growthAccountingSql =
    """WITH uw AS (SELECT DISTINCT user_id, (epoch_ns(ts)//1000000000) // 604800 AS wk FROM events),
      |f AS (SELECT wk, lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk FROM uw),
      |flows AS (SELECT wk, count(*) AS n_active,
      |    CAST(sum(CASE WHEN prev_wk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |    CAST(sum(CASE WHEN prev_wk = wk - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
      |    CAST(sum(CASE WHEN prev_wk IS NOT NULL AND prev_wk < wk - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
      |  FROM f GROUP BY wk)
      |SELECT c.wk, c.n_active, c.n_new, c.n_retained, c.n_resurrected,
      |  CAST(coalesce(p.n_active - c.n_retained, 0) AS BIGINT) AS n_churned
      |FROM flows c LEFT JOIN flows p ON p.wk = c.wk - 1
      |ORDER BY c.wk""".stripMargin

  // ---------------------------------------------------------------
  // ev_concurrency — per-day peak concurrent sessions (the
  // interval-overlap sweep behind capacity planning and license
  // audits): sessions are the same 30-min-gap intervals
  // ev_sessionize gates; the peak is the classic boundary sweep —
  // +1 at each session start, −1 AFTER each inclusive end, running
  // sum, max.
  //
  // Scale shape: a global sweep would be one unpartitioned window
  // over 2·|sessions| rows. Instead each session is clipped to the
  // days it covers (session span is gap-bounded — the cover explode
  // is the same bounded trick ev_dau_wau uses), and the sweep runs
  // PER DAY: windows partition by day, so no task ever sees more
  // than a day's boundaries. Peak is order-stable under ties because
  // +1 boundaries sort before −1 at the same instant (delta DESC):
  // within a tie group the running sum is monotone, so the max over
  // the group does not depend on intra-group order — which is what
  // makes the hash gate engine-stable.
  //
  // Output: day, n_sessions touching the day, peak concurrency.
  // ---------------------------------------------------------------
  private def concurrency(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("es", "event_id")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = withEs(s, dir)
      .select("user_id", "event_id", "es")
      .withColumn("prev_es", lag(col("es"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_es").isNull || col("es") - col("prev_es") > 1800, lit(1)).otherwise(lit(0)))
      .withColumn("session_no", sum(col("is_new")).over(cum))
      .groupBy("user_id", "session_no")
      .agg(min(col("es")).as("s_start"), max(col("es")).as("s_end"))
    val clipped = sessions
      .withColumn("day", explode(sequence(expr("s_start DIV 86400"), expr("s_end DIV 86400"))))
      .withColumn("c_start", greatest(col("s_start"), col("day") * 86400))
      .withColumn("c_end", least(col("s_end"), col("day") * 86400 + 86399))
    val bounds = clipped.select(col("day"), col("c_start").as("t"), lit(1L).as("delta"))
      .unionAll(clipped.select(col("day"), col("c_end").as("t"), lit(-1L).as("delta")))
    val sweep = Window.partitionBy("day").orderBy(col("t"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounds
      .withColumn("running", sum(col("delta")).over(sweep))
      .groupBy("day")
      .agg(max(col("running")).as("peak_concurrency"),
        (count(lit(1)) / 2).cast("long").as("n_sessions"))
      .orderBy("day")
  }

  private val concurrencySql =
    """WITH e AS (SELECT user_id, event_id, epoch_ns(ts)//1000000000 AS es FROM events),
      |f AS (SELECT *, CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
      |g AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY es, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no FROM f),
      |sess AS (SELECT user_id, session_no, min(es) AS s_start, max(es) AS s_end
      |         FROM g GROUP BY user_id, session_no),
      |clip AS (SELECT day, greatest(s_start, day * 86400) AS c_start,
      |                least(s_end, day * 86400 + 86399) AS c_end
      |         FROM (SELECT *, unnest(range(s_start // 86400, s_end // 86400 + 1)) AS day FROM sess) z),
      |b AS (SELECT day, c_start AS t, CAST(1 AS BIGINT) AS delta FROM clip
      |      UNION ALL SELECT day, c_end, CAST(-1 AS BIGINT) FROM clip),
      |r AS (SELECT day, sum(delta) OVER (PARTITION BY day ORDER BY t, delta DESC
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running FROM b)
      |SELECT day, CAST(max(running) AS BIGINT) AS peak_concurrency,
      |  CAST(count(*) // 2 AS BIGINT) AS n_sessions
      |FROM r GROUP BY day
      |ORDER BY day""".stripMargin

  // ---------------------------------------------------------------
  // ev_forecast_baseline — seasonal-naive forecast audit: predict
  // each (event_type, day)'s event count and cent volume with the
  // value from SEVEN DAYS EARLIER and publish the per-day absolute
  // errors — the baseline every real forecasting deployment must
  // beat (and the drift monitor that pages when today diverges from
  // last week). Forecast joins day = day−7 EXPLICITLY (a lag(7) row
  // window would silently read the 7th-PREVIOUS-OBSERVED day when a
  // type skips days — wrong semantics, and engine-divergent). All
  // arithmetic in BIGINT counts/cents.
  //
  // Plan shape: one fact scan → map-side-combined (day, type)
  // aggregate; the forecast join is |days×types|-sized on both
  // sides. At 100 TB the daily rollup IS the incremental artifact
  // (etl_incremental_agg's contract) and this op joins two tiny
  // relations.
  // ---------------------------------------------------------------
  private def forecastBaseline(s: SparkSession, dir: String): DataFrame = {
    val daily = withEs(s, dir)
      .select(expr("es DIV 86400").as("day_num"), col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .groupBy("day_num", "event_type")
      .agg(count(lit(1)).as("actual_n"), sum("cents").as("actual_cents"))
    val fc = daily.select(col("event_type"), (col("day_num") + 7).as("day_num"),
      col("actual_n").as("forecast_n"), col("actual_cents").as("forecast_cents"))
    daily.join(fc, Seq("event_type", "day_num"))
      .select(col("event_type"), col("day_num"), col("actual_n"), col("forecast_n"),
        abs(col("actual_n") - col("forecast_n")).as("abs_err_n"),
        col("actual_cents"), col("forecast_cents"),
        abs(col("actual_cents") - col("forecast_cents")).as("abs_err_cents"))
      .orderBy("event_type", "day_num")
  }

  private val forecastBaselineSql =
    """WITH daily AS (
      |  SELECT epoch_ns(ts)//1000000000 // 86400 AS day_num, event_type,
      |    count(*) AS actual_n,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS actual_cents
      |  FROM events GROUP BY 1, 2)
      |SELECT a.event_type, a.day_num, a.actual_n,
      |  f.actual_n AS forecast_n, abs(a.actual_n - f.actual_n) AS abs_err_n,
      |  a.actual_cents, f.actual_cents AS forecast_cents,
      |  abs(a.actual_cents - f.actual_cents) AS abs_err_cents
      |FROM daily a JOIN daily f
      |  ON a.event_type = f.event_type AND a.day_num = f.day_num + 7
      |ORDER BY a.event_type, a.day_num""".stripMargin

  // ---------------------------------------------------------------
  // ev_seasonality — hour-of-week activity profile (dow × hour grid,
  // epoch-anchored integer calendar: day 0 = Thursday): per cell the
  // event count, its ppm share of the week grid, and a per-dow peak
  // flag — the seasonal fingerprint capacity planning and
  // anomaly-baseline jobs read (ev_anomaly_* asks "is today
  // strange"; this asks "what does normal look like"). One fact
  // scan → map-side-combined 168-cell aggregate; the peak flag is a
  // window over 24-row dow partitions of the aggregate. All integer
  // (counts, truncating-ppm shares, max-tie → earliest hour).
  // ---------------------------------------------------------------
  private def seasonality(s: SparkSession, dir: String): DataFrame = {
    val cells = withEs(s, dir)
      .select(expr("(es DIV 86400 + 4) % 7").as("dow"),
        expr("(es DIV 3600) % 24").as("hour"))
      .groupBy("dow", "hour").agg(count(lit(1)).as("n_events"))
    val total = Window.partitionBy()
    val wDow = Window.partitionBy("dow")
      .orderBy(col("n_events").desc, col("hour").asc)
    cells
      // integer DIV against the window total: a double `/` + floor can
      // round across the integer boundary where // cannot (the window
      // sits above the 168-row Aggregate — PlanGuard-admissible)
      .withColumn("wk_total", sum("n_events").over(total))
      .withColumn("share_ppm", expr("n_events * CAST(1000000 AS BIGINT) DIV wk_total"))
      .withColumn("is_dow_peak",
        (org.apache.spark.sql.functions.row_number().over(wDow) === 1).cast("int"))
      .select("dow", "hour", "n_events", "share_ppm", "is_dow_peak")
      .orderBy("dow", "hour")
  }

  private val seasonalitySql =
    """WITH cells AS (
      |  SELECT (epoch_ns(ts)//1000000000 // 86400 + 4) % 7 AS dow,
      |         (epoch_ns(ts)//1000000000 // 3600) % 24 AS hour,
      |         count(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |tot AS (SELECT sum(n_events) AS t FROM cells),
      |r AS (SELECT c.*, CAST(c.n_events * 1000000 // tot.t AS BIGINT) AS share_ppm,
      |        row_number() OVER (PARTITION BY c.dow
      |          ORDER BY c.n_events DESC, c.hour) AS rn
      |      FROM cells c CROSS JOIN tot)
      |SELECT dow, hour, n_events, share_ppm,
      |  CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS INT) AS is_dow_peak
      |FROM r
      |ORDER BY dow, hour""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("ev_growth_accounting", growthAccounting, Some(growthAccountingSql)),
    Op("ev_forecast_baseline", forecastBaseline, Some(forecastBaselineSql)),
    Op("ev_seasonality", seasonality, Some(seasonalitySql)),
    Op("ev_concurrency", concurrency, Some(concurrencySql)))
}
