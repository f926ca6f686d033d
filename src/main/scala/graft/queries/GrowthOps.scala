package graft.queries

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Growth-analytics pack: ABC/Pareto revenue classification of the
  * part catalog, the new-vs-repeat revenue split (the acquisition/
  * retention read of the order book), and a per-user behavioral-
  * entropy profile of the event stream.
  */
object GrowthOps {

  // ---------------------------------------------------------------
  // q_abc_pareto — ABC inventory classification (the 80/15/5 Pareto
  // cut): parts ranked by lifetime revenue; class A while the
  // cumulative share (including the current part) stays ≤ 80%, B to
  // ≤ 95%, C beyond — boundaries compared by exact cross-
  // multiplication (cum·100 ≤ 80·total), never a float share. Output
  // is the 3-row class summary: part count, revenue cents, exact ppm
  // share of revenue.
  //
  // Plan shape: one fact-sized map-side-combined groupBy to per-part
  // revenue, then a GLOBAL cumsum window over the PART-DIMENSION-
  // sized aggregate (the q_skyline justification: the window input is
  // bounded by |parts|, not facts). At an extreme catalog (10⁹+
  // parts) the documented swap-in is the q_percentiles_hist two-phase
  // trick: revenue-band histogram → band-level cumulative → only the
  // A/B boundary bands re-scanned.
  // ---------------------------------------------------------------
  private def abcPareto(s: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.load(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .as("rev"))
    // catalog total as an unpartitioned window over the part-grain
    // aggregate (same bounded-input justification as the cumsum
    // window) — two 1-row-aggregate joins would rescan lineitem twice
    perPart
      .withColumn("cum", sum(expr("CAST(rev AS DECIMAL(38,0))"))
        .over(Window.orderBy(col("rev").desc, col("l_partkey"))))
      .withColumn("t", sum(expr("CAST(rev AS DECIMAL(38,0))"))
        .over(Window.partitionBy()))
      .withColumn("abc_class",
        expr("CASE WHEN cum * 100 <= t * 80 THEN 'A' " +
          "WHEN cum * 100 <= t * 95 THEN 'B' ELSE 'C' END"))
      .groupBy("abc_class")
      .agg(count(lit(1)).as("n_parts"),
        sum(expr("CAST(rev AS DECIMAL(38,0))")).as("class_rev"),
        max(col("t")).as("t")) // t is constant; max is a deterministic carry
      .select(col("abc_class"), col("n_parts"),
        expr("CAST(class_rev AS BIGINT)").as("revenue_cents"),
        expr("CAST(class_rev * 1000000 DIV t AS BIGINT)").as("share_ppm"))
      .orderBy("abc_class")
  }

  private val abcParetoSql =
    """WITH pp AS (
      |  SELECT l_partkey,
      |         sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT))
      |           AS rev
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT sum(rev) AS t FROM pp),
      |c AS (
      |  SELECT rev,
      |         sum(rev) OVER (ORDER BY rev DESC, l_partkey) AS cum, t
      |  FROM pp CROSS JOIN tot),
      |cl AS (
      |  SELECT rev,
      |         CASE WHEN cum * 100 <= t * 80 THEN 'A'
      |              WHEN cum * 100 <= t * 95 THEN 'B' ELSE 'C' END AS abc_class
      |  FROM c),
      |cls AS (
      |  SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
      |         sum(rev) AS class_rev
      |  FROM cl GROUP BY 1)
      |SELECT abc_class, n_parts,
      |       CAST(class_rev AS BIGINT) AS revenue_cents,
      |       CAST(class_rev * 1000000 // t AS BIGINT) AS share_ppm
      |FROM cls CROSS JOIN tot
      |ORDER BY abc_class""".stripMargin

  // ---------------------------------------------------------------
  // q_new_vs_repeat — monthly revenue split by customer tenure (the
  // acquisition-vs-retention read every growth report leads with):
  // an order is NEW when it is its customer's first-ever order
  // (rank 1 on (orderdate, orderkey) — the orderkey tiebreak makes
  // same-day first orders deterministic), REPEAT otherwise; per
  // order month the counts, exact cents, and the new-revenue ppm
  // share.
  //
  // Plan shape: one customer-keyed window (streams per customer) on
  // the ORDER table — no fact join at all — then a month-grain
  // aggregate. Two shuffles, both on natural keys.
  // ---------------------------------------------------------------
  private def newVsRepeat(s: SparkSession, dir: String): DataFrame = {
    val ranked = Tables.load(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("d"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cents"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")))
    ranked
      .groupBy(date_format(col("d"), "yyyy-MM").as("month"))
      .agg(
        sum(when(col("rk") === 1, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("rk") > 1, 1L).otherwise(0L)).as("n_repeat"),
        sum(when(col("rk") === 1, col("cents")).otherwise(0L)).as("new_cents"),
        sum(when(col("rk") > 1, col("cents")).otherwise(0L)).as("repeat_cents"))
      .select(col("month"), col("n_new"), col("n_repeat"),
        col("new_cents"), col("repeat_cents"),
        expr("""CAST(CAST(new_cents AS DECIMAL(38,0)) * 1000000
               |  DIV greatest(new_cents + repeat_cents, 1) AS BIGINT)""".stripMargin)
          .as("new_share_ppm"))
      .orderBy("month")
  }

  private val newVsRepeatSql =
    """WITH r AS (
      |  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
      |         CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
      |           AS rk
      |  FROM orders)
      |SELECT month,
      |       CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |       CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat,
      |       CAST(sum(CASE WHEN rk = 1 THEN cents ELSE 0 END) AS BIGINT) AS new_cents,
      |       CAST(sum(CASE WHEN rk > 1 THEN cents ELSE 0 END) AS BIGINT) AS repeat_cents,
      |       CAST(sum(CASE WHEN rk = 1 THEN cents ELSE 0 END) * 1000000
      |            // greatest(sum(cents), 1) AS BIGINT) AS new_share_ppm
      |FROM r
      |GROUP BY month
      |ORDER BY month""".stripMargin

  // ---------------------------------------------------------------
  // ev_entropy_profile — behavioral-diversity histogram of the user
  // base: per user the whole-bit entropy of their event-type mix,
  //   H_milli = Σ_t n_t · (bitlen(n) − bitlen(n_t)) · 1000 DIV n
  // — the txt_surprisal bitlen idiom (length(bin(x)) both engines),
  // zero runtime transcendentals, so the per-user statistic is
  // engine-exact. A one-trick user scores 0; a user spread evenly
  // over 2^k types scores ≈ k·1000. Users are then banded into
  // half-bit buckets: per band the user count and the exact ppm
  // share of the user base — the shape monitoring dashboards track
  // (a drift toward band 0 = an influx of single-action accounts,
  // the classic spam signature; complements ev_bot_detect's rate
  // signals with a MIX signal).
  //
  // Plan shape: one (user, type) map-side-combined aggregate, a
  // user-keyed rollup (a second keyed shuffle over the users×types
  // relation, |types|× smaller than the fact), then a ≤ ~30-row band
  // aggregate. The corpus total comes from an UNPARTITIONED WINDOW
  // over the band relation — legal because the window input is the
  // bounded aggregate (PlanGuardSpec's rule), and it keeps the plan
  // ONE pipeline: a 1-row-aggregate-and-rejoin would duplicate the
  // whole fact subtree when exchange reuse fails on computed
  // grouping expressions. The event fact is scanned exactly once.
  // ---------------------------------------------------------------
  private def entropyProfile(s: SparkSession, dir: String): DataFrame = {
    val ut = Tables.load(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("nt"))
    val perUser = ut.groupBy("user_id")
      .agg(sum("nt").as("n"),
        // Σ n_t·bitlen(n_t) — combined with n·bitlen(n) below
        sum(expr("nt * length(bin(nt))")).as("sbits"))
      .select(col("user_id"),
        expr("CAST((n * length(bin(n)) - sbits) * 1000 DIV n AS BIGINT)")
          .as("h_milli"))
    perUser
      .groupBy(expr("h_milli DIV 500").as("band"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("t", sum(col("n_users")).over(Window.partitionBy()))
      .select(col("band"), (col("band") * 500).as("band_lo_milli"), col("n_users"),
        expr("CAST(CAST(n_users AS DECIMAL(38,0)) * 1000000 DIV t AS BIGINT)")
          .as("user_share_ppm"))
      .orderBy("band")
  }

  private val entropyProfileSql =
    """WITH ut AS (
      |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS nt
      |  FROM events GROUP BY 1, 2),
      |pu AS (
      |  SELECT user_id,
      |         CAST((CAST(sum(nt) AS BIGINT)
      |                 * length(bin(CAST(sum(nt) AS BIGINT)))
      |               - CAST(sum(nt * length(bin(nt))) AS BIGINT))
      |              * 1000 // CAST(sum(nt) AS BIGINT) AS BIGINT) AS h_milli
      |  FROM ut GROUP BY 1),
      |bands AS (
      |  SELECT h_milli // 500 AS band, CAST(count(*) AS BIGINT) AS n_users
      |  FROM pu GROUP BY 1)
      |SELECT band, band * 500 AS band_lo_milli, n_users,
      |       CAST(n_users * 1000000 // sum(n_users) OVER () AS BIGINT)
      |         AS user_share_ppm
      |FROM bands
      |ORDER BY band""".stripMargin

  // ---------------------------------------------------------------
  // ev_segment_migration — period-over-period SEGMENT MIGRATION
  // matrix (the growth-accounting view at segment grain: growth teams
  // read "how many heavies became light" — ev_growth_accounting
  // tracks the new/retained/churned user COUNTS, this tracks the
  // intensity TRANSITIONS). The corpus splits at its midpoint day
  // (derived identically in both engines from min/max day); each
  // user's per-half PURCHASE-day count buckets into none/light/
  // regular/heavy (0 / 1-3 / 4-6 / ≥7 purchase days — purchase days,
  // not any-event days: the gate corpus's users touch the product
  // near-daily, and a bucketing every user saturates gates a 1-row
  // degenerate matrix), and the matrix
  // counts (segment_1 → segment_2) with a row-normalized ppm share
  // (truncating DIV over positives).
  // Plan shape: one distinct over (user, day) — the only fact-sized
  // shuffle — then user-grain aggregates, a user-keyed outer join of
  // the two halves, and a |segments|²-row matrix aggregate with a
  // window over that matrix only. At 100 TB: two map-side-combined
  // passes over the distinct actives; nothing user-quadratic.
  // ---------------------------------------------------------------
  private def segBucket(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c >= 7, "heavy").when(c >= 4, "regular").when(c >= 1, "light").otherwise("none")

  private def segmentMigration(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("u"), expr("ts DIV 1000000000 DIV 86400").as("d"))
      .distinct()
    val mid = ud.agg(expr("CAST((min(d) + max(d) + 1) DIV 2 AS BIGINT)")).head().getLong(0)
    val h1 = ud.filter(col("d") < mid).groupBy("u").agg(count(lit(1)).as("n1"))
    val h2 = ud.filter(col("d") >= mid).groupBy("u").agg(count(lit(1)).as("n2"))
    val w = Window.partitionBy("segment_1")
    h1.join(h2, Seq("u"), "full_outer")
      .select(segBucket(coalesce(col("n1"), lit(0L))).as("segment_1"),
        segBucket(coalesce(col("n2"), lit(0L))).as("segment_2"))
      .groupBy("segment_1", "segment_2").agg(count(lit(1)).as("n_users"))
      .withColumn("share_of_seg1_ppm",
        expr("CAST(n_users * 1000000 DIV sum(n_users) OVER (PARTITION BY segment_1) AS BIGINT)"))
      .orderBy("segment_1", "segment_2")
  }

  private val segmentMigrationSql =
    """WITH ud AS (SELECT DISTINCT user_id AS u,
      |    (epoch_ns(ts) // 1000000000) // 86400 AS d FROM events
      |  WHERE event_type = 'purchase'),
      |mid AS (SELECT CAST((min(d) + max(d) + 1) // 2 AS BIGINT) AS m FROM ud),
      |h1 AS (SELECT u, count(*) AS n1 FROM ud WHERE d < (SELECT m FROM mid) GROUP BY u),
      |h2 AS (SELECT u, count(*) AS n2 FROM ud WHERE d >= (SELECT m FROM mid) GROUP BY u),
      |j AS (SELECT coalesce(h1.n1, 0) AS n1, coalesce(h2.n2, 0) AS n2
      |      FROM h1 FULL OUTER JOIN h2 ON h1.u = h2.u),
      |segs AS (SELECT
      |    CASE WHEN n1 >= 7 THEN 'heavy' WHEN n1 >= 4 THEN 'regular'
      |         WHEN n1 >= 1 THEN 'light' ELSE 'none' END AS segment_1,
      |    CASE WHEN n2 >= 7 THEN 'heavy' WHEN n2 >= 4 THEN 'regular'
      |         WHEN n2 >= 1 THEN 'light' ELSE 'none' END AS segment_2
      |  FROM j),
      |m AS (SELECT segment_1, segment_2, count(*) AS n_users FROM segs GROUP BY 1, 2)
      |SELECT segment_1, segment_2, n_users,
      |  CAST(n_users * 1000000 // sum(n_users) OVER (PARTITION BY segment_1) AS BIGINT)
      |    AS share_of_seg1_ppm
      |FROM m
      |ORDER BY segment_1, segment_2""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("q_abc_pareto", abcPareto, Some(abcParetoSql)),
    Op("q_new_vs_repeat", newVsRepeat, Some(newVsRepeatSql)),
    Op("ev_segment_migration", segmentMigration, Some(segmentMigrationSql)),
    Op("ev_entropy_profile", entropyProfile, Some(entropyProfileSql)))
}
