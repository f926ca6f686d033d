package graft.ops

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reconciliation / affinity pack: the subledger-to-header balance
  * audit every finance-grade warehouse runs nightly, the behavioral
  * affinity matrix between event types, and per-language lexical
  * diversity of the document corpus.
  */
object Reconcile {

  // ---------------------------------------------------------------
  // etl_reconciliation — order-header vs line-detail balance audit
  // (the subledger↔GL tie-out): per order the line total
  // Σ extprice·(1+tax)·(1−discount) in EXACT integer micros — the
  // three factors are 2-dp decimals, so the product has ≤6 decimal
  // places and ×10⁶ is an exact DECIMAL(38,0) integer; never a
  // float product (SURVEY §5.1) — compared to the header price, with
  // the mismatch in truncating basis points
  //   bp = |lines − header| · 10⁴ DIV header.
  // Per order-status: order count, headerless-lines detection via
  // the join, orders with no lines at all (left join null), matched
  // within 1%, and the exact summed header/line cents. The audit
  // REPORTS imbalance, it never assumes balance — on this corpus
  // headers and lines genuinely diverge and the op says so.
  //
  // Scale bounds: line micros ≤ 10¹² each, summed as DECIMAL(38,0);
  // safe to 10²⁵ total micros per order-status group.
  //
  // Plan shape: one map-side-combined groupBy on l_orderkey (the
  // fact shuffle), a keyed join to orders (both sides huge → sort-
  // merge, AQE-planned), then a 3-group status rollup. The detail
  // table is touched once.
  // ---------------------------------------------------------------
  private def reconciliation(s: SparkSession, dir: String): DataFrame = {
    val lines = Tables.load(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(expr(
        """CAST(CAST(l_extendedprice AS DECIMAL(14,2))
          |  * CAST(1 + CAST(l_tax AS DECIMAL(3,2)) AS DECIMAL(4,2))
          |  * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(4,2))
          |  * 1000000 AS DECIMAL(38,0))"""
          .stripMargin)).as("line_micros"))
    Tables.load(s, dir, "orders")
      .join(lines, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderstatus").as("status"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 1000000 AS DECIMAL(38,0))")
          .as("header_micros"),
        col("line_micros"))
      .withColumn("bp",
        expr("""CASE WHEN line_micros IS NULL THEN NULL
               |ELSE abs(line_micros - header_micros) * 10000 DIV header_micros
               |END""".stripMargin))
      .groupBy("status")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("line_micros").isNull, 1L).otherwise(0L)).as("n_no_lines"),
        sum(when(col("bp") <= 100, 1L).otherwise(0L)).as("n_within_1pct"),
        sum(expr("CAST(header_micros DIV 10000 AS DECIMAL(38,0))")).as("header_cents"),
        sum(expr("CAST(coalesce(line_micros, 0) DIV 10000 AS DECIMAL(38,0))")).as("line_cents"))
      .select(col("status"), col("n_orders"), col("n_no_lines"), col("n_within_1pct"),
        expr("CAST(header_cents AS BIGINT)").as("header_cents"),
        expr("CAST(line_cents AS BIGINT)").as("line_cents"))
      .orderBy("status")
  }

  private val reconciliationSql =
    """WITH lines AS (
      |  SELECT l_orderkey,
      |         sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2))
      |             * CAST(1 + CAST(l_tax AS DECIMAL(3,2)) AS DECIMAL(4,2))
      |             * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(4,2))
      |             * 1000000 AS HUGEINT)) AS line_micros
      |  FROM lineitem GROUP BY 1),
      |j AS (
      |  SELECT o_orderstatus AS status,
      |         CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 1000000 AS HUGEINT)
      |           AS header_micros,
      |         line_micros,
      |         CASE WHEN line_micros IS NULL THEN NULL
      |              ELSE abs(line_micros - header_micros) * 10000 // header_micros
      |         END AS bp
      |  FROM orders LEFT JOIN lines ON o_orderkey = l_orderkey)
      |SELECT status, CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(CASE WHEN line_micros IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_no_lines,
      |       CAST(sum(CASE WHEN bp <= 100 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_within_1pct,
      |       CAST(sum(header_micros // 10000) AS BIGINT) AS header_cents,
      |       CAST(sum(coalesce(line_micros, 0) // 10000) AS BIGINT) AS line_cents
      |FROM j
      |GROUP BY status
      |ORDER BY status""".stripMargin

  // ---------------------------------------------------------------
  // ev_type_affinity — behavioral affinity between event types (the
  // "users who do A also do B" matrix behind feature bundling and
  // recommendation): each type is a vector of per-user event counts;
  // for every unordered type pair the exact squared cosine
  //   cos²_ppm = (Σ aᵤbᵤ)² · 10⁶ DIV (Σaᵤ² · Σbᵤ²)
  // — squared specifically so the statistic stays in integer algebra
  // (a root would be a float; cos² preserves the ranking), plus the
  // co-active user count. Set-Jaccard would saturate at 1.0 here
  // (every user touches every type); count-profile cosine is the
  // affinity measure that still discriminates.
  //
  // Scale bounds: Σaᵤbᵤ ≤ users·maxCount²; squared ≤ 10³⁸ holds to
  // ~10¹⁵ user-count mass per type — DECIMAL(38,0) throughout.
  //
  // Plan shape — ONE scan of the event fact: (user, type) counts,
  // then a user-keyed rollup to a sorted per-user type vector (≤
  // |types| entries, bounded), from which each user emits its
  // C(types,2) cross terms AND its |types| diagonal squares in one
  // explode — linear fan-out, the q_market_basket bounded-basket
  // shape, with NO self-join (a self-join materializes the
  // users×types relation twice because Spark cannot reuse one
  // exchange across both join inputs). Over the |types|²-row term
  // aggregate the diagonal rows ARE the norms — fetched into each
  // off-diagonal row by two keyed windows (max of the diagonal per
  // t1 / per t2 partition), so the whole op is one join-free
  // pipeline ending in a constant-size window.
  // ---------------------------------------------------------------
  private def typeAffinity(s: SparkSession, dir: String): DataFrame = {
    val uc = Tables.load(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val terms = uc.groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("event_type").as("t"), col("c"))))
        .as("v"))
      .select(explode(expr(
        """concat(
          |  flatten(transform(v, (x, i) ->
          |    transform(slice(v, i + 2, size(v)),
          |      y -> struct(x.t AS t1, y.t AS t2,
          |                  CAST(x.c AS DECIMAL(38,0)) * y.c AS term)))),
          |  transform(v, x -> struct(x.t AS t1, x.t AS t2,
          |                           CAST(x.c AS DECIMAL(38,0)) * x.c AS term)))"""
          .stripMargin)).as("p"))
      .select(col("p.t1"), col("p.t2"), col("p.term"))
      .groupBy("t1", "t2")
      .agg(count(lit(1)).as("n_users"), sum(col("term")).as("s"))
    val diag = max(when(col("t1") === col("t2"), col("s")))
    terms
      .withColumn("na", diag.over(Window.partitionBy("t1")))
      .withColumn("nb", diag.over(Window.partitionBy("t2")))
      .filter(col("t1") < col("t2"))
      .select(col("t1"), col("t2"), col("n_users").as("n_co_users"),
        expr("CAST(s * s * 1000000 DIV (na * nb) AS BIGINT)").as("cos2_ppm"))
      .orderBy("t1", "t2")
  }

  private val typeAffinitySql =
    """WITH uc AS (
      |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |norms AS (
      |  SELECT event_type, sum(CAST(c AS HUGEINT) * c) AS nrm2
      |  FROM uc GROUP BY 1),
      |pairs AS (
      |  SELECT l.event_type AS t1, r.event_type AS t2,
      |         CAST(count(*) AS BIGINT) AS n_co_users,
      |         sum(CAST(l.c AS HUGEINT) * r.c) AS dot
      |  FROM uc l JOIN uc r
      |    ON l.user_id = r.user_id AND l.event_type < r.event_type
      |  GROUP BY 1, 2)
      |SELECT t1, t2, n_co_users,
      |       CAST(dot * dot * 1000000 // (na.nrm2 * nb.nrm2) AS BIGINT)
      |         AS cos2_ppm
      |FROM pairs
      |JOIN norms na ON na.event_type = t1
      |JOIN norms nb ON nb.event_type = t2
      |ORDER BY t1, t2""".stripMargin

  // ---------------------------------------------------------------
  // txt_ttr — per-language lexical diversity: type-token ratio and
  // hapax-legomena share (txt_vocab_growth charts vocabulary over
  // INGESTION ORDER; this is the per-language diversity SNAPSHOT
  // that corpus-mix decisions read). Per lang: token total, distinct
  // types, hapax count (types seen exactly once),
  //   ttr_ppm   = types · 10⁶ DIV tokens
  //   hapax_ppm = hapax · 10⁶ DIV types.
  //
  // Plan shape: tokenize map-only, one map-side-combined groupBy to
  // (lang, word) counts — the vocab-sized shuffle, linear — then a
  // |langs|-row rollup. Same skeleton as txt_zipf_coverage; never a
  // distinct over raw tokens (the count aggregate IS the distinct).
  // ---------------------------------------------------------------
  private def ttr(s: SparkSession, dir: String): DataFrame = {
    val words = Tables.load(s, dir, "documents")
      .select(col("lang"), explode(split(trim(col("text")), "\\s+")).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("n"))
    words.groupBy("lang")
      .agg(sum("n").as("tokens"),
        count(lit(1)).as("types"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("hapax"))
      .select(col("lang"), col("tokens"), col("types"), col("hapax"),
        expr("CAST(CAST(types AS DECIMAL(38,0)) * 1000000 DIV tokens AS BIGINT)").as("ttr_ppm"),
        expr("CAST(CAST(hapax AS DECIMAL(38,0)) * 1000000 DIV types AS BIGINT)").as("hapax_ppm"))
      .orderBy("lang")
  }

  private val ttrSql =
    """WITH words AS (
      |  SELECT lang, w, count(*) AS n FROM (
      |    SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      |    FROM documents) t
      |  GROUP BY 1, 2)
      |SELECT lang, CAST(sum(n) AS BIGINT) AS tokens,
      |       CAST(count(*) AS BIGINT) AS types,
      |       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
      |       CAST(count(*) * 1000000 // sum(n) AS BIGINT) AS ttr_ppm,
      |       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1000000 // count(*)
      |            AS BIGINT) AS hapax_ppm
      |FROM words
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("etl_reconciliation", reconciliation, Some(reconciliationSql)),
    Op("ev_type_affinity", typeAffinity, Some(typeAffinitySql)),
    Op("txt_ttr", ttr, Some(ttrSql)))
}
