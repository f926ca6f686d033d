package graft.ops

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding distribution monitoring — the batch-over-batch health
  * check a production embedding pipeline runs on every ingest (model
  * redeploys, preprocessing drift and upstream corpus shifts all show
  * up as per-dimension moment movement long before downstream quality
  * metrics catch them).
  */
object EmbOps {

  // ---------------------------------------------------------------
  // emb_drift — per-dimension mean drift between two ingest cohorts
  // (the even/odd vec_id split stands in for batch N vs batch N+1):
  // for each dimension, both cohorts' exact ppm sums and counts, the
  // two means, and a top-3 flag on the dimensions whose means moved
  // most. emb_dim_stats audits ONE corpus's per-dim moments; this is
  // the two-sample comparison between cohorts. All ordering decisions
  // run on the EXACT cross-multiplied integer
  //   shift_num = sum_cand·n_ref − sum_ref·n_cand
  //     (= n_ref·n_cand·(mean_cand − mean_ref), scaled exact)
  // in DECIMAL(38,0) — never on a float difference — so the flagged
  // top-3 set is engine-identical; the means themselves are emitted
  // as one exact-integer double division each (the dimStats idiom).
  //
  // Plan shape: posexplode → ONE map-side-combined aggregate keyed by
  // dim with conditional cohort sums (no join between cohorts, no
  // pivot shuffle); the rank window runs over the |dims|-row result.
  // At 100 TB: a full-corpus scan into a 64-row aggregate — nothing
  // else. shift_num stays within BIGINT while Σ|v_ppm|·n < 9·10¹⁸
  // (≈ 10¹² vectors at unit-normed 64-dim); the DECIMAL(38,0)
  // arithmetic overflows loudly (ANSI), never silently, beyond that.
  // ---------------------------------------------------------------
  private val PpmExpr = "CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)"

  private def drift(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select((col("vec_id") % 2).as("cohort"), col("dim"), expr(PpmExpr).as("v_ppm"))
    val agg = x.groupBy("dim").agg(
      sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("n_ref"),
      sum(when(col("cohort") === 0, col("v_ppm")).otherwise(0L)).as("sum_ref"),
      sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("n_cand"),
      sum(when(col("cohort") === 1, col("v_ppm")).otherwise(0L)).as("sum_cand"))
    val scored = agg.select(col("dim"), col("n_ref"), col("n_cand"),
      (col("sum_ref").cast("double") / 1000000.0 / col("n_ref")).as("mean_ref"),
      (col("sum_cand").cast("double") / 1000000.0 / col("n_cand")).as("mean_cand"),
      expr("CAST(CAST(sum_cand AS DECIMAL(38,0)) * n_ref - " +
        "CAST(sum_ref AS DECIMAL(38,0)) * n_cand AS BIGINT)").as("shift_num"))
    scored
      .withColumn("rn",
        row_number().over(Window.orderBy(abs(col("shift_num")).desc, col("dim"))))
      .select(col("dim"), col("n_ref"), col("n_cand"), col("mean_ref"), col("mean_cand"),
        col("shift_num"),
        when(col("rn") <= 3, 1).otherwise(0).cast("int").as("is_top_drift"))
      .orderBy("dim")
  }

  private val driftSql =
    """WITH x AS (
      |  SELECT vec_id % 2 AS cohort, CAST(i AS INT) AS dim,
      |    CAST(floor(CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE) * 1000000) AS BIGINT) AS v_ppm
      |  FROM (SELECT vec_id, embedding, unnest(range(0, len(embedding))) AS i FROM embeddings) u),
      |a AS (
      |  SELECT dim,
      |    CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
      |    CAST(sum(CASE WHEN cohort = 0 THEN v_ppm ELSE 0 END) AS BIGINT) AS sum_ref,
      |    CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cand,
      |    CAST(sum(CASE WHEN cohort = 1 THEN v_ppm ELSE 0 END) AS BIGINT) AS sum_cand
      |  FROM x GROUP BY dim),
      |scored AS (
      |  SELECT dim, n_ref, n_cand,
      |    CAST(sum_ref AS DOUBLE) / 1000000 / n_ref AS mean_ref,
      |    CAST(sum_cand AS DOUBLE) / 1000000 / n_cand AS mean_cand,
      |    CAST(CAST(sum_cand AS HUGEINT) * n_ref
      |      - CAST(sum_ref AS HUGEINT) * n_cand AS BIGINT) AS shift_num
      |  FROM a),
      |r AS (
      |  SELECT *, row_number() OVER (ORDER BY abs(shift_num) DESC, dim) AS rn
      |  FROM scored)
      |SELECT dim, n_ref, n_cand, mean_ref, mean_cand, shift_num,
      |  CAST(CASE WHEN rn <= 3 THEN 1 ELSE 0 END AS INT) AS is_top_drift
      |FROM r
      |ORDER BY dim""".stripMargin

  // ---------------------------------------------------------------
  // emb_diversity — per-label mean pairwise squared L2 distance (the
  // intra-class spread / collapse monitor: a label whose embeddings
  // are collapsing to a point stops being separable, one whose spread
  // explodes is mislabeled or multi-modal) WITHOUT forming any pair:
  // the moment identity
  //   Σ_{i,j} ‖xᵢ−xⱼ‖² = 2·( n·Σᵢ‖xᵢ‖² − Σ_d (Σᵢ x_{i,d})² )
  // turns the O(n²) pairwise sum into two linear aggregates. All
  // inputs are exact ppm integers; per-dim sums are squared in
  // DECIMAL(38,0) (sd ≈ n·10⁶ overflows BIGINT when squared beyond
  // n ≈ 3000), so the pairwise-sum NUMERATOR is exact and both
  // engines divide the same integer — the emitted mean is one double
  // division of that exact numerator (the emb_drift idiom), rounded
  // for display.
  //
  // Plan shape: posexplode → (label, dim) map-side-combined
  // aggregate → |labels|-row aggregate. No join, no pair, no window
  // over data. At 100 TB: one corpus scan into label×dim cells —
  // the numerator stays exact while n·Σ‖x‖²_ppm < 10³⁸ (≈ 10¹³
  // unit-normed vectors per label).
  // ---------------------------------------------------------------
  private def diversity(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.load(s, dir, "embeddings")
      .select(col("label"), col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("label"), col("vec_id"), col("dim"), expr(PpmExpr).as("v_ppm"))
    val byDim = x.groupBy("label", "dim").agg(
      count(lit(1)).as("n_vec"),
      sum(col("v_ppm")).as("sd"),
      sum(expr("v_ppm * v_ppm")).as("s2d"))
    byDim.groupBy("label").agg(
        max(col("n_vec")).as("n"),
        sum(col("s2d")).as("s2"),
        sum(expr("CAST(sd AS DECIMAL(38,0)) * sd")).as("sum_sd2"))
      .filter(col("n") >= 2) // pairwise spread is undefined for a singleton label
      .select(col("label"), col("n"), col("s2"),
        round(
          expr("CAST(2 * (CAST(n AS DECIMAL(38,0)) * s2 - sum_sd2) AS DOUBLE)") /
            (col("n").cast("double") * (col("n") - 1).cast("double") * 1e12), 6)
          .as("mean_pair_sq_dist"))
      .orderBy("label")
  }

  private val diversitySql =
    """WITH x AS (
      |  SELECT label, vec_id, CAST(i AS INT) AS dim,
      |    CAST(floor(CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE) * 1000000) AS BIGINT) AS v_ppm
      |  FROM (SELECT label, vec_id, embedding, unnest(range(0, len(embedding))) AS i FROM embeddings) u),
      |bydim AS (
      |  SELECT label, dim, count(*) AS n_vec,
      |    CAST(sum(v_ppm) AS BIGINT) AS sd,
      |    CAST(sum(v_ppm * v_ppm) AS BIGINT) AS s2d
      |  FROM x GROUP BY 1, 2),
      |a AS (
      |  SELECT label, CAST(max(n_vec) AS BIGINT) AS n,
      |    CAST(sum(s2d) AS BIGINT) AS s2,
      |    sum(CAST(sd AS HUGEINT) * sd) AS sum_sd2
      |  FROM bydim GROUP BY 1)
      |SELECT label, n, s2,
      |  -- pairwise spread is undefined for a singleton label (n < 2 filtered below)
      |  round(CAST(2 * (CAST(n AS HUGEINT) * s2 - sum_sd2) AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * (n - 1) * 1e12), 6) AS mean_pair_sq_dist
      |FROM a
      |WHERE n >= 2
      |ORDER BY label""".stripMargin

  // ---------------------------------------------------------------
  // emb_cosine_sample_hist — the corpus's pairwise-cosine DISTRIBUTION
  // from a deterministic linear pair sample (the calibration read
  // behind every dedup/ANN threshold choice: dedup_embedding's τ and
  // sim_range_search's radius are only meaningful relative to where
  // the background similarity mass sits; the sim_* ops return top-k
  // neighbors, none of them the distribution): each vector pairs with
  // its id-successor — N−1 pairs, content-uncorrelated with the id
  // order, reproducible across engines/reruns, and NEVER the N²
  // relation a random sample of pairs would need coordination to
  // avoid — histogrammed by cosine tenth-band with exact ppm shares.
  // Cosine uses the gate-proven sim-family idiom (native
  // graft_array_dot, round(dot/sqrt(na·nb), 4) — identical double
  // ops on both engines).
  //
  // Plan shape: one self-join on the 8-byte successor id (shuffle of
  // id+vector once), a ≤21-row histogram, a 1-row broadcast total.
  // At 100 TB: linear scan + one keyed shuffle, nothing else.
  // ---------------------------------------------------------------
  private def cosineSampleHist(s: SparkSession, dir: String): DataFrame = {
    val e = Dedup.withNorm(Tables.load(s, dir, "embeddings"))
    val a = e.select(col("vec_id").as("pid"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select((col("vec_id") - 1).as("pid"), col("v").as("vb"), col("nrm").as("nb"))
    val hist = a.join(b, "pid")
      .withColumn("sim", round(
        expr("graft_array_dot(va, vb)") / sqrt(col("na") * col("nb")), 4))
      .select(floor(col("sim") * 10).cast("int").as("band"))
      .groupBy("band").agg(count(lit(1)).as("n_pairs"))
    // total as an unpartitioned window over the ~20-row band
    // aggregate — a 1-row aggregate joined back would recompute the
    // whole vector join (no exchange reuse across aggregate shapes)
    hist
      .withColumn("total", sum(col("n_pairs")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("band"), col("n_pairs"),
        expr("CAST(n_pairs * 1000000 DIV total AS BIGINT)").as("share_ppm"))
      .orderBy("band")
  }

  private val cosineSampleHistSql =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |n AS (SELECT vec_id, v, list_dot_product(v, v) AS nrm FROM e),
      |p AS (
      |  SELECT a.v AS va, b.v AS vb, a.nrm AS na, b.nrm AS nb
      |  FROM n a JOIN n b ON b.vec_id = a.vec_id + 1),
      |s AS (
      |  SELECT round(list_dot_product(va, vb) / sqrt(na * nb), 4) AS sim
      |  FROM p),
      |h AS (SELECT CAST(floor(sim * 10) AS INT) AS band, count(*) AS n_pairs FROM s GROUP BY 1),
      |t AS (SELECT sum(n_pairs) AS total FROM h)
      |SELECT band, CAST(n_pairs AS BIGINT) AS n_pairs,
      |  CAST(n_pairs * 1000000 // total AS BIGINT) AS share_ppm
      |FROM h CROSS JOIN t
      |ORDER BY band""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("emb_drift", drift, Some(driftSql)),
    Op("emb_diversity", diversity, Some(diversitySql)),
    Op("emb_cosine_sample_hist", cosineSampleHist, Some(cosineSampleHistSql)))
}
