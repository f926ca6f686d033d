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

  val ops: Seq[Op] = Seq(
    Op("emb_drift", drift, Some(driftSql)))
}
