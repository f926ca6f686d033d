package graft.ops

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** curation_manifest — the per-document audit manifest a training-data
  * curation pipeline actually ships: ONE row per source document with
  * its final disposition and the stage that decided it, composed from
  * the already-proven building blocks (exact dedup, near-dup
  * clustering over the staged pair graph, eval-holdout hash split,
  * n-gram decontamination, integer-ppm quality gate). Where
  * dedup_corpus_pipeline reports per-stage survivor COUNTS, this is
  * the row-level lineage those counts summarize — the artifact
  * downstream jobs filter on (`WHERE disposition = 'kept'`) and
  * auditors diff between corpus snapshots.
  *
  * Disposition priority (first match wins, mirroring the order the
  * stages run): exact_dup → near_dup → eval_holdout → contaminated →
  * low_quality → kept. The eval holdout outranks contamination by
  * construction (eval docs ARE the contamination reference, never
  * training candidates).
  *
  * Scale shape: every component is a skinny (doc_id, flag) frame —
  * exact dedup is one shuffle on the content hash, clustering reuses
  * the staged pair graph, decontamination broadcasts the (small by
  * construction) eval shingle universe, quality is a pure map — and
  * the manifest itself is doc_id-keyed joins of those frames. Nothing
  * here adds a pass over the corpus beyond what the component ops
  * already proved linear.
  */
object Curation {

  private def manifest(s: SparkSession, dir: String): DataFrame = {
    val exactFlag = Dedup.exact(s, dir).select(col("doc_id"), col("is_duplicate"))
    val ndDrop = Dedup.clusterLabels(s, dir)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"), lit(1).as("nd_drop"))
    val contam = TextOps.decontaminate(s, dir)
      .select(col("doc_id"), col("contaminated"))
    val isEval =
      expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 10000") <
        TextOps.EvalBp
    Dedup.qualityPerDoc(s, dir)
      .join(exactFlag, "doc_id")
      .join(ndDrop, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .withColumn("disposition",
        when(col("is_duplicate") === 1, "exact_dup")
          .when(col("nd_drop").isNotNull, "near_dup")
          .when(isEval, "eval_holdout")
          .when(coalesce(col("contaminated"), lit(0)) === 1, "contaminated")
          .when(col("quality_ppm") < Dedup.QualityGatePpm, "low_quality")
          .otherwise("kept"))
      .select("doc_id", "disposition", "quality_ppm", "n_tokens")
      .orderBy("doc_id")
  }

  // Oracle: the same stage CTEs the component oracles already
  // hash-match (capped-postings pair graph + recursive CC for
  // near-dups, window-canonical exact dedup, hash-split eval set +
  // shingle-overlap contamination, integer-ppm quality), stitched
  // into one disposition CASE. `evd` ranges over ALL documents (the
  // eval hash split is defined on doc_id, not on shingle-bearing
  // docs), while the contamination score only exists for shingled
  // non-eval docs — short docs fall through to the quality gate on
  // both engines.
  private val manifestSql =
    s"""${Dedup.shinglesDuck},
      |${Dedup.cappedPairsDuck},
      |nd AS (SELECT doc_a, doc_b FROM pairs WHERE inter * 2 >= na + nb - inter),
      |edges AS (SELECT doc_a AS u, doc_b AS v FROM nd UNION SELECT doc_b, doc_a FROM nd
      |          UNION SELECT doc_a, doc_a FROM nd UNION SELECT doc_b, doc_b FROM nd),
      |reach AS (
      |  WITH RECURSIVE r(u, v) AS (
      |    SELECT u, v FROM edges
      |    UNION
      |    SELECT r.u, e.v FROM r JOIN edges e ON r.v = e.u)
      |  SELECT u, v FROM r),
      |lab AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
      |ex AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY content_hash) THEN 1 ELSE 0 END AS is_dup
      |  FROM (SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS content_hash
      |        FROM documents) h),
      |q AS (
      |  SELECT doc_id,
      |    (10 * n - (5 * dup_cnt + 3 * stop_cnt + 2 * short_cnt)) * CAST(100000 AS BIGINT) // n AS quality_ppm,
      |    CAST(n AS BIGINT) AS n_tokens
      |  FROM (
      |    SELECT doc_id, len(toks) AS n,
      |      len(list_filter(toks, x -> x IN (${TextOps.stopList}))) AS stop_cnt,
      |      len(list_filter(toks, x -> length(x) <= 2)) AS short_cnt,
      |      len(toks) - len(list_distinct(toks)) AS dup_cnt
      |    FROM t) x),
      |evd AS (SELECT doc_id,
      |          (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) % 10000 < ${TextOps.EvalBp} AS is_eval
      |        FROM documents),
      |evsid AS (SELECT DISTINCT p.sid FROM post0 p JOIN evd ON p.doc_id = evd.doc_id WHERE evd.is_eval),
      |hits AS (
      |  SELECT p.doc_id, count(*) AS n_sh,
      |    CAST(sum(CASE WHEN e.sid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
      |  FROM post0 p JOIN evd ON p.doc_id = evd.doc_id
      |  LEFT JOIN evsid e ON p.sid = e.sid
      |  WHERE NOT evd.is_eval
      |  GROUP BY p.doc_id)
      |SELECT q.doc_id,
      |  CASE WHEN ex.is_dup = 1 THEN 'exact_dup'
      |       WHEN lab.doc_id IS NOT NULL AND lab.doc_id <> lab.cluster_id THEN 'near_dup'
      |       WHEN evd.is_eval THEN 'eval_holdout'
      |       WHEN h.n_hit IS NOT NULL AND h.n_hit * 100 >= h.n_sh * ${TextOps.ContamPct} THEN 'contaminated'
      |       WHEN q.quality_ppm < ${Dedup.QualityGatePpm} THEN 'low_quality'
      |       ELSE 'kept' END AS disposition,
      |  q.quality_ppm, q.n_tokens
      |FROM q
      |JOIN ex ON q.doc_id = ex.doc_id
      |JOIN evd ON q.doc_id = evd.doc_id
      |LEFT JOIN lab ON q.doc_id = lab.doc_id
      |LEFT JOIN hits h ON q.doc_id = h.doc_id
      |ORDER BY q.doc_id""".stripMargin

  // ---------------------------------------------------------------
  // exp_dataset_card — the one-row DATASET CARD a curation run
  // publishes beside its export (the corpus-level summary every
  // training-data release ships: sizes, composition, and how much
  // each cleaning stage removed): the per-document manifest
  // aggregated to disposition counts + exact token totals + integer
  // mean quality, with source/language cardinalities broadcast from
  // one dimension pass. Everything derives from already-gated
  // relations, so the card can never disagree with the lineage it
  // summarizes — and the oracle nests the manifest oracle whole.
  // ---------------------------------------------------------------
  private def datasetCard(s: SparkSession, dir: String): DataFrame = {
    def n(d: String) = sum(when(col("disposition") === d, 1L).otherwise(0L)).as(s"n_$d")
    val dims = Tables.load(s, dir, "documents")
      .agg(countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"))
    manifest(s, dir)
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        n("exact_dup"), n("near_dup"), n("eval_holdout"),
        n("contaminated"), n("low_quality"), n("kept"),
        expr("sum(quality_ppm) DIV count(1)").as("mean_quality_ppm"))
      .crossJoin(broadcast(dims))
      .select(col("n_docs"), col("n_tokens"), col("n_sources"), col("n_langs"),
        col("n_exact_dup"), col("n_near_dup"), col("n_eval_holdout"),
        col("n_contaminated"), col("n_low_quality"), col("n_kept"),
        col("mean_quality_ppm"))
  }

  private val datasetCardSql =
    s"""WITH m AS ($manifestSql),
      |dims AS (SELECT count(DISTINCT source) AS n_sources, count(DISTINCT lang) AS n_langs
      |         FROM documents)
      |SELECT count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |  dims.n_sources, dims.n_langs,
      |  CAST(sum(CASE WHEN disposition = 'exact_dup' THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
      |  CAST(sum(CASE WHEN disposition = 'near_dup' THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
      |  CAST(sum(CASE WHEN disposition = 'eval_holdout' THEN 1 ELSE 0 END) AS BIGINT) AS n_eval_holdout,
      |  CAST(sum(CASE WHEN disposition = 'contaminated' THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
      |  CAST(sum(CASE WHEN disposition = 'low_quality' THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality,
      |  CAST(sum(CASE WHEN disposition = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(sum(quality_ppm) AS BIGINT) // count(*) AS mean_quality_ppm
      |FROM m, dims
      |GROUP BY dims.n_sources, dims.n_langs""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("curation_manifest", manifest, Some(manifestSql)),
    Op("exp_dataset_card", datasetCard, Some(datasetCardSql)))
}
