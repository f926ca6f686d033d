package graft.ops

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Split-hygiene ops — the two places a training pipeline quietly
  * ruins its own eval: near-duplicate pairs straddling the
  * train/test boundary (leakage), and duplicate clusters oversampled
  * because membership was decided per-doc instead of per-cluster.
  * Both COMPOSE already-gated artifacts (the staged near-dup pair
  * graph and CC cluster labels) with the hash-split rule — the point
  * is that split policy and dedup policy must be audited TOGETHER.
  */
object Leakage {

  // ---------------------------------------------------------------
  // exp_split_leakage — near-dup leakage audit across the
  // train/val/test boundary: every staged near-dup pair is labeled
  // with its endpoints' hash-split assignments (exp_split's exact
  // md5 basis-point rule), bucketed by unordered split combination,
  // and emitted with share_ppm + is_leak. A pair whose endpoints
  // land in different splits means the model trains on (almost) the
  // test document — txt_decontaminate catches eval-set contamination
  // against a FIXED holdout; this audits the SPLIT ITSELF, which is
  // how production corpora actually leak (MinerU/C4-class pipelines
  // dedup before splitting for exactly this reason).
  //
  // Plan shape: the pair graph is the staged artifact (linear,
  // df-capped, shared with 5+ ops); this op adds two 8-byte-key
  // joins of the skinny pair relation against a map-only split
  // assignment, then a ≤6-row aggregate. At 100 TB it costs two
  // pair-sized joins — the corpus is never rescanned.
  // ---------------------------------------------------------------
  private def splitAssign(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), expr(Sampling.bpSpark).as("bp"))
      .select(col("doc_id"),
        when(col("bp") < Sampling.TrainBp, "train")
          .when(col("bp") < Sampling.TrainBp + Sampling.ValBp, "val")
          .otherwise("test").as("split"))

  private def splitLeakage(s: SparkSession, dir: String): DataFrame = {
    val sp = splitAssign(s, dir)
    val pairs = Dedup.nearDupPairs(s, dir)
      .join(sp.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(sp.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .select(least(col("sa"), col("sb")).as("split_a"),
        greatest(col("sa"), col("sb")).as("split_b"))
    val g = pairs.groupBy("split_a", "split_b").agg(count(lit(1)).as("n_pairs"))
    // total via unpartitioned window over the ≤9-row aggregate — a
    // re-aggregated 1-row join would rebuild the whole pair graph
    g.withColumn("total", sum(col("n_pairs")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("split_a"), col("split_b"), col("n_pairs"),
        when(col("split_a") =!= col("split_b"), 1).otherwise(0).cast("int").as("is_leak"),
        expr("CAST(n_pairs * 1000000 DIV total AS BIGINT)").as("share_ppm"))
      .orderBy("split_a", "split_b")
  }

  private val splitLeakageSql =
    s"""${Dedup.shinglesDuck},
      |${Dedup.cappedPairsDuck},
      |nd AS (SELECT doc_a, doc_b FROM pairs WHERE inter * 2 >= na + nb - inter),
      |sp AS (
      |  SELECT doc_id,
      |    CASE WHEN bp < ${Sampling.TrainBp} THEN 'train'
      |         WHEN bp < ${Sampling.TrainBp + Sampling.ValBp} THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM (SELECT doc_id, ${Sampling.bpDuck} AS bp FROM documents) b),
      |j AS (
      |  SELECT least(sa.split, sb.split) AS split_a,
      |    greatest(sa.split, sb.split) AS split_b
      |  FROM nd JOIN sp sa ON nd.doc_a = sa.doc_id
      |  JOIN sp sb ON nd.doc_b = sb.doc_id),
      |g AS (SELECT split_a, split_b, count(*) AS n_pairs FROM j GROUP BY 1, 2),
      |ttl AS (SELECT sum(n_pairs) AS total FROM g)
      |SELECT split_a, split_b, CAST(n_pairs AS BIGINT) AS n_pairs,
      |  CAST(CASE WHEN split_a <> split_b THEN 1 ELSE 0 END AS INT) AS is_leak,
      |  CAST(n_pairs * 1000000 // total AS BIGINT) AS share_ppm
      |FROM g CROSS JOIN ttl
      |ORDER BY split_a, split_b""".stripMargin

  // ---------------------------------------------------------------
  // samp_dedup_weighted — duplicate-aware downsampling: membership
  // is decided by the SAME deterministic md5 basis-point draw the
  // sampling family uses, but the acceptance threshold is scaled by
  // the doc's near-dup cluster size — keep iff bp·size < 5000, i.e.
  // P(keep) = 0.5/size — so every duplicate CLUSTER contributes the
  // same expected mass to the sample as a singleton does (the
  // "count-dedup reweighting" a corpus mixer applies when it can't
  // afford to hard-drop duplicates). Unlabeled docs are singletons
  // (size 1) via the standard left-join-coalesce. cluster_size rides
  // along as the inverse-probability weight numerator.
  //
  // Plan shape: staged CC labels (linear, shared) left-joined to the
  // corpus on doc_id — cluster labels are dim-sized relative to the
  // corpus — then a map-only integer filter; membership is exact and
  // reproducible across engines, partitionings and corpus growth
  // like every op in the sampling family.
  // ---------------------------------------------------------------
  private def dedupWeighted(s: SparkSession, dir: String): DataFrame = {
    val labels = Dedup.clusterLabels(s, dir)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), expr(Sampling.bpSpark).as("bp"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"), col("bp"))
      .filter(col("bp") * col("cluster_size") < 5000L)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .orderBy("doc_id")
  }

  private val dedupWeightedSql =
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
      |csz AS (
      |  SELECT doc_id, cluster_id,
      |    count(*) OVER (PARTITION BY cluster_id) AS cluster_size
      |  FROM lab)
      |SELECT d.doc_id,
      |  coalesce(z.cluster_id, d.doc_id) AS cluster_id,
      |  CAST(coalesce(z.cluster_size, 1) AS BIGINT) AS cluster_size
      |FROM (SELECT doc_id, ${Sampling.bpDuck} AS bp FROM documents) d
      |LEFT JOIN csz z ON d.doc_id = z.doc_id
      |WHERE d.bp * coalesce(z.cluster_size, 1) < 5000
      |ORDER BY d.doc_id""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("exp_split_leakage", splitLeakage, Some(splitLeakageSql)),
    Op("samp_dedup_weighted", dedupWeighted, Some(dedupWeightedSql)))
}
