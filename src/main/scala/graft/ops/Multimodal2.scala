package graft.ops

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second multimodal pack — the LAYOUT side of media curation: how a
  * variable-aspect image corpus buckets for padded batch training,
  * and whether the modality × language mix matches the recipe. Media
  * dimensions come from the same deterministic md5 derivation the
  * sampling pack uses (the container has no codecs — a real build
  * reads width/height from the decoded header at the same column
  * contract; every downstream expression is dimension-source-
  * agnostic).
  */
object Multimodal2 {

  // deterministic "decoded" dimensions per image doc: w ∈ [256,1280]
  // h ∈ [256,1280] in 64px steps — md5-derived, engine-identical
  // (SURVEY §5.2 conv/substr idiom).
  private val WSpark =
    "256 + (CAST(conv(substr(md5(concat('w', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 17) * 64"
  private val HSpark =
    "256 + (CAST(conv(substr(md5(concat('h', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 17) * 64"
  private val WDuck =
    "256 + (('0x' || substr(md5('w' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 17) * 64"
  private val HDuck =
    "256 + (('0x' || substr(md5('h' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 17) * 64"

  // ---------------------------------------------------------------
  // mm_aspect_buckets — aspect-ratio bucketing for padded image
  // batching (the multimodal twin of exp_length_buckets: batches
  // must share a canvas, so every image pads to its bucket's target
  // box). Each image snaps to the nearest of five canonical ratios
  // {1:1, 4:3, 3:4, 16:9, 9:16} by EXACT cross-multiplied integer
  // distance: |w·rd − h·rn| · (scale by the common denominator) —
  // comparing |w/h − rn/rd| across candidates multiplies every
  // candidate's distance by w·h·∏rd, a positive constant per image,
  // so the argmin is unchanged and no division ever happens; ties
  // break to the earlier bucket in canonical order (deterministic).
  // Per bucket: image count, true pixel mass, padded mass at the
  // per-bucket max canvas, pad-waste ppm.
  //
  // Plan shape: map-only dimension derivation + per-image 5-way
  // LEAST argmin (codegen'd CASE chain), then a 5-group map-side-
  // combined aggregate. One scan of the image slice, no join.
  // ---------------------------------------------------------------
  private final case class Ratio(name: String, rn: Int, rd: Int)
  private val Ratios = Seq(
    Ratio("r1x1", 1, 1), Ratio("r4x3", 4, 3), Ratio("r3x4", 3, 4),
    Ratio("r16x9", 16, 9), Ratio("r9x16", 9, 16))

  // dist_i = |w·rd_i − h·rn_i| · (144 / rd_i): |w/h − rn_i/rd_i|
  // scaled by the per-image constant h and the common grid
  // LCM(1,3,4,9,16) = 144 — argmin unchanged, no division, all
  // integer. CASE chain in canonical order ⇒ ties break to the
  // earlier bucket, deterministically.
  private def argminExpr: String = {
    val dists = Ratios.map(r => s"abs(w * ${r.rd} - h * ${r.rn}) * ${144 / r.rd}")
    (0 until Ratios.length - 1).foldRight(s"'${Ratios.last.name}'") { (i, elseExpr) =>
      val later = dists.drop(i + 1)
      val laterMins =
        if (later.length == 1) later.head else later.mkString("least(", ", ", ")")
      s"CASE WHEN ${dists(i)} <= $laterMins THEN '${Ratios(i).name}' ELSE $elseExpr END"
    }
  }

  private def aspectBuckets(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "documents")
      .filter(col("doc_id") % 3 === 0) // the "image" slice (media_type derivation)
      .select(col("doc_id"),
        expr(WSpark).as("w"), expr(HSpark).as("h"))
      .withColumn("bucket", expr(argminExpr))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_images"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * h")).as("true_px"),
        max(col("w")).as("max_w"), max(col("h")).as("max_h"))
      .select(col("bucket"), col("n_images"),
        expr("CAST(true_px AS BIGINT)").as("true_px"),
        col("max_w"), col("max_h"),
        expr("""CAST((CAST(max_w AS DECIMAL(38,0)) * max_h * n_images - true_px) * 1000000
               |  DIV (CAST(max_w AS DECIMAL(38,0)) * max_h * n_images) AS BIGINT)"""
          .stripMargin).as("pad_waste_ppm"))
      .orderBy("bucket")
  }

  private val aspectBucketsSql = {
    val argmin = argminExpr
    s"""WITH dims AS (
      |  SELECT doc_id, $WDuck AS w, $HDuck AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |b AS (SELECT doc_id, w, h, $argmin AS bucket FROM dims),
      |cell AS (
      |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_images,
      |         sum(CAST(w AS HUGEINT) * h) AS true_px,
      |         CAST(max(w) AS BIGINT) AS max_w, CAST(max(h) AS BIGINT) AS max_h
      |  FROM b GROUP BY 1)
      |SELECT bucket, n_images, CAST(true_px AS BIGINT) AS true_px, max_w, max_h,
      |       CAST((max_w * max_h * n_images - true_px) * 1000000
      |            // (CAST(max_w AS HUGEINT) * max_h * n_images) AS BIGINT)
      |         AS pad_waste_ppm
      |FROM cell
      |ORDER BY bucket""".stripMargin
  }

  // ---------------------------------------------------------------
  // mm_modality_mix — modality × language corpus-mix audit (the
  // recipe check a multimodal training run starts from: is the
  // corpus the intended blend of image/audio/video text-pairs per
  // language?): per (media_type, lang) the doc count, payload byte
  // mass, and each cell's exact ppm share of BOTH its modality row
  // and the whole corpus — the two normalizations a mix table is
  // read by.
  //
  // Plan shape: one scan → 15-group map-side-combined aggregate;
  // modality totals and the corpus total are keyed/unpartitioned
  // window sums over the 15-row cell relation — separate aggregate
  // branches would each rescan the corpus (no exchange reuse across
  // aggregate shapes), tripling a 100 TB read.
  // ---------------------------------------------------------------
  private def modalityMix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cell = Multimodal.withPayload(Tables.load(s, dir, "documents"))
      .groupBy(col("media_type"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("payload")).cast("long")).as("bytes"))
    cell
      .withColumn("type_docs", sum(col("n_docs")).over(Window.partitionBy("media_type")))
      .withColumn("all_docs", sum(col("n_docs")).over(Window.partitionBy()))
      .select(col("media_type"), col("lang"), col("n_docs"), col("bytes"),
        expr("CAST(CAST(n_docs AS DECIMAL(38,0)) * 1000000 DIV type_docs AS BIGINT)")
          .as("share_of_type_ppm"),
        expr("CAST(CAST(n_docs AS DECIMAL(38,0)) * 1000000 DIV all_docs AS BIGINT)")
          .as("share_of_corpus_ppm"))
      .orderBy("media_type", "lang")
  }

  private val modalityMixSql =
    """WITH cell AS (
      |  SELECT ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      |         lang, CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sum(octet_length(encode(text))) AS BIGINT) AS bytes
      |  FROM documents GROUP BY 1, 2),
      |bt AS (SELECT media_type, sum(n_docs) AS type_docs FROM cell GROUP BY 1),
      |tot AS (SELECT sum(n_docs) AS all_docs FROM cell)
      |SELECT media_type, lang, n_docs, bytes,
      |       CAST(n_docs * 1000000 // type_docs AS BIGINT) AS share_of_type_ppm,
      |       CAST(n_docs * 1000000 // all_docs AS BIGINT) AS share_of_corpus_ppm
      |FROM cell JOIN bt USING (media_type) CROSS JOIN tot
      |ORDER BY media_type, lang""".stripMargin

  // ---------------------------------------------------------------
  // mm_interleave_pack — MULTIMODAL sequence packing: the manifest a
  // vision/audio-language trainer's loader consumes, where each doc
  // costs its TEXT tokens plus its media PATCH tokens (images/audio/
  // video enter the context window as patch embeddings — the cost
  // model every multimodal curriculum budgets by). Patch rates are
  // per-modality constants over the payload byte length (image
  // ceil(bytes/64), audio /128, video /32 — declared stand-ins like
  // the codec stubs; a deployment plugs its tokenizer+patcher rates,
  // the packing algebra is unchanged). Packing = exp_pack_sequences'
  // proven shape: hash-shard (each of 8 shards packs independently —
  // 1000 executors pack 1000 shards with no coordination), per-shard
  // running total in hash order, seq_id = floor(before/budget) at a
  // 512-token budget (multimodal sequences budget larger than
  // text-only; the media cost makes docs 2-5× heavier). One shuffle
  // on the shard key; the window never sees more than a shard.
  // ---------------------------------------------------------------
  private val IpBudget = 512L
  private val IpShards = 8L

  private def interleavePack(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Multimodal.withPayload(Tables.load(s, dir, "documents"))
      .withColumn("h", expr(
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 13), 16, 10) AS BIGINT)"))
      .withColumn("shard", col("h") % IpShards)
      .withColumn("text_tokens", size(split(trim(col("text")), "\\s+")).cast("bigint"))
      .withColumn("n_bytes", length(col("payload")).cast("bigint"))
      .withColumn("media_tokens", expr(
        """CASE media_type WHEN 'image' THEN (n_bytes + 63) DIV 64
          |WHEN 'audio' THEN (n_bytes + 127) DIV 128
          |ELSE (n_bytes + 31) DIV 32 END""".stripMargin))
      .withColumn("total_tokens", col("text_tokens") + col("media_tokens"))
      .withColumn("before", sum(col("total_tokens")).over(w) - col("total_tokens"))
      .select(col("shard"), expr(s"before DIV $IpBudget").as("seq_id"),
        (col("before") % IpBudget).as("seq_offset"), col("doc_id"),
        col("media_type"), col("text_tokens"), col("media_tokens"),
        col("total_tokens"))
      .orderBy("shard", "seq_id", "seq_offset", "doc_id")
  }

  private val interleavePackSql =
    s"""WITH t AS (SELECT doc_id,
      |    ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS text_tokens,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT AS h
      |  FROM documents),
      |m AS (SELECT *,
      |    CASE media_type WHEN 'image' THEN (n_bytes + 63) // 64
      |    WHEN 'audio' THEN (n_bytes + 127) // 128
      |    ELSE (n_bytes + 31) // 32 END AS media_tokens
      |  FROM t),
      |c AS (SELECT *, text_tokens + media_tokens AS total_tokens,
      |    h % $IpShards AS shard FROM m),
      |r AS (SELECT *, CAST(sum(total_tokens) OVER (PARTITION BY shard
      |    ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    - total_tokens AS BIGINT) AS fore FROM c)
      |SELECT shard, fore // $IpBudget AS seq_id, fore % $IpBudget AS seq_offset,
      |  doc_id, media_type, text_tokens, media_tokens, total_tokens
      |FROM r
      |ORDER BY shard, seq_id, seq_offset, doc_id""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("mm_aspect_buckets", aspectBuckets, Some(aspectBucketsSql)),
    Op("mm_modality_mix", modalityMix, Some(modalityMixSql)),
    Op("mm_interleave_pack", interleavePack, Some(interleavePackSql)))
}
