package graft.ops

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling / sharding operators for training-data
  * curation (SURVEY.md §2) — the selection stage of an LLM data
  * pipeline: rate-based stratified sampling, fixed-size per-class
  * samples, and stable shard assignment for export.
  *
  * Everything is hash-deterministic (md5 of the document id — the
  * same engine-portable trick the dedup family uses), never
  * `rand()`: a training-data sample must be REPRODUCIBLE across
  * runs, engines and partitionings, or no experiment that uses it
  * is. That also makes every op fully DuckDB-oracle-checkable.
  *
  * Scale shapes:
  *  - samp_stratified is a pure map-side filter — no shuffle at all;
  *    the scan's predicate is the hash comparison.
  *  - samp_fixed_per_class windows per stratum — one shuffle on the
  *    (low-cardinality) stratum key; AQE skew handles a giant class.
  *  - exp_shards is a partial-aggregated groupBy on the derived
  *    shard id — one shuffle of pre-combined per-task rows.
  */
object Sampling {

  /** Portable deterministic per-doc hash in [0, 10000) (basis
    * points): first 8 md5 hex chars of the id string, mod 10⁴.
    */
  private[ops] val bpSpark =
    "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 10000"
  private[ops] val bpDuck =
    "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) % 10000"

  // ---------------------------------------------------------------
  // samp_stratified — rate-based stratified sample: keep ~20% of
  // every language stratum by hash threshold. Inclusion depends only
  // on doc_id, so the sample is stable under reruns, repartitioning
  // and incremental corpus growth (a doc never flips in or out).
  // ---------------------------------------------------------------
  private val SampleBp = 2000L // 20.00%

  private def stratified(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .withColumn("h_bp", expr(bpSpark))
      .filter(col("h_bp") < SampleBp)
      .select(col("lang"), col("doc_id"), col("h_bp"))
      .orderBy("lang", "doc_id")

  private val stratifiedSql =
    s"""SELECT lang, doc_id, $bpDuck AS h_bp
      |FROM documents
      |WHERE $bpDuck < $SampleBp
      |ORDER BY lang, doc_id""".stripMargin

  // ---------------------------------------------------------------
  // samp_fixed_per_class — deterministic fixed-size sample: the K
  // hash-smallest docs per language (a reproducible "reservoir" —
  // rank by hash, not arrival). Class-balancing for eval/training
  // splits: every stratum contributes exactly min(K, |stratum|).
  // ---------------------------------------------------------------
  private val PerClassK = 50

  private def fixedPerClass(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("h_bp"), col("doc_id"))
    Tables.load(s, dir, "documents")
      .withColumn("h_bp", expr(bpSpark))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= PerClassK)
      .select(col("lang"), col("rk").cast("int").as("rk"), col("doc_id"), col("h_bp"))
      .orderBy("lang", "rk")
  }

  private val fixedPerClassSql =
    s"""SELECT lang, rk, doc_id, h_bp FROM (
      |  SELECT lang, doc_id, h_bp,
      |    CAST(row_number() OVER (PARTITION BY lang ORDER BY h_bp, doc_id) AS INT) AS rk
      |  FROM (SELECT lang, doc_id, $bpDuck AS h_bp FROM documents) h) r
      |WHERE rk <= $PerClassK
      |ORDER BY lang, rk""".stripMargin

  // ---------------------------------------------------------------
  // exp_shards — stable shard assignment for training-data export
  // (shard = hash % 16): per-shard row/char/stratum stats prove the
  // hash spreads the corpus evenly, so downstream loaders get
  // balanced files. The write itself is partitionBy(shard) on this
  // derived column; the op surfaces the audit the writer would log.
  // ---------------------------------------------------------------
  private val NShards = 16L

  private def shards(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .withColumn("shard", expr(bpSpark) % NShards)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy("shard")

  private val shardsSql =
    s"""SELECT ($bpDuck) % $NShards AS shard, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
      |FROM documents
      |GROUP BY shard
      |ORDER BY shard""".stripMargin

  // ---------------------------------------------------------------
  // samp_mixture — per-source mixture weighting: the data-mixture
  // knob of LLM pre-training (each source gets its own sampling
  // rate; the corpus-level mix is the product of source sizes and
  // rates). Rates live in a tiny config relation (source → basis
  // points) that broadcast-joins onto the corpus — the plan a
  // config-driven pipeline ships: the 100 TB side is touched once by
  // a map-side hash filter, never shuffled. Inclusion is the same
  // doc_id-hash threshold as samp_stratified, so a source's sample
  // only GROWS as its rate is turned up (nested samples — mixture
  // re-weighing between experiment runs reuses every doc already
  // selected at the lower rate).
  // ---------------------------------------------------------------
  private val MixtureRates = Seq(10000L, 5000L, 2500L, 1250L) // bp by src index % 4

  private def mixture(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val rateCase = MixtureRates.zipWithIndex.map { case (bp, i) =>
      s"WHEN $i THEN CAST($bp AS BIGINT)"
    }.mkString("CASE CAST(substr(source, 4) AS INT) % 4 ", " ", "END")
    // config relation: distinct sources + their configured rate
    val weights = d.select(col("source")).distinct()
      .withColumn("rate_bp", expr(rateCase))
    d.join(broadcast(weights), "source")
      .withColumn("h_bp", expr(bpSpark))
      .filter(col("h_bp") < col("rate_bp"))
      .select(col("source"), col("rate_bp"), col("doc_id"), col("h_bp"), col("lang"))
      .orderBy("source", "doc_id")
  }

  private val mixtureSql = {
    val rateCase = MixtureRates.zipWithIndex.map { case (bp, i) =>
      s"WHEN $i THEN CAST($bp AS BIGINT)"
    }.mkString("CASE CAST(substr(source, 4) AS INT) % 4 ", " ", "END")
    s"""WITH w AS (SELECT source, $rateCase AS rate_bp FROM (SELECT DISTINCT source FROM documents) s)
      |SELECT d.source, w.rate_bp, d.doc_id, $bpDuck AS h_bp, d.lang
      |FROM documents d JOIN w ON d.source = w.source
      |WHERE $bpDuck < w.rate_bp
      |ORDER BY d.source, d.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // exp_pack_sequences — sequence packing for training export:
  // concatenate documents in a deterministic hash-shuffled order and
  // chop at a fixed token budget (GPT-style pack-and-split; the op
  // emits the per-doc pack manifest a loader consumes: which
  // sequence each doc starts in and at what offset). Shape: docs are
  // first sharded by id hash (shard = export parallelism — each
  // shard packs independently, so 1000 executors pack 1000 shards
  // with no coordination), then a per-shard running token sum
  // assigns seq_id = floor(tokens_before / budget). One shuffle on
  // the shard key; the window never sees more than a shard.
  // Token counts are the whitespace tokenization txt_stats already
  // hash-gates cross-engine.
  // ---------------------------------------------------------------
  private val PackBudget = 256L // tokens per packed sequence
  private val PackShards = 8L

  private def packSequences(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(col("h_bp"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "documents")
      .withColumn("h_bp", expr(bpSpark))
      .withColumn("shard", col("h_bp") % PackShards)
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")).cast("bigint"))
      .withColumn("tokens_before", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_id", expr(s"tokens_before DIV $PackBudget"))
      .withColumn("seq_offset", col("tokens_before") % PackBudget)
      .select("shard", "seq_id", "seq_offset", "doc_id", "n_tokens", "h_bp")
      .orderBy("shard", "seq_id", "seq_offset", "doc_id")
  }

  private val packSequencesSql =
    s"""WITH t AS (
      |  SELECT doc_id, $bpDuck AS h_bp, ($bpDuck) % $PackShards AS shard,
      |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT shard, doc_id, n_tokens, h_bp,
      |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY h_bp, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS tokens_before
      |  FROM t)
      |SELECT shard, tokens_before // $PackBudget AS seq_id,
      |  tokens_before % $PackBudget AS seq_offset, doc_id, n_tokens, h_bp
      |FROM c
      |ORDER BY shard, seq_id, seq_offset, doc_id""".stripMargin

  // ---------------------------------------------------------------
  // exp_split — deterministic train/val/test assignment (90/5/5 by
  // doc_id hash basis points): the split every supervised pipeline
  // ships. Inclusion depends only on doc_id, so membership is stable
  // under reruns, repartitioning and corpus growth — a doc NEVER
  // migrates between splits as data arrives (the leakage bug
  // random-split pipelines hit on every refresh). Pure map over the
  // scan; the downstream writer partitions by the derived column.
  // ---------------------------------------------------------------
  private[ops] val TrainBp = 9000L // 90.00%
  private[ops] val ValBp = 500L    // 5.00%; test = remainder

  private def tvtSplit(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .withColumn("bp", expr(bpSpark))
      .withColumn("split",
        when(col("bp") < TrainBp, "train")
          .when(col("bp") < TrainBp + ValBp, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("lang"), col("split"), col("n_chars"))
      .orderBy("doc_id")

  private val splitSql =
    s"""SELECT doc_id, lang,
      |  CASE WHEN ($bpDuck) < $TrainBp THEN 'train'
      |       WHEN ($bpDuck) < ${TrainBp + ValBp} THEN 'val'
      |       ELSE 'test' END AS split,
      |  n_chars
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // samp_importance — importance-weighted deterministic sampling:
  // acceptance probability proportional to the doc's quality score
  // (p = quality_ppm / 2·10⁶, max 50%), decided by comparing a
  // per-doc md5 hash uniform in [0, 10⁶) against quality_ppm/2 —
  // all integer (2·h < quality_ppm), so membership is exact,
  // reproducible, and stable under corpus growth like every other
  // hash-threshold sampler here. The pre-training "upsample good
  // data" knob with the same zero-shuffle map-side shape as
  // samp_stratified; weights come from the already-proven integer
  // quality score.
  // ---------------------------------------------------------------
  private val ppmSpark =
    "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 1000000"
  private val ppmDuck =
    "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) % 1000000"

  private def importance(s: SparkSession, dir: String): DataFrame =
    Dedup.qualityPerDoc(s, dir)
      .withColumn("h_ppm", expr(ppmSpark))
      .filter(lit(2) * col("h_ppm") < col("quality_ppm"))
      .select("doc_id", "quality_ppm", "h_ppm")
      .orderBy("doc_id")

  private val importanceSql =
    s"""WITH q AS (
      |  SELECT doc_id,
      |    (10 * n - (5 * dup_cnt + 3 * stop_cnt + 2 * short_cnt)) * CAST(100000 AS BIGINT) // n AS quality_ppm
      |  FROM (
      |    SELECT doc_id, len(toks) AS n,
      |      len(list_filter(toks, x -> x IN (${graft.ops.TextOps.stopList}))) AS stop_cnt,
      |      len(list_filter(toks, x -> length(x) <= 2)) AS short_cnt,
      |      len(toks) - len(list_distinct(toks)) AS dup_cnt
      |    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents) t) x)
      |SELECT doc_id, quality_ppm, $ppmDuck AS h_ppm
      |FROM q
      |WHERE 2 * ($ppmDuck) < quality_ppm
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // exp_curriculum — curriculum phase assignment for training export:
  // within each source, docs rank into 4 phases by quality (phase 1 =
  // cleanest quartile first, the easy-to-hard curriculum), with a
  // hash order key for deterministic within-phase shuffling at read
  // time. The window partitions by source — never a global sort —
  // and the strict (quality DESC, doc_id) order makes ntile
  // deterministic and engine-portable.
  // ---------------------------------------------------------------
  private val CurriculumPhases = 4

  private def curriculum(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("quality_ppm").desc, col("doc_id"))
    Dedup.qualityPerDoc(s, dir)
      .join(Tables.load(s, dir, "documents").select("doc_id", "source"), "doc_id")
      .withColumn("phase", org.apache.spark.sql.functions.ntile(CurriculumPhases).over(w))
      .withColumn("order_bp", expr(bpSpark))
      .select("doc_id", "source", "quality_ppm", "phase", "order_bp")
      .orderBy("source", "phase", "order_bp", "doc_id")
  }

  private val curriculumSql =
    s"""WITH q AS (
      |  SELECT doc_id,
      |    (10 * n - (5 * dup_cnt + 3 * stop_cnt + 2 * short_cnt)) * CAST(100000 AS BIGINT) // n AS quality_ppm
      |  FROM (
      |    SELECT doc_id, len(toks) AS n,
      |      len(list_filter(toks, x -> x IN (${graft.ops.TextOps.stopList}))) AS stop_cnt,
      |      len(list_filter(toks, x -> length(x) <= 2)) AS short_cnt,
      |      len(toks) - len(list_distinct(toks)) AS dup_cnt
      |    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents) t) x)
      |SELECT q.doc_id, d.source, q.quality_ppm,
      |  CAST(ntile($CurriculumPhases) OVER (PARTITION BY d.source ORDER BY q.quality_ppm DESC, q.doc_id) AS INT) AS phase,
      |  (('0x' || substr(md5(CAST(q.doc_id AS VARCHAR)), 1, 8))::BIGINT) % 10000 AS order_bp
      |FROM q JOIN documents d ON q.doc_id = d.doc_id
      |ORDER BY d.source, phase, order_bp, q.doc_id""".stripMargin

  // ---------------------------------------------------------------
  // samp_temperature — temperature-scaled source mixing (the
  // multilingual-LM corpus move: sample sources ∝ n^α, α = 0.5, so
  // big sources stop drowning small ones without discarding them —
  // where samp_mixture applies CONFIGURED per-source rates, this
  // DERIVES the rates from corpus statistics). Budget = ¼ of the
  // corpus; source s gets expected share budget·√n_s / Σ√n, i.e.
  // per-doc keep rate min(1, budget·w_s / (Σw · n_s)) with
  // w = floor(√n) — floor of a correctly-rounded double sqrt of an
  // exact integer is deterministic on both engines, and everything
  // after is integer basis-point arithmetic on the same
  // hash-threshold inclusion rule every sampler here uses
  // (reproducible under reruns, repartitioning, corpus growth).
  // Plan shape: per-source counts (map-side-combined, |sources|
  // rows) → 1-row totals broadcast → rates broadcast-joined back to
  // the corpus scan — one fact-sized pass, zero fact-sized shuffles.
  // ---------------------------------------------------------------
  private def temperature(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val counts = d.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("w", expr("CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT)"))
    // rate numerator budget·w·10000 can pass 2^63 near 1e10 docs
    // (Spark would wrap silently where DuckDB raises — ADVICE r5), so
    // the products run in DECIMAL(38,0)/HUGEINT on both engines; the
    // QUOTIENT is bounded by total_docs·10000 and lands back in BIGINT.
    // Totals ride unpartitioned windows over the |sources|-row
    // aggregate (a 1-row-agg join-back would re-scan the corpus).
    val rates = counts
      .withColumn("total_docs", sum(col("n_docs")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("sum_w", sum(col("w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("rate_bp", least(lit(10000L),
        expr("(CAST(total_docs DIV 4 AS DECIMAL(38,0)) * w * 10000) " +
          "DIV (CAST(sum_w AS DECIMAL(38,0)) * n_docs)")))
      .select("source", "n_docs", "rate_bp")
    d.join(broadcast(rates), "source")
      .withColumn("h_bp", expr(bpSpark))
      .filter(col("h_bp") < col("rate_bp"))
      .select("source", "n_docs", "rate_bp", "doc_id", "lang")
      .orderBy("source", "doc_id")
  }

  private val temperatureSql =
    s"""WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
      |cw AS (SELECT *, CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS w FROM c),
      |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total_docs, CAST(sum(w) AS BIGINT) AS sum_w FROM cw),
      |r AS (SELECT source, n_docs,
      |        CAST(least(10000, (CAST(t.total_docs // 4 AS HUGEINT) * w * 10000) // (CAST(t.sum_w AS HUGEINT) * n_docs)) AS BIGINT) AS rate_bp
      |      FROM cw, t)
      |SELECT d.source, r.n_docs, r.rate_bp, d.doc_id, d.lang
      |FROM documents d JOIN r USING (source)
      |WHERE $bpDuck < r.rate_bp
      |ORDER BY d.source, d.doc_id""".stripMargin

  // ---------------------------------------------------------------
  // exp_epoch_shuffle — the data-loader's SHUFFLE CONTRACT: a
  // reproducible, epoch-keyed permutation of every shard (epoch 0
  // and epoch 1 orders differ, but each is a pure function of
  // (epoch, doc_id) — rerun the job, get byte-identical batches; no
  // rand(), no partition-order dependence). Order key =
  // md5("e<epoch>:<doc_id>"), position = row_number within
  // (epoch, shard) ordered by (order key, doc_id) — exactly how a
  // loader shuffles at scale: WITHIN shards (a bounded window per
  // (epoch, shard) partition), never a corpus-wide global sort.
  // ---------------------------------------------------------------
  private val ShuffleEpochs = 2

  private def epochShuffle(s: SparkSession, dir: String): DataFrame = {
    val epochs = (0 until ShuffleEpochs).map(e => lit(e)).toSeq
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), (expr(bpSpark) % 8).as("shard"))
      .withColumn("epoch", explode(array(epochs: _*)))
      .withColumn("ok",
        expr("CAST(conv(substr(md5(concat('e', epoch, ':', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("epoch", "shard").orderBy(col("ok"), col("doc_id")))
        .cast("bigint"))
      .select(col("epoch").cast("bigint").as("epoch"), col("shard"), col("pos"), col("doc_id"))
      .orderBy("epoch", "shard", "pos")
  }

  private val epochShuffleSql =
    s"""WITH d AS (SELECT doc_id, ($bpDuck) % 8 AS shard FROM documents),
      |e AS (SELECT d.doc_id, d.shard, CAST(t.ep AS BIGINT) AS epoch
      |      FROM d, range(0, $ShuffleEpochs) t(ep)),
      |k AS (SELECT *,
      |        (('0x' || substr(md5('e' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) AS ok
      |      FROM e)
      |SELECT epoch, shard,
      |  CAST(row_number() OVER (PARTITION BY epoch, shard ORDER BY ok, doc_id) AS BIGINT) AS pos,
      |  doc_id
      |FROM k
      |ORDER BY epoch, shard, pos""".stripMargin

  // ---------------------------------------------------------------
  // exp_interleave — deterministic stride-scheduled source
  // interleaving: the global training order in which every source is
  // spread evenly across the whole epoch (no "all of source A, then
  // all of B" — which would make early training see one domain — and
  // no rand() — which would make the run unreproducible). Classic
  // stride scheduling: doc at within-source shuffled rank r of n_s
  // gets virtual position (2r−1)·N DIV (2·n_s) — source s occupies
  // every (N/n_s)-th slot, so ANY prefix of the order holds each
  // source in proportion to its share (±|sources|, the bound
  // InterleaveSpec locks). Exact integer arithmetic; ties between
  // sources at the same virtual position break by (source, doc_id).
  //
  // Scale shape: the within-source shuffle rank is a window
  // PARTITIONED BY SOURCE (hash-ordered, like exp_epoch_shuffle);
  // the virtual position is pure per-row algebra off the broadcast
  // |sources|-row count relation; the output's global orderBy is a
  // sort-on-read contract (the order KEY is data — a consumer
  // re-sorts by it per epoch shard), not a global window: no
  // unpartitioned window anywhere.
  // ---------------------------------------------------------------
  private def interleave(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val nTotal = d.count()
    val withRank = d
      .select(col("doc_id"), col("source"),
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)").as("ok"))
      .withColumn("src_rank", row_number().over(
        Window.partitionBy("source").orderBy(col("ok"), col("doc_id"))).cast("bigint"))
    val srcN = d.groupBy("source").agg(count(lit(1)).as("n_src"))
    withRank.join(broadcast(srcN), "source")
      .withColumn("vpos", expr(s"(2 * src_rank - 1) * CAST($nTotal AS BIGINT) DIV (2 * n_src)"))
      .select("doc_id", "source", "src_rank", "n_src", "vpos")
      .orderBy("vpos", "source", "doc_id")
  }

  private val interleaveSql =
    """WITH n AS (SELECT count(*) AS n_total FROM documents),
      |k AS (SELECT doc_id, source,
      |        (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) AS ok
      |      FROM documents),
      |r AS (SELECT doc_id, source,
      |        CAST(row_number() OVER (PARTITION BY source ORDER BY ok, doc_id) AS BIGINT) AS src_rank
      |      FROM k),
      |sn AS (SELECT source, count(*) AS n_src FROM documents GROUP BY source)
      |SELECT r.doc_id, r.source, r.src_rank, sn.n_src,
      |  CAST((2 * r.src_rank - 1) * n.n_total // (2 * sn.n_src) AS BIGINT) AS vpos
      |FROM r JOIN sn ON r.source = sn.source CROSS JOIN n
      |ORDER BY vpos, r.source, doc_id""".stripMargin

  // ---------------------------------------------------------------
  // exp_token_budget — greedy token-budget fill per language: rank
  // each language's docs by quality (the proven integer quality_ppm,
  // ties → doc_id), admit docs while the running token total stays
  // within the per-language budget — the "give me the best 2k tokens
  // of German" selection a mixture-weighted pre-training recipe runs
  // per (lang, source) cell. Greedy-prefix semantics: a doc is kept
  // iff its OWN cumulative sum fits; later smaller docs may still fit
  // and are kept (knapsack-greedy, deterministic, order-stable).
  //
  // Scale shape: the cumulative sum is a window PARTITIONED BY
  // LANGUAGE — the partition count is the language count, so at
  // 100 TB this is the documented skew point: the production path
  // computes the per-lang quality-threshold from a bounded
  // (lang × quality-band) histogram first (exactly the two-phase
  // trick q_percentiles_hist proves) and only window-scans the
  // boundary band; registered form keeps the single window since the
  // gate corpus has 5 langs × ≤220 docs. The window sits above a
  // doc-level relation keyed by (lang, quality, id) — deterministic
  // under any partitioning.
  // ---------------------------------------------------------------
  private val TokenBudget = 2000L

  private def tokenBudget(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("lang")
      .orderBy(col("quality_ppm").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Dedup.qualityPerDoc(s, dir)
      .join(Tables.load(s, dir, "documents").select("doc_id", "lang"), "doc_id")
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= TokenBudget)
      .select("lang", "doc_id", "quality_ppm", "n_tokens", "cum_tokens")
      .orderBy("lang", "cum_tokens", "doc_id")
  }

  private val tokenBudgetSql =
    s"""WITH q AS (
      |  SELECT doc_id,
      |    (10 * n - (5 * dup_cnt + 3 * stop_cnt + 2 * short_cnt)) * CAST(100000 AS BIGINT) // n AS quality_ppm,
      |    CAST(n AS BIGINT) AS n_tokens
      |  FROM (
      |    SELECT doc_id, len(toks) AS n,
      |      len(list_filter(toks, x -> x IN (${graft.ops.TextOps.stopList}))) AS stop_cnt,
      |      len(list_filter(toks, x -> length(x) <= 2)) AS short_cnt,
      |      len(toks) - len(list_distinct(toks)) AS dup_cnt
      |    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents) t) x),
      |c AS (
      |  SELECT d.lang, q.doc_id, q.quality_ppm, q.n_tokens,
      |    CAST(sum(q.n_tokens) OVER (PARTITION BY d.lang
      |      ORDER BY q.quality_ppm DESC, q.doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
      |  FROM q JOIN documents d ON q.doc_id = d.doc_id)
      |SELECT lang, doc_id, quality_ppm, n_tokens, cum_tokens
      |FROM c WHERE cum_tokens <= $TokenBudget
      |ORDER BY lang, cum_tokens, doc_id""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("exp_token_budget", tokenBudget, Some(tokenBudgetSql)),
    Op("exp_interleave", interleave, Some(interleaveSql)),
    Op("exp_epoch_shuffle", epochShuffle, Some(epochShuffleSql)),
    Op("samp_temperature", temperature, Some(temperatureSql)),
    Op("exp_split", tvtSplit, Some(splitSql)),
    Op("samp_importance", importance, Some(importanceSql)),
    Op("exp_curriculum", curriculum, Some(curriculumSql)),
    Op("samp_stratified", stratified, Some(stratifiedSql)),
    Op("samp_fixed_per_class", fixedPerClass, Some(fixedPerClassSql)),
    Op("samp_mixture", mixture, Some(mixtureSql)),
    Op("exp_pack_sequences", packSequences, Some(packSequencesSql)),
    Op("exp_shards", shards, Some(shardsSql)))
}
