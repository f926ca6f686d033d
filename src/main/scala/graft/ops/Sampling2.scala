package graft.ops

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second sampling/export pack — EXACT-CARDINALITY deterministic
  * selection. The rate-based samplers (Sampling.scala) keep each row
  * independently, so the sample SIZE is only expected, not exact;
  * these two give the other contract: exactly-k rows / exactly-K
  * folds, still hash-deterministic and engine-reproducible.
  */
object Sampling2 {

  // ---------------------------------------------------------------
  // samp_bottomk — exact-size uniform sample via bottom-k min-wise
  // hashing (the distributed equivalent of reservoir sampling, but
  // DETERMINISTIC and mergeable: the k smallest md5 draws of a set
  // are a uniform k-subset, and bottom-k of a union is the bottom-k
  // of each side's bottom-k — so partitions combine without
  // coordination and reruns/engines agree row-for-row, which a
  // random reservoir cannot promise). Draw = md5 of the order key
  // string; the k smallest draws win.
  //
  // Plan shape: Spark compiles orderBy(draw).limit(k) to
  // TakeOrderedAndProject — per-partition top-k heaps + one
  // driver-side merge of (#partitions · k) rows, NO global sort.
  // At 100 TB with 10⁵ tasks and k = 2000 the merge is 2·10⁸ skinny
  // rows at worst — bounded by k, not by data; push k·partitions
  // past driver memory and the same plan runs as two chained
  // takeOrdered stages. The md5 draw is the proven cross-engine
  // idiom (Sampling.bpSpark).
  // ---------------------------------------------------------------
  private val BottomK = 2000

  private def bottomK(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        md5(col("o_orderkey").cast("string")).as("draw"))
      .orderBy("draw")
      .limit(BottomK)

  private val bottomKSql =
    s"""SELECT o_orderkey, o_custkey, o_totalprice,
      |  md5(CAST(o_orderkey AS VARCHAR)) AS draw
      |FROM orders
      |ORDER BY draw
      |LIMIT $BottomK""".stripMargin

  // ---------------------------------------------------------------
  // exp_kfold — deterministic k-fold cross-validation assignment
  // with a per-fold stratum-balance report: every document lands in
  // exactly one of K folds by md5 hash (stable under reruns,
  // engine-independent, and unchanged when other docs are added —
  // the property train/eval splits need so fold membership never
  // leaks across experiment iterations), and the output is the
  // fold × language contingency table with each cell's exact ppm
  // share of its fold — the skew check that tells you whether
  // "hold out fold 3" accidentally holds out a language.
  //
  // Plan shape: one map-only hash assignment + a K·|langs|-row
  // map-side-combined aggregate; the fold-total window runs over
  // that tiny table. At 100 TB nothing but the scan grows.
  // ---------------------------------------------------------------
  private val Folds = 5

  private def kfold(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.load(s, dir, "documents")
      .select(expr(s"CAST(${Sampling.bpSpark} % $Folds AS INT)").as("fold"), col("lang"))
      .groupBy("fold", "lang").agg(count(lit(1)).as("n_docs"))
    cells
      .withColumn("fold_total", sum(col("n_docs")).over(Window.partitionBy("fold")))
      .select(col("fold"), col("lang"), col("n_docs"), col("fold_total"),
        expr("CAST(n_docs * 1000000 DIV fold_total AS BIGINT)").as("share_ppm"))
      .orderBy("fold", "lang")
  }

  private val kfoldSql =
    s"""WITH a AS (
      |  SELECT CAST(${Sampling.bpDuck} % $Folds AS INT) AS fold, lang
      |  FROM documents),
      |c AS (SELECT fold, lang, count(*) AS n_docs FROM a GROUP BY 1, 2)
      |SELECT fold, lang, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(sum(n_docs) OVER (PARTITION BY fold) AS BIGINT) AS fold_total,
      |  CAST(n_docs * 1000000 // sum(n_docs) OVER (PARTITION BY fold) AS BIGINT) AS share_ppm
      |FROM c
      |ORDER BY fold, lang""".stripMargin

  // ---------------------------------------------------------------
  // samp_poisson_bootstrap — deterministic Poisson(1) bootstrap
  // replicates (the standard way to put an error bar on any corpus
  // statistic without resampling coordination: replicate r includes
  // each doc with multiplicity ~ Poisson(1), independent per
  // (doc, r) — the with-replacement bootstrap's distributed
  // equivalent, and with md5-derived draws it is REPRODUCIBLE: the
  // same replicate can be re-materialized for any downstream
  // debugging, which true randomness cannot). The multiplicity comes
  // from a ppm draw against the COMPILE-TIME Poisson(1) CDF ladder
  // floor(P(X≤k)·10⁶), k = 0..6 (a runtime exp() would hash-drift;
  // constants cannot — the q_benford convention), tail capped at 7
  // with the cap's probability mass ≈ 0.008% absorbed into the last
  // rung. Output: each replicate's effective doc count and char
  // mass — the spread ACROSS the 10 rows is the variance estimate.
  //
  // Plan shape: documents × 10 replicate explode (map-only, no
  // shuffle of content — only doc_id/n_chars ride), one 10-row
  // map-side-combined aggregate. At 100 TB the explode is a 10×
  // scan of two skinny columns, nothing else.
  // ---------------------------------------------------------------
  private val Replicates = 10
  private val PoissonCdfPpm = Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L, 999916L)

  private def poissonMult(drawExpr: String): String =
    PoissonCdfPpm.zipWithIndex
      .map { case (t, k) => s"WHEN $drawExpr < $t THEN $k" }
      .mkString("CASE ", " ", s" ELSE ${PoissonCdfPpm.length} END")

  private def bootstrap(s: SparkSession, dir: String): DataFrame = {
    val drawSpark =
      "CAST(conv(substr(md5(CAST(doc_id AS STRING) || ':' || CAST(r AS STRING)), 1, 8), 16, 10) AS BIGINT) % 1000000"
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        explode(expr(s"sequence(0, ${Replicates - 1})")).as("r"))
      .select(col("r"), col("n_chars"), expr(poissonMult(drawSpark)).as("m"))
      .groupBy("r").agg(
        count(lit(1)).as("n_draws"),
        sum(col("m")).as("eff_docs"),
        sum(expr("m * n_chars")).as("eff_chars"))
      .select(col("r").cast("int").as("replicate"), col("n_draws"),
        col("eff_docs"), col("eff_chars"))
      .orderBy("replicate")
  }

  private val bootstrapSql = {
    val drawDuck =
      "(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(r AS VARCHAR)), 1, 8))::BIGINT) % 1000000"
    s"""WITH x AS (
      |  SELECT doc_id, n_chars, unnest(range(0, $Replicates)) AS r
      |  FROM documents),
      |m AS (SELECT r, n_chars, ${poissonMult(drawDuck)} AS m FROM x)
      |SELECT CAST(r AS INT) AS replicate, count(*) AS n_draws,
      |  CAST(sum(m) AS BIGINT) AS eff_docs,
      |  CAST(sum(m * n_chars) AS BIGINT) AS eff_chars
      |FROM m
      |GROUP BY 1
      |ORDER BY replicate""".stripMargin
  }

  // ---------------------------------------------------------------
  // samp_neyman_alloc — Neyman-optimal stratified sample allocation
  // (survey-sampling's minimum-variance budget split: stratum h gets
  // n_h ∝ N_h·S_h, so high-variance strata are oversampled relative
  // to proportional allocation — the right way to spend a labeling
  // or eval budget across languages): per-language doc-length
  // moments give the exact integer
  //   q_h = (N_h · (N_h·Σx² − (Σx)²)) DIV (N_h − 1)   (= (N_h·S_h)²)
  // in DECIMAL(38,0) (N·V overflows BIGINT at corpus scale), the
  // weight is w_h = round(sqrt(q_h)) — IEEE sqrt is correctly
  // rounded, so the INTEGER weight is engine-identical even though a
  // root is involved — and the budget splits by exact
  // largest-remainder apportionment on those integer weights:
  //   base_h = B·w_h DIV W,  +1 to the (B − Σbase) largest
  //   remainders B·w_h MOD W (weight-desc, lang-asc ties).
  // Every allocation decision is integer arithmetic; no float ever
  // orders anything.
  //
  // Plan shape: one corpus-scan aggregate to |langs| rows (map-side
  // combined), then windows over that tiny relation. At 100 TB
  // nothing but the scan grows.
  // ---------------------------------------------------------------
  private val NeymanBudget = 10000L

  private def neymanAlloc(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stats = Tables.load(s, dir, "documents")
      .groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sx"),
        sum(expr("n_chars * n_chars")).as("sxx"))
      .filter(col("n_docs") >= 2) // a singleton stratum has no variance estimate
      .select(col("lang"), col("n_docs"),
        expr("CAST(round(sqrt(CAST(" +
          "(CAST(n_docs AS DECIMAL(38,0)) * (CAST(n_docs AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx)) DIV (n_docs - 1)" +
          " AS DOUBLE))) AS BIGINT)").as("w"))
    val tot = Window.partitionBy(lit(1))
    val withTot = stats
      .withColumn("w_total", sum(col("w")).over(tot))
      .withColumn("base", expr(s"CAST($NeymanBudget * w DIV w_total AS BIGINT)"))
      .withColumn("rem", expr(s"CAST(($NeymanBudget * w) % w_total AS BIGINT)"))
      .withColumn("give", lit(NeymanBudget) - sum(col("base")).over(tot))
      .withColumn("rk", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("rem").desc, col("lang"))))
    withTot
      .select(col("lang"), col("n_docs"), col("w"),
        (col("base") + when(col("rk") <= col("give"), 1L).otherwise(0L)).as("alloc"))
      .orderBy("lang")
  }

  private val neymanAllocSql =
    s"""WITH stats AS (
      |  SELECT lang, count(*) AS n_docs,
      |    CAST(sum(n_chars) AS BIGINT) AS sx,
      |    CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
      |  FROM documents GROUP BY 1 HAVING count(*) >= 2),
      |w AS (
      |  SELECT lang, n_docs,
      |    CAST(round(sqrt(CAST(
      |      (CAST(n_docs AS HUGEINT) * (CAST(n_docs AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)) // (n_docs - 1)
      |      AS DOUBLE))) AS BIGINT) AS w
      |  FROM stats),
      |t AS (
      |  SELECT lang, n_docs, w,
      |    sum(w) OVER () AS w_total,
      |    CAST($NeymanBudget * w // sum(w) OVER () AS BIGINT) AS base,
      |    CAST(($NeymanBudget * w) % (sum(w) OVER ()) AS BIGINT) AS rem
      |  FROM w),
      |r AS (
      |  SELECT t.*, $NeymanBudget - sum(base) OVER () AS give,
      |    row_number() OVER (ORDER BY rem DESC, lang) AS rk
      |  FROM t)
      |SELECT lang, n_docs, w,
      |  CAST(base + CASE WHEN rk <= give THEN 1 ELSE 0 END AS BIGINT) AS alloc
      |FROM r
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  // samp_priority — weighted exact-size sampling WITH an unbiased
  // subset-sum estimator: priority sampling (Duffield–Lund–Thorup).
  // samp_bottomk draws k docs UNIFORMLY; weighting the draw by size
  // (long docs matter more) breaks bottom-k's subset-sum math —
  // priority sampling restores it: priority q_i = w_i·D DIV h_i
  // (h_i uniform in [1, D]), keep the top-k by (q DESC, doc_id),
  // τ = the (k+1)-th priority, and each kept doc estimates its own
  // weight as ŵ_i = max(w_i, τ). The magic audited in the output:
  // Σ_sample max(w_i, τ) estimates Σ_corpus w_i — the WHOLE corpus's
  // token total priced from k rows. Weights = whitespace token
  // counts (the exp_pack_sequences idiom); when the corpus has ≤ k
  // docs, τ = 0 and the estimate degrades to exact. All integer:
  // D = 2^40 md5 draws (w·D fits BIGINT for w < 2^22 tokens/doc —
  // headroom documented), truncating DIV over positives.
  //
  // Plan shape: map-only weight+priority projection, then
  // orderBy(q DESC).limit(k+1) — TakeOrderedAndProject, the same
  // k-bounded no-global-sort shape as samp_bottomk. τ is a second
  // TakeOrdered(1) over those k+1 rows (NOT an unpartitioned window
  // — the τ relation is limit-bounded, and the guard demands
  // aggregates under global windows); sample membership is the
  // (q, doc_id) total-order filter against the broadcast τ row, so
  // rank-65 ties can never drift engines. The corpus-total audit is
  // one map-side-combined 1-row aggregate, broadcast onto the k
  // sample rows.
  // ---------------------------------------------------------------
  private val PriorityK = 64
  private val PriorityD = 1099511627776L // 2^40

  private def prioritySample(s: SparkSession, dir: String): DataFrame = {
    val pri = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("bigint").as("w"),
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 10), 16, 10) AS BIGINT) + 1").as("h"))
      .select(col("doc_id"), col("w"), expr(s"w * ${PriorityD}L DIV h").as("q"))
    val top = pri.orderBy(col("q").desc, col("doc_id")).limit(PriorityK + 1)
    val tauRow = top.orderBy(col("q").asc, col("doc_id").desc).limit(1)
      .select(col("q").as("tau_q"), col("doc_id").as("tau_doc"))
    val tot = pri.agg(sum(col("w")).as("w_total"), count(lit(1)).as("n_total"))
    val sample = top.crossJoin(broadcast(tauRow)).crossJoin(broadcast(tot))
      .filter(col("n_total") <= PriorityK ||
        col("q") > col("tau_q") ||
        (col("q") === col("tau_q") && col("doc_id") < col("tau_doc")))
      .withColumn("tau",
        when(col("n_total") <= PriorityK, lit(0L)).otherwise(col("tau_q")))
      .withColumn("w_est", greatest(col("w"), col("tau")))
    val estTot = sample.agg(sum(col("w_est")).as("est_total"))
    sample.crossJoin(broadcast(estTot))
      .select(col("doc_id"), col("w").as("w_tokens"), col("q"), col("tau"),
        col("w_est"), col("est_total"), col("w_total"),
        expr("abs(est_total - w_total) * 1000000 DIV w_total").as("err_abs_ppm"))
      .orderBy(col("q").desc, col("doc_id"))
  }

  private val prioritySampleSql =
    s"""WITH d AS (SELECT doc_id,
      |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS w,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 10))::BIGINT + 1 AS h
      |  FROM documents),
      |p AS (SELECT doc_id, w, w * $PriorityD // h AS q FROM d),
      |tot AS (SELECT CAST(sum(w) AS BIGINT) AS w_total,
      |  CAST(count(*) AS BIGINT) AS n_total FROM p),
      |r AS (SELECT doc_id, w, q,
      |  row_number() OVER (ORDER BY q DESC, doc_id) AS rnk FROM p),
      |s AS (SELECT r.doc_id, r.w, r.q,
      |    CASE WHEN t.n_total <= $PriorityK THEN 0
      |         ELSE (SELECT q FROM r WHERE rnk = ${PriorityK + 1}) END AS tau
      |  FROM r CROSS JOIN tot t
      |  WHERE r.rnk <= $PriorityK),
      |e AS (SELECT doc_id, w, q, tau, greatest(w, tau) AS w_est FROM s),
      |et AS (SELECT CAST(sum(w_est) AS BIGINT) AS est_total FROM e)
      |SELECT e.doc_id, e.w AS w_tokens, e.q, CAST(e.tau AS BIGINT) AS tau,
      |  e.w_est, et.est_total, t.w_total,
      |  abs(et.est_total - t.w_total) * 1000000 // t.w_total AS err_abs_ppm
      |FROM e CROSS JOIN et CROSS JOIN tot t
      |ORDER BY e.q DESC, e.doc_id""".stripMargin

  // ---------------------------------------------------------------
  // exp_preference_pairs — PREFERENCE-PAIR mining for DPO/RLHF-style
  // curation (the dataset a preference trainer consumes is (chosen,
  // rejected) pairs; mining them from a scored corpus is the
  // standard bootstrap before human labels exist): per SOURCE, rank
  // documents by the house quality score (txt_quality's exact
  // integer-ppm composite, re-derived inline so the pairs provably
  // rank on the gated metric), then pair the i-th BEST with the i-th
  // WORST — chosen = quality rank i ≤ n/4, rejected = rank n−i+1,
  // so every pair spans at least half the source's quality range and
  // pairs never share a document. The quality GAP is emitted as
  // data (plus is_strong = gap ≥ 0.1) rather than filtered, so the
  // pair yield is deterministic corpus-wide.
  //
  // Plan shape: doc-grain map for the score, then a TWO-PHASE
  // bucketed rank instead of one window partitioned by source alone
  // (a pathological single giant source would make that one hot sort
  // partition — VERDICT r11 item 3): q_ppm is bounded in
  // [0, 1_000_000] by construction (each penalty count ≤ n, so the
  // numerator sits in [0, 10n]), so a fixed 10_000-wide grid gives
  // ≤ 101 buckets; per-(source, bucket) counts are a bounded
  // relation whose descending running sum yields each bucket's rank
  // offset, and the doc-grain window partitions by (source, bucket)
  // — the largest sort partition is one score-bucket of one source
  // (~1/100th of it), not the whole source. rn is bit-identical to
  // the single-window rank (bucket order == q_ppm order). Then a
  // per-source count aggregate joined back source-keyed, one
  // self-join on (source, mirrored rank). Output is |docs|/4-sized.
  // ---------------------------------------------------------------
  private def preferencePairs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stopList = TextOps.stopList
    val q = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        expr("split(trim(text), '\\\\s+')").as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("stop_cnt", expr(s"size(filter(toks, x -> x IN ($stopList)))"))
      .withColumn("short_cnt", expr("size(filter(toks, x -> length(x) <= 2))"))
      .withColumn("dup_cnt", col("n") - size(array_distinct(col("toks"))))
      .select(col("doc_id"), col("source"),
        expr("(10 * n - (5 * dup_cnt + 3 * stop_cnt + 2 * short_cnt)) * CAST(100000 AS BIGINT) DIV n")
          .as("q_ppm"))
      // five consumers (bucket offsets, the ranked join, per-source
      // counts, both self-join sides) — checkpoint the skinny scored
      // relation so the tokenize-and-score scan runs ONCE, not per
      // branch (the r11 two-phase rewrite re-inlined it everywhere:
      // 0.5 → 1.4 s at sf0.1 before this truncation)
      .localCheckpoint()
    val bucketed = q.withColumn("bkt", expr("q_ppm DIV 10000"))
    val offsets = bucketed.groupBy("source", "bkt")
      .agg(count(lit(1)).as("bn"))
      .withColumn("off", coalesce(
        sum(col("bn")).over(Window.partitionBy("source")
          .orderBy(col("bkt").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("source", "bkt", "off")
    val ranked = bucketed.join(broadcast(offsets), Seq("source", "bkt"))
      .withColumn("rn", col("off") + row_number().over(
        Window.partitionBy("source", "bkt")
          .orderBy(col("q_ppm").desc, col("doc_id"))).cast("bigint"))
      .drop("bkt", "off")
    val counts = q.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val withN = ranked.join(counts, "source")
    val chosen = withN.filter(expr("rn <= n_docs DIV 4"))
      .select(col("source"), col("rn").as("pair_id"),
        col("doc_id").as("chosen_doc"), col("q_ppm").as("q_chosen_ppm"),
        col("n_docs"))
    val rejected = withN
      .select(col("source").as("rsource"), col("rn").as("rrn"),
        col("doc_id").as("rejected_doc"), col("q_ppm").as("q_rejected_ppm"))
    chosen
      .join(rejected, col("source") === col("rsource") &&
        col("rrn") === col("n_docs") - col("pair_id") + 1)
      .select(col("source"), col("pair_id"), col("chosen_doc"), col("rejected_doc"),
        col("q_chosen_ppm"), col("q_rejected_ppm"),
        (col("q_chosen_ppm") - col("q_rejected_ppm")).as("gap_ppm"))
      .withColumn("is_strong",
        when(col("gap_ppm") >= 100000L, 1).otherwise(0).cast("int"))
      .orderBy("source", "pair_id")
  }

  private val preferencePairsSql = {
    val stopList = TextOps.stopList
    s"""WITH q AS (
      |  SELECT doc_id, source,
      |    (10 * n - (5 * dup_cnt + 3 * stop_cnt + 2 * short_cnt)) * CAST(100000 AS BIGINT) // n AS q_ppm
      |  FROM (
      |    SELECT doc_id, source, len(toks) AS n,
      |      len(list_filter(toks, x -> x IN ($stopList))) AS stop_cnt,
      |      len(list_filter(toks, x -> length(x) <= 2)) AS short_cnt,
      |      len(toks) - len(list_distinct(toks)) AS dup_cnt
      |    FROM (SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS toks
      |          FROM documents) t) x),
      |r AS (SELECT *, CAST(row_number() OVER (
      |        PARTITION BY source ORDER BY q_ppm DESC, doc_id) AS BIGINT) AS rn
      |      FROM q),
      |c AS (SELECT source, count(*) AS n_docs FROM q GROUP BY 1),
      |wn AS (SELECT r.*, c.n_docs FROM r JOIN c USING (source))
      |SELECT ch.source, ch.rn AS pair_id, ch.doc_id AS chosen_doc,
      |  rj.doc_id AS rejected_doc, ch.q_ppm AS q_chosen_ppm,
      |  rj.q_ppm AS q_rejected_ppm,
      |  ch.q_ppm - rj.q_ppm AS gap_ppm,
      |  CAST(CASE WHEN ch.q_ppm - rj.q_ppm >= 100000 THEN 1 ELSE 0 END AS INT) AS is_strong
      |FROM wn ch JOIN wn rj
      |  ON ch.source = rj.source AND rj.rn = ch.n_docs - ch.rn + 1
      |WHERE ch.rn <= ch.n_docs // 4
      |ORDER BY ch.source, pair_id""".stripMargin
  }

  val ops: Seq[Op] = Seq(
    Op("samp_priority", prioritySample, Some(prioritySampleSql)),
    Op("samp_bottomk", bottomK, Some(bottomKSql)),
    Op("exp_kfold", kfold, Some(kfoldSql)),
    Op("samp_poisson_bootstrap", bootstrap, Some(bootstrapSql)),
    Op("samp_neyman_alloc", neymanAlloc, Some(neymanAllocSql)),
    Op("exp_preference_pairs", preferencePairs, Some(preferencePairsSql)))
}
