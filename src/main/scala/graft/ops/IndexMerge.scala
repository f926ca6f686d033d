package graft.ops

import graft.{Op, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** sim_index_merge — incremental ANN index maintenance (r12): the op
  * a streaming embedding store runs when a new batch lands. The
  * standing IVF index was trained on yesterday's corpus; today's
  * batch (vec_id % 5 == 4, 20%) is UNION-MERGED into it — each new
  * vector assigned to its nearest EXISTING cell, no re-Lloyd — and
  * the merged index is graded against (a) the index REBUILT from
  * scratch over the full corpus and (b) exact brute-force truth, on
  * the standard query sample. The recall DELTA between merged and
  * rebuilt is pinned as gated data (the sim_recall_eval convention:
  * index quality is a measured table, not a README claim), alongside
  * each index's structure audit — cell count and the hottest cell's
  * population, the skew read that tells an operator when accumulated
  * batch drift has earned a re-Lloyd.
  *
  * Scale shape: both grids are ceil(√N)-cell Lloyd-refined
  * assignments (the sim_ivf machinery — centroid tables stay k×64
  * doubles, broadcast in every assign join). All four assignment
  * passes (each grid's Lloyd seed + each grid's search) route
  * TWO-LEVEL through the grid's coarse seeds (r13): k = √N fine
  * cells made the flat ranking N^1.5 dots, the same super-linear
  * road the staged grid's sf10 probe dead-ended (SCALING_r12.md §1);
  * two-level is N^1.25. The merge path is the cheap one by
  * construction: it reuses the standing centroids and only pays the
  * batch's assignment — exactly why production stores merge instead
  * of rebuilding until the drift audit says otherwise. Recall and
  * structure aggregates are query-sample- and cell-grain-sized.
  * Exact brute truth is |Q|·N dots over the bounded query sample.
  */
object IndexMerge {

  private val K = 5
  private val NQueries = 20 // query sample: vec_id < 20, the family convention
  private val NProbe = 2 // sim_ivf's probe width
  private val BatchMod = 5 // vec_id % 5 == 4 is the arriving batch (20%)

  private def cosine(dot: Column, na: Column, nb: Column): Column =
    round(dot / sqrt(na * nb), 4)

  private def indexMerge(s: SparkSession, dir: String): DataFrame = {
    // norm-annotated corpus is scanned by both grids, both corpus
    // assignments, the query assignments and the brute truth (~8
    // passes): checkpoint the skinny (vec_id, v, nrm) relation once
    val e = Dedup.withNorm(Tables.load(s, dir, "embeddings"))
      .select("vec_id", "v", "nrm").localCheckpoint(false)
    val standing = e.filter(col("vec_id") % BatchMod =!= (BatchMod - 1))
    // grid-size metadata in TWO jobs instead of four (r16, the
    // indexDrift fused-metadata move): strides from one conditional-
    // sum job, per-grid fine-seed counts from a second
    val isStanding = col("vec_id") % BatchMod =!= (BatchMod - 1)
    def lng(r: org.apache.spark.sql.Row, i: Int): Long =
      if (r.isNullAt(i)) 0L else r.getLong(i) // sum over empty = null
    val (strideS, strideF) = {
      val r = e.agg(sum(when(isStanding, 1L).otherwise(0L)), count(lit(1))).head()
      (math.ceil(math.sqrt(lng(r, 0).toDouble)).toLong,
        math.ceil(math.sqrt(lng(r, 1).toDouble)).toLong)
    }
    val (k0S, k0F) = {
      val r = e.agg(
        sum(when(isStanding && col("vec_id") % strideS === 0, 1L).otherwise(0L)),
        sum(when(col("vec_id") % strideF === 0, 1L).otherwise(0L))).head()
      (lng(r, 0), lng(r, 1))
    }
    // standing grid: seeds + Lloyd means from the STANDING corpus
    // only (the batch did not exist when this index was trained);
    // rebuilt grid: trained from scratch over the full corpus
    val coarseS = Similarity.coarseSeedsFromCount(standing, strideS, k0S)
    val coarseF = Similarity.coarseSeedsFromCount(e, strideF, k0F)
    // one full-corpus routing per grid serves that grid's corpus +
    // query passes (and the rebuilt grid's seed pass — its training
    // set IS the corpus; the standing grid's seed pass routes the
    // standing subset, a different df, so it derives its own).
    // routingF is LAZY-checkpointed (2 consumers inside the F branch:
    // centF's seed pass + the assignment's own base — compute-once
    // block caching inside that branch's job); routingS has exactly
    // one consumer, so a checkpoint would only add caching overhead
    val routingS = Some(Similarity.coarseRouting(e, coarseS, "vec_id"))
    val routingF = Some(Similarity.coarseRouting(e, coarseF, "vec_id").localCheckpoint(false))
    val centS = Similarity.refinedCentroids(standing, strideS, coarseS)
    val centF = Similarity.refinedCentroids(e, strideF, coarseF, routingOpt = routingF)

    // ONE keepRank assignment per grid serves that grid's corpus pass
    // (crank = 1) AND its query pass (crank <= NProbe, vec_id <
    // NQueries): assignment is per-vector against fixed centroids, so
    // the top-1 row of the probes=NProbe ranking IS the probes=1
    // assignment, and restricting to the query ids afterwards equals
    // assigning the query subset directly (per-id windows — the
    // shared-routing argument at coarseRouting). Checkpointed because
    // the r15 plan duplicated the whole assignment subtree (incl. the
    // grid's Lloyd refinement) once per consumer — ann + stats +
    // queries = 3 copies per grid (guide §2.4 share one pass; the
    // duplicate is shuffle-heavy: ranking windows over N rows).
    def assignedAll(cent: DataFrame, coarse: DataFrame,
        routing: Option[DataFrame]): DataFrame =
      Similarity.assignTwoLevel(e, cent, coarse, "vec_id",
          Dedup.IvfCoarseProbe, NProbe, keepRank = true, routingOpt = routing)
        .join(e, Seq("vec_id"))
        .select(col("vec_id"), col("cell"), col("crank"), col("v"), col("nrm"))

    // exact truth is consumed TWICE (once per graded() grid): without
    // its own checkpoint the |Q|·N brute scan and its window sort
    // re-execute per consumer (the multi-consumer relation rule the
    // `e` checkpoint above already documents). Query-sample-sized.
    val exactPlan = {
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      val c = e.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
      val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
      broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
        .withColumn("sim", cosine(expr("graft_array_dot(qv, cv)"), col("qn"), col("cn")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .select(col("query_id"), col("neighbor_id"), col("sim").as("exact_sim"))
    }

    // materialize the three independent relations (each grid's shared
    // assignment + the exact truth) as CONCURRENT eager-checkpoint
    // jobs: plan construction above is action-free (fused metadata),
    // so the branches overlap instead of queueing behind one driver
    // thread — at bench scale the op is stage-constant-bound, and the
    // final job then reads three tiny checkpointed relations
    val mats = Similarity.inParallel(Seq(
      () => assignedAll(centS, coarseS, routingS).localCheckpoint(),
      () => assignedAll(centF, coarseF, routingF).localCheckpoint(),
      () => exactPlan.localCheckpoint()))
    val (assignedS, assignedF, exact) = (mats(0), mats(1), mats(2))

    def graded(assigned: DataFrame, method: String): DataFrame = {
      // the merged index IS "assign the full corpus to the standing
      // centroids": standing vectors keep their cells, batch vectors
      // insert into their nearest existing cell
      val corpus = assigned.filter(col("crank") === 1)
        .select(col("vec_id").as("neighbor_id"), col("v").as("cv"),
          col("nrm").as("cn"), col("cell"))
      val queries = assigned
        .filter(col("crank") <= NProbe && col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("cell"))
      val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
      val ann = broadcast(queries).join(corpus, Seq("cell"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("sim", cosine(expr("graft_array_dot(qv, cv)"), col("qn"), col("cn")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .select(col("query_id"), col("neighbor_id"), col("sim").as("ann_sim"))
      // structure audit: cell count + hottest-cell population (the
      // drift signal batch accumulation degrades first)
      val stats = corpus.groupBy("cell").agg(count(lit(1)).as("cn"))
        .agg(count(lit(1)).as("n_cells"), max(col("cn")).as("max_cell_n"))
      exact.join(ann, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(
          count(lit(1)).as("k"),
          sum(when(col("ann_sim").isNotNull, 1L).otherwise(0L)).as("n_hits"),
          min(col("exact_sim")).as("exact_kth_sim"))
        .withColumn("recall_ppm", expr("n_hits * CAST(1000000 AS BIGINT) DIV k"))
        .withColumn("method", lit(method))
        .crossJoin(broadcast(stats))
        .select("method", "query_id", "k", "n_hits", "recall_ppm", "exact_kth_sim",
          "n_cells", "max_cell_n")
    }

    graded(assignedS, "merged")
      .unionByName(graded(assignedF, "rebuilt"))
      .orderBy("method", "query_id")
  }

  // ---------------------------------------------------------------
  // sim_index_drift — the CUMULATIVE version of sim_index_merge
  // (r13, VERDICT r12 item 6): sim_index_merge grades ONE merge
  // against ONE rebuild; the production question is what K
  // successive batch merges do to a never-re-Lloyd'd index. The
  // corpus is sliced vec_id % (K+1); the standing grid is trained on
  // slice 0 only; at step t the index serves slices 0..t — batches
  // 1..t union-merged in, each vector assigned to its nearest
  // ORIGINAL cell (with fixed centroids, cumulative insertion ≡ one
  // assignment of the step-t corpus, so the op computes each step's
  // index in one pass without pretending otherwise). Per step it
  // emits the merged index's aggregate recall@K vs exact truth over
  // the step-t corpus, beside the same-step REBUILT grid's — one row
  // per (step, method), so the gated table IS the drift curve an
  // operator reads to pick the re-Lloyd trigger (the step where
  // merged recall_ppm crosses below the rebuilt floor, with
  // max_cell_n as the leading structural indicator: cells sized for
  // N/(K+1) vectors absorb the whole corpus by step K).
  //
  // Scale shape: same as sim_index_merge — all assignments
  // two-level, exact truth |Q|·N over the bounded query sample per
  // step, aggregates step-grain. K+1 grids ≈ (K+1)× the merge op's
  // staging cost, K compile-time bounded.
  // ---------------------------------------------------------------
  private val DriftSteps = 3 // slices: vec_id % (DriftSteps+1)

  private def indexDrift(s: SparkSession, dir: String): DataFrame = {
    val mod = DriftSteps + 1
    val e = Dedup.withNorm(Tables.load(s, dir, "embeddings"))
      .select("vec_id", "v", "nrm").localCheckpoint(false)
    // grid-size metadata in TWO jobs instead of eight (r16): one
    // per-slice count job derives every grid's stride on the driver,
    // one conditional-sum job derives every grid's fine-seed count
    // (coarseSeeds ran one count action per grid — at bench scale the
    // K+1 grids' sequential metadata jobs were the critical path, not
    // the data; guide §1.2/§2.6). Values are identical by definition:
    // |slice<=t| = Σ sliceCnt(0..t), and each k0 sum counts exactly
    // the rows the per-grid filter counted.
    val sliceCnt: Map[Int, Long] =
      e.groupBy((col("vec_id") % mod).cast("int").as("cs")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    def cumCount(t: Int): Long = (0 to t).map(sliceCnt.getOrElse(_, 0L)).sum
    val stride0 = math.ceil(math.sqrt(cumCount(0).toDouble)).toLong
    val strideT: Map[Int, Long] = (1 to DriftSteps)
      .map(t => t -> math.ceil(math.sqrt(cumCount(t).toDouble)).toLong).toMap
    val (k00, k0T) = {
      val aggs =
        sum(when(col("vec_id") % mod === 0 &&
          col("vec_id") % stride0 === 0, 1L).otherwise(0L)).as("k00") +:
        (1 to DriftSteps).map(t =>
          sum(when(col("vec_id") % mod <= t &&
            col("vec_id") % strideT(t) === 0, 1L).otherwise(0L)).as(s"k0$t"))
      val r = e.agg(aggs.head, aggs.tail: _*).head()
      def lng(i: Int): Long = if (r.isNullAt(i)) 0L else r.getLong(i)
      (lng(0), (1 to DriftSteps).map(t => t -> lng(t)).toMap)
    }
    val c0 = e.filter(col("vec_id") % mod === 0)
    val coarse0 = Similarity.coarseSeedsFromCount(c0, stride0, k00)
    val cent0 = Similarity.refinedCentroids(c0, stride0, coarse0)
    // ONE full-corpus routing against the frozen coarse0 serves every
    // merged step's corpus + query passes (step-t corpora are filters
    // of e; the routing is per-vector and pass-independent)
    // routing0 has exactly one consumer now (the shared merged
    // assignment below) — no checkpoint needed
    val routing0 = Some(Similarity.coarseRouting(e, coarse0, "vec_id"))
    // ONE full-corpus ASSIGNMENT against the frozen grid serves every
    // merged step's corpus AND query passes (r16, VERDICT item 1):
    // assignment is per-vector against fixed (cent0, coarse0) via the
    // fixed routing0, so the step-t corpus assignment ≡ this relation
    // filtered to slice <= t at crank = 1, and the step-t query pass ≡
    // crank <= NProbe at vec_id < NQueries (per-id ranking windows —
    // dropping other ids' rows cannot move any surviving row; the
    // shared-routing argument at Similarity.coarseRouting). The r15
    // plan rebuilt this subtree per consumer: 3 steps × (ann + stats)
    // + 3 query passes ≈ 9 copies of the N-scale ranking chain
    // (guide §2.4 — share one pass; §1.2 — fix the algorithm first).
    val mergedAllPlan = Similarity.assignTwoLevel(e, cent0, coarse0, "vec_id",
        Dedup.IvfCoarseProbe, NProbe, keepRank = true, routingOpt = routing0)
      .join(e, Seq("vec_id"))
      .select(col("vec_id"), col("cell"), col("crank"), col("v"), col("nrm"))

    // ONE materialized Q×N exact ranking serves every step's truth
    // (r13 VERDICT item 4 — the per-step brute scans were 3 redundant
    // |Q_t|·|C_t| passes in BOTH engines). Step-t corpora are filters
    // of e, and filtering a per-query ranking preserves relative
    // order, so the step-t top-K is exactly the rows with slice <= t
    // whose CUMULATIVE count of slice<=t rows in full-ranking order
    // is <= K: one |Q|·N dot pass + one window carrying DriftSteps
    // running sums. cnt1 <= cnt2 <= ... pointwise (each counts a
    // superset of slices), so any row a step can select has
    // cnt1 <= K — the trim keeps the checkpoint at ~2K rows/query
    // instead of N while remaining lossless for every step.
    val exactAllPlan = {
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      val c = e.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
      val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cums = (1 to DriftSteps).map { t =>
        sum(when(col("neighbor_id") % mod <= t, 1L).otherwise(0L)).over(w).as(s"cnt$t")
      }
      broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
        .withColumn("sim", cosine(expr("graft_array_dot(qv, cv)"), col("qn"), col("cn")))
        .select(Seq(col("query_id"), col("neighbor_id")) ++ cums: _*)
        .filter(col("cnt1") <= K)
    }

    // the rebuilt grid for step t, re-trained from scratch on the
    // step-t corpus (stride + seed count from the two fused metadata
    // jobs above — plan construction is action-free); routingT is
    // LAZY-checkpointed: centT's seed pass and the assignment's base
    // both read it inside this branch's one materialization job
    def rebuiltPlan(t: Int): DataFrame = {
      val ct = e.filter(col("vec_id") % mod <= t)
      val coarseT = Similarity.coarseSeedsFromCount(ct, strideT(t), k0T(t))
      val routingT = Some(
        Similarity.coarseRouting(ct, coarseT, "vec_id").localCheckpoint(false))
      val centT = Similarity.refinedCentroids(ct, strideT(t), coarseT,
        routingOpt = routingT)
      Similarity.assignTwoLevel(ct, centT, coarseT, "vec_id",
          Dedup.IvfCoarseProbe, NProbe, keepRank = true, routingOpt = routingT)
        .join(e, Seq("vec_id"))
        .select(col("vec_id"), col("cell"), col("crank"), col("v"), col("nrm"))
    }

    // materialize the five independent relations (merged assignment,
    // exact truth, K rebuilt assignments) as CONCURRENT eager-
    // checkpoint jobs (guide §2.6): at bench scale the op is stage-
    // constant-bound, so overlapping the branches — instead of one
    // driver thread queueing ~30 stages per branch — is the wall-
    // clock lever; at 100 TB each branch is one linear pass either way
    val mats = Similarity.inParallel(
      Seq(() => mergedAllPlan.localCheckpoint(),
          () => exactAllPlan.localCheckpoint()) ++
        (1 to DriftSteps).map(t => () => rebuiltPlan(t).localCheckpoint()))
    val mergedAll = mats(0)
    val exactAll = mats(1)
    val rebuiltAll: Map[Int, DataFrame] =
      (1 to DriftSteps).map(t => t -> mats(1 + t)).toMap

    def exactAt(t: Int): DataFrame =
      exactAll.filter(col("query_id") % mod <= t &&
          col("neighbor_id") % mod <= t && col(s"cnt$t") <= K)
        .select("query_id", "neighbor_id")

    def stepRows(t: Int): DataFrame = {
      val exact = exactAt(t)
      def gradedAgg(assigned: DataFrame, method: String): DataFrame = {
        val corpus = assigned.filter(col("crank") === 1)
          .select(col("vec_id").as("neighbor_id"), col("v").as("cv"),
            col("nrm").as("cn"), col("cell"))
        val queries = assigned
          .filter(col("crank") <= NProbe && col("vec_id") < NQueries)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qn"), col("cell"))
        val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
        val ann = broadcast(queries).join(corpus, Seq("cell"))
          .filter(col("query_id") =!= col("neighbor_id"))
          .withColumn("sim", cosine(expr("graft_array_dot(qv, cv)"), col("qn"), col("cn")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= K)
          .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
        val stats = corpus.groupBy("cell").agg(count(lit(1)).as("cn"))
          .agg(count(lit(1)).as("n_cells"), max(col("cn")).as("max_cell_n"))
        exact.join(ann, Seq("query_id", "neighbor_id"), "left")
          .agg(
            countDistinct(col("query_id")).as("n_queries"),
            count(lit(1)).as("n_exact"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
          .withColumn("recall_ppm", expr("n_hits * CAST(1000000 AS BIGINT) DIV n_exact"))
          .withColumn("step", lit(t.toLong))
          .withColumn("method", lit(method))
          .crossJoin(broadcast(stats))
          .select("step", "method", "n_queries", "n_exact", "n_hits",
            "recall_ppm", "n_cells", "max_cell_n")
      }
      gradedAgg(mergedAll.filter(col("vec_id") % mod <= t), "merged")
        .unionByName(gradedAgg(rebuiltAll(t), "rebuilt"))
    }

    (1 to DriftSteps).map(stepRows).reduce(_ unionByName _)
      .orderBy("step", "method")
  }

  /** One Lloyd-refined grid as oracle CTEs: seeds/means from the
    * `srcFilter` subset of `n`, centroids published as `${pfx}centf`
    * and coarse routing seeds as `${pfx}coarse` — the (two-level,
    * r13) ivfCellsDuck derivation parameterized by training set.
    */
  private def gridDuck(pfx: String, srcFilter: String): String =
    s"""${pfx}src AS (SELECT * FROM n WHERE $srcFilter),
      |${pfx}st AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS stride FROM ${pfx}src),
      |${pfx}c0 AS (SELECT vec_id AS cid, v AS centv, nrm AS centn FROM ${pfx}src
      |            WHERE vec_id % (SELECT stride FROM ${pfx}st) = 0),
      |${pfx}cst AS (SELECT CAST(greatest(ceil(sqrt(count(*))), 1) AS BIGINT) AS cstride FROM ${pfx}c0),
      |${pfx}coarse AS (SELECT vec_id AS ccid, v AS cv0, nrm AS cn0 FROM ${pfx}src
      |  WHERE vec_id % ((SELECT stride FROM ${pfx}st) * (SELECT cstride FROM ${pfx}cst)) = 0),
      |${pfx}f2c0 AS (
      |  SELECT cid, centv, centn, ccid AS ccell FROM (
      |    SELECT f.cid, f.centv, f.centn, c.ccid,
      |      row_number() OVER (PARTITION BY f.cid
      |        ORDER BY round(list_dot_product(f.centv, c.cv0) / sqrt(f.centn * c.cn0), 4) DESC, c.ccid) AS fcr
      |    FROM ${pfx}c0 f CROSS JOIN ${pfx}coarse c) a
      |  WHERE fcr = 1),
      |${pfx}rt0 AS (
      |  SELECT vec_id, ccid AS ccell FROM (
      |    SELECT x.vec_id, c.ccid,
      |      row_number() OVER (PARTITION BY x.vec_id
      |        ORDER BY round(list_dot_product(x.v, c.cv0) / sqrt(x.nrm * c.cn0), 4) DESC, c.ccid) AS cr0
      |    FROM ${pfx}src x CROSS JOIN ${pfx}coarse c
      |    WHERE c.ccid IN (SELECT DISTINCT ccell FROM ${pfx}f2c0)) a
      |  WHERE cr0 <= ${Dedup.IvfCoarseProbe}),
      |${pfx}a0 AS (
      |  SELECT vec_id, cid AS cell FROM (
      |    SELECT x.vec_id, f.cid,
      |      row_number() OVER (PARTITION BY x.vec_id
      |        ORDER BY round(list_dot_product(x.v, f.centv) / sqrt(x.nrm * f.centn), 4) DESC, f.cid) AS cr
      |    FROM ${pfx}rt0 r JOIN ${pfx}src x ON r.vec_id = x.vec_id
      |    JOIN ${pfx}f2c0 f ON r.ccell = f.ccell) a
      |  WHERE cr = 1),
      |${pfx}px AS (
      |  SELECT cell, CAST(i AS INT) AS dim,
      |    CAST(floor(v[CAST(i + 1 AS INT)] * 1000000) AS BIGINT) AS v_ppm
      |  FROM (SELECT a.cell, x.v, unnest(range(0, len(x.v))) AS i
      |        FROM ${pfx}src x JOIN ${pfx}a0 a ON x.vec_id = a.vec_id) u),
      |${pfx}cs AS (SELECT cell, dim, count(*) AS nn, sum(v_ppm) AS s_ppm
      |             FROM ${pfx}px GROUP BY cell, dim),
      |${pfx}cent AS (
      |  SELECT cell AS cid,
      |    list(CAST(s_ppm AS DOUBLE) / 1000000 / nn ORDER BY dim) AS centv
      |  FROM ${pfx}cs GROUP BY cell),
      |${pfx}centf AS (SELECT cid, centv, list_dot_product(centv, centv) AS centn FROM ${pfx}cent)""".stripMargin

  /** Search + grade one grid: two-level corpus primary assignment,
    * nprobe=$NProbe query probe, top-K, recall vs `exact`,
    * structure stats.
    */
  private def gradedDuck(pfx: String, method: String): String =
    s"""${pfx}f2c AS (
      |  SELECT cid, centv, centn, ccid AS ccell FROM (
      |    SELECT f.cid, f.centv, f.centn, c.ccid,
      |      row_number() OVER (PARTITION BY f.cid
      |        ORDER BY round(list_dot_product(f.centv, c.cv0) / sqrt(f.centn * c.cn0), 4) DESC, c.ccid) AS fcr
      |    FROM ${pfx}centf f CROSS JOIN ${pfx}coarse c) a
      |  WHERE fcr = 1),
      |${pfx}rt AS (
      |  SELECT vec_id, ccid AS ccell FROM (
      |    SELECT x.vec_id, c.ccid,
      |      row_number() OVER (PARTITION BY x.vec_id
      |        ORDER BY round(list_dot_product(x.v, c.cv0) / sqrt(x.nrm * c.cn0), 4) DESC, c.ccid) AS cr0
      |    FROM n x CROSS JOIN ${pfx}coarse c
      |    WHERE c.ccid IN (SELECT DISTINCT ccell FROM ${pfx}f2c)) a
      |  WHERE cr0 <= ${Dedup.IvfCoarseProbe}),
      |${pfx}ar AS MATERIALIZED (
      |  SELECT x.vec_id, x.v, x.nrm, f.cid,
      |    row_number() OVER (PARTITION BY x.vec_id
      |      ORDER BY round(list_dot_product(x.v, f.centv) / sqrt(x.nrm * f.centn), 4) DESC, f.cid) AS cr
      |  FROM ${pfx}rt r JOIN n x ON r.vec_id = x.vec_id
      |  JOIN ${pfx}f2c f ON r.ccell = f.ccell),
      |${pfx}corpus AS (
      |  SELECT vec_id AS neighbor_id, v, nrm, cid AS cell FROM ${pfx}ar WHERE cr = 1),
      |${pfx}q AS (
      |  SELECT vec_id AS query_id, v, nrm, cid AS cell FROM ${pfx}ar
      |  WHERE cr <= $NProbe AND vec_id < $NQueries),
      |${pfx}p AS (SELECT q.query_id, t.neighbor_id,
      |         round(list_dot_product(q.v, t.v) / sqrt(q.nrm * t.nrm), 4) AS sim
      |       FROM ${pfx}q q JOIN ${pfx}corpus t
      |         ON q.cell = t.cell AND q.query_id <> t.neighbor_id),
      |${pfx}ann AS (SELECT query_id, neighbor_id, sim AS ann_sim FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
      |  FROM ${pfx}p) t WHERE rank <= $K),
      |${pfx}stats AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_cells, CAST(max(cnt) AS BIGINT) AS max_cell_n
      |  FROM (SELECT cell, count(*) AS cnt FROM ${pfx}corpus GROUP BY 1) c),
      |${pfx}rec AS (
      |  SELECT '$method' AS method, exact.query_id, count(*) AS k,
      |    CAST(sum(CASE WHEN a.ann_sim IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
      |    CAST(sum(CASE WHEN a.ann_sim IS NOT NULL THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS recall_ppm,
      |    min(exact.exact_sim) AS exact_kth_sim
      |  FROM exact LEFT JOIN ${pfx}ann a
      |    ON exact.query_id = a.query_id AND exact.neighbor_id = a.neighbor_id
      |  GROUP BY exact.query_id)""".stripMargin

  private val indexMergeSql =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |n AS MATERIALIZED (SELECT vec_id, v, list_dot_product(v, v) AS nrm FROM e),
      |${gridDuck("s", s"vec_id % $BatchMod <> ${BatchMod - 1}")},
      |${gridDuck("f", "TRUE")},
      |bp AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |         round(list_dot_product(q.v, c.v) / sqrt(q.nrm * c.nrm), 4) AS sim
      |       FROM n q JOIN n c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id),
      |exact AS MATERIALIZED (SELECT query_id, neighbor_id, sim AS exact_sim FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
      |  FROM bp) t WHERE rank <= $K),
      |${gradedDuck("s", "merged")},
      |${gradedDuck("f", "rebuilt")}
      |SELECT method, query_id, k, n_hits, recall_ppm, exact_kth_sim, n_cells, max_cell_n
      |FROM (
      |  SELECT r.*, s.n_cells, s.max_cell_n FROM srec r CROSS JOIN sstats s
      |  UNION ALL
      |  SELECT r.*, s.n_cells, s.max_cell_n FROM frec r CROSS JOIN fstats s) u
      |ORDER BY method, query_id""".stripMargin

  /** Drift-step oracle: two-level search of the step-`t` corpus
    * (vec_id % mod <= t) against grid `g`'s centroids, aggregated to
    * the one (step, method) row — the per-step twin of
    * [[gradedDuck]], joined to the step's own exact truth `ex$t`.
    */
  private def driftGradedDuck(g: String, o: String, t: Int, method: String): String = {
    val mod = DriftSteps + 1
    s"""${o}f2c AS (
      |  SELECT cid, centv, centn, ccid AS ccell FROM (
      |    SELECT f.cid, f.centv, f.centn, c.ccid,
      |      row_number() OVER (PARTITION BY f.cid
      |        ORDER BY round(list_dot_product(f.centv, c.cv0) / sqrt(f.centn * c.cn0), 4) DESC, c.ccid) AS fcr
      |    FROM ${g}centf f CROSS JOIN ${g}coarse c) a
      |  WHERE fcr = 1),
      |${o}rt AS (
      |  SELECT vec_id, ccid AS ccell FROM (
      |    SELECT x.vec_id, c.ccid,
      |      row_number() OVER (PARTITION BY x.vec_id
      |        ORDER BY round(list_dot_product(x.v, c.cv0) / sqrt(x.nrm * c.cn0), 4) DESC, c.ccid) AS cr0
      |    FROM n x CROSS JOIN ${g}coarse c
      |    WHERE c.ccid IN (SELECT DISTINCT ccell FROM ${o}f2c)
      |      AND x.vec_id % $mod <= $t) a
      |  WHERE cr0 <= ${Dedup.IvfCoarseProbe}),
      |${o}ar AS MATERIALIZED (
      |  SELECT x.vec_id, x.v, x.nrm, f.cid,
      |    row_number() OVER (PARTITION BY x.vec_id
      |      ORDER BY round(list_dot_product(x.v, f.centv) / sqrt(x.nrm * f.centn), 4) DESC, f.cid) AS cr
      |  FROM ${o}rt r JOIN n x ON r.vec_id = x.vec_id
      |  JOIN ${o}f2c f ON r.ccell = f.ccell),
      |${o}corpus AS (
      |  SELECT vec_id AS neighbor_id, v, nrm, cid AS cell FROM ${o}ar WHERE cr = 1),
      |${o}q AS (
      |  SELECT vec_id AS query_id, v, nrm, cid AS cell FROM ${o}ar
      |  WHERE cr <= $NProbe AND vec_id < $NQueries),
      |${o}p AS (SELECT q.query_id, t.neighbor_id,
      |      round(list_dot_product(q.v, t.v) / sqrt(q.nrm * t.nrm), 4) AS sim
      |    FROM ${o}q q JOIN ${o}corpus t ON q.cell = t.cell AND q.query_id <> t.neighbor_id),
      |${o}ann AS (SELECT query_id, neighbor_id FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
      |  FROM ${o}p) z WHERE rank <= $K),
      |${o}stats AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_cells, CAST(max(cnt) AS BIGINT) AS max_cell_n
      |  FROM (SELECT cell, count(*) AS cnt FROM ${o}corpus GROUP BY 1) c),
      |${o}row AS (
      |  SELECT CAST($t AS BIGINT) AS step, '$method' AS method,
      |    CAST(count(DISTINCT x.query_id) AS BIGINT) AS n_queries,
      |    CAST(count(*) AS BIGINT) AS n_exact,
      |    CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
      |    CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS recall_ppm,
      |    s.n_cells, s.max_cell_n
      |  FROM ex$t x LEFT JOIN ${o}ann a
      |    ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id
      |  CROSS JOIN ${o}stats s
      |  GROUP BY s.n_cells, s.max_cell_n)""".stripMargin
  }

  private val indexDriftSql = {
    val mod = DriftSteps + 1
    val grids = (1 to DriftSteps)
      .map(t => gridDuck(s"r$t", s"vec_id % $mod <= $t")).mkString(",\n")
    // ONE materialized Q×N ranking serves every step's truth (the
    // Spark twin's exactAll): cnt$t = cumulative count of slice<=t
    // neighbors in full-ranking order ≡ the rank the neighbor would
    // hold in the step-t-restricted ranking, because filtering a
    // per-query ordering preserves relative order. The cnt1<=K trim
    // is lossless (cnt1 <= cnt$t pointwise, each counts a superset).
    val cumCols = (1 to DriftSteps).map { t =>
      s"sum(CASE WHEN cs <= $t THEN 1 ELSE 0 END) OVER w AS cnt$t"
    }.mkString(",\n      ")
    val exacts = Seq(
      s"""allp AS MATERIALIZED (
        |  SELECT query_id, neighbor_id, cs, ${(1 to DriftSteps).map(t => s"cnt$t").mkString(", ")} FROM (
        |    SELECT query_id, neighbor_id, cs,
        |      $cumCols
        |    FROM (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |            c.vec_id % $mod AS cs,
        |            round(list_dot_product(q.v, c.v) / sqrt(q.nrm * c.nrm), 4) AS sim
        |          FROM n q JOIN n c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id) p
        |    WINDOW w AS (PARTITION BY query_id ORDER BY sim DESC, neighbor_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) z
        |  WHERE cnt1 <= $K)""".stripMargin) ++ (1 to DriftSteps).map { t =>
      s"""ex$t AS (SELECT query_id, neighbor_id FROM allp
        |  WHERE query_id % $mod <= $t AND cs <= $t AND cnt$t <= $K)""".stripMargin
    }
    val exactsSql = exacts.mkString(",\n")
    val gradeds = (1 to DriftSteps).flatMap { t =>
      Seq(driftGradedDuck("d0", s"m$t", t, "merged"),
        driftGradedDuck(s"r$t", s"b$t", t, "rebuilt"))
    }.mkString(",\n")
    val unions = (1 to DriftSteps)
      .flatMap(t => Seq(s"SELECT * FROM m${t}row", s"SELECT * FROM b${t}row"))
      .mkString("\n      UNION ALL ")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |n AS MATERIALIZED (SELECT vec_id, v, list_dot_product(v, v) AS nrm FROM e),
      |${gridDuck("d0", s"vec_id % $mod = 0")},
      |$grids,
      |$exactsSql,
      |$gradeds
      |SELECT step, method, n_queries, n_exact, n_hits, recall_ppm, n_cells, max_cell_n
      |FROM ($unions) u
      |ORDER BY step, method""".stripMargin
  }

  val ops: Seq[Op] = Seq(
    Op("sim_index_merge", indexMerge, Some(indexMergeSql)),
    Op("sim_index_drift", indexDrift, Some(indexDriftSql)))
}
