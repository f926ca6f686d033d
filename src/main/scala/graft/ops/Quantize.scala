package graft.ops

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Product quantization — the compressed-embedding storage path of a
  * billion-vector ANN system (IVF-PQ): the 64-dim float vector splits
  * into M = 8 subspaces of 8 dims; each subspace gets a Ks = 16-entry
  * codebook, and a vector is stored as 8 four-bit codes (4 bytes vs
  * 256 for float32 — 64× compression; at 100 TB of embeddings the
  * code table fits where the vectors never would). Search is the real
  * IVF-PQ shape (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011): asymmetric distance computation
  * (ADC) — per query, precompute the 8×16 table of query-subvector →
  * codeword distances so every corpus vector's approximate distance
  * is 8 integer lookups — produces a `Shortlist`-candidate pool, and
  * an exact-distance RE-RANK over only those candidates yields the
  * final top-k (compression bounds ADC accuracy; the re-rank touches
  * `Shortlist` full vectors per query instead of N).
  *
  * Two registered ops share the machinery:
  *  - `emb_pq` — flat PQ: ADC scans the whole code table (the
  *    baseline; L2 over raw vectors).
  *  - `sim_ivf_pq` — the full IVF-PQ composition every billion-scale
  *    system ships: vectors L2-NORMALIZED first (unit vectors make
  *    L2² = 2 − 2·cos, so the L2 machinery ranks exactly like
  *    cosine — the standard embedding-search setup), bucketed into
  *    k = √N Lloyd-refined IVF cells, and the ADC scan touches ONLY
  *    the nprobe = 4 probed cells per query — N·(nprobe/k) of the
  *    code table instead of all of it — before the same exact
  *    re-rank.
  *
  * Codebooks are seeded by stride-sampled subvectors (the sim_ivf
  * seeding trick) then refined by ONE deterministic Lloyd iteration
  * over a 1-in-`TrainStride` sample, in exact integer-ppm component
  * means — the same quantization emb_label_centroid hash-gates, so
  * both engines reproduce the refined codewords bit-for-bit. Every
  * distance is floored to integer micro units BEFORE any comparison
  * or sum (floor of a double is midpoint-free on both engines, and
  * BIGINT sums are exact — SURVEY §5), so encode argmin, cell
  * assignment, the ADC sums, the shortlist cut and the final ranking
  * all replicate in DuckDB. Normalization (x / √(v·v)) is plain IEEE
  * double arithmetic — bit-identical cross-engine, like every dot
  * product both engines already agree on.
  *
  * Scale shape: encode is a broadcast join (codebook: M·Ks = 128
  * rows) against the exploded corpus — N·M·Ks distance rows, linear
  * in N, map-side only; the Lloyd pass is a posexplode + partial
  * aggregation collapsing to M·Ks·SubDim rows. ADC joins the N·M
  * code stream to a broadcast LUT and partial-aggregates the
  * per-pair sums map-side before the single shuffle on
  * (query, neighbor); in sim_ivf_pq the join key gains the cell id,
  * so the stream prunes to the probed cells. The re-rank broadcasts
  * the queries·Shortlist candidate ids against the corpus scan — the
  * corpus is never shuffled.
  */
object Quantize {

  private val M = 8          // subspaces
  private val SubDim = 8     // dims per subspace (64-dim embeddings)
  private val Ks = 16        // codes per subspace → 4-bit codes
  private val TrainStride = 2 // Lloyd trains on every 2nd vector
  private val NQueries = 20
  private val Shortlist = 100 // ADC candidate pool per query
  private val TopK = 5
  private val NProbe = 4     // probed IVF cells per query (sim_ivf_pq)

  // L2² in integer micro units via the dot-product expansion — the
  // same graft_array_dot / list_dot_product kernels both engines
  // already agree on bit-for-bit: (a − b)² = a·a − 2a·b + b·b.
  private def l2Micro(a: String, b: String) =
    s"CAST(floor((graft_array_dot($a, $a) - 2 * graft_array_dot($a, $b) + graft_array_dot($b, $b)) * 1000000) AS BIGINT)"

  /** (vec_id, m, sub): the M subvectors of every vector. */
  private def subspaces(e: DataFrame): DataFrame =
    e.withColumn("m", explode(expr(s"sequence(0, ${M - 1})")))
      .select(col("vec_id"), col("m"), expr(s"slice(v, m * $SubDim + 1, $SubDim)").as("sub"))

  // encode: per (vector, subspace) argmin over the broadcast
  // codebook — min(struct(dmicro, code)) instead of a row_number
  // window: the N·M·Ks distance rows collapse map-side (partial
  // agg) to N·M before the shuffle, and nothing is sorted. Tie →
  // lowest code, identical to the oracle's ORDER BY dmicro, code.
  private def encodeAgainst(vs: DataFrame, cb: DataFrame): DataFrame =
    vs.join(broadcast(cb), Seq("m"))
      .withColumn("dmicro", expr(l2Micro("sub", "cw")))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("dmicro"), col("code"))).as("mc"))
      .select(col("vec_id"), col("m"), col("mc.code").as("code"))

  /** Refined PQ codebook for `e`: stride-seeded, one ppm-Lloyd pass
    * over the 1-in-TrainStride sample (the standard PQ train/encode
    * split — the seed assignment never touches the full corpus).
    */
  private def refinedPqCodebook(e: DataFrame, subs: DataFrame, stride: Long): DataFrame = {
    val cb0 = e.filter(col("vec_id") % stride === 0 && col("vec_id") < Ks * stride)
      .select(expr(s"CAST(vec_id DIV $stride AS INT)").as("code"), col("v"))
      .withColumn("m", explode(expr(s"sequence(0, ${M - 1})")))
      .select(col("code"), col("m"), expr(s"slice(v, m * $SubDim + 1, $SubDim)").as("cw"))
    val train = subs.filter(col("vec_id") % TrainStride === 0)
    train.join(encodeAgainst(train, cb0), Seq("vec_id", "m"))
      .select(col("m"), col("code"), posexplode(col("sub")).as(Seq("dim", "x")))
      .select(col("m"), col("code"), col("dim"),
        expr("CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)").as("v_ppm"))
      .groupBy("m", "code", "dim")
      .agg(count(lit(1)).as("n"), sum(col("v_ppm")).as("s_ppm"))
      .withColumn("comp", col("s_ppm").cast("double") / 1000000.0 / col("n"))
      .groupBy("m", "code")
      .agg(collect_list(struct(col("dim"), col("comp"))).as("cc"))
      .select(col("m"), col("code"), expr("transform(array_sort(cc), s -> s.comp)").as("cw"))
  }

  /** ADC LUT for the first NQueries vectors against `cb`. */
  private def queryLut(subs: DataFrame, cb: DataFrame): DataFrame =
    subs.filter(col("vec_id") < NQueries)
      .withColumnRenamed("vec_id", "query_id")
      .join(broadcast(cb), Seq("m"))
      .select(col("query_id"), col("m"), col("code"), expr(l2Micro("sub", "cw")).as("qd"))

  /** Exact re-rank of the (query_id, neighbor_id, adist_micro)
    * shortlist: broadcast the queries·Shortlist candidate set against
    * the corpus scan (corpus never shuffles).
    */
  private def exactRerank(e: DataFrame, shortlist: DataFrame): DataFrame = {
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val cand = shortlist.join(broadcast(q), Seq("query_id"))
    val wR = Window.partitionBy("query_id").orderBy(col("d2_micro"), col("neighbor_id"))
    e.select(col("vec_id").as("neighbor_id"), col("v").as("cv"))
      .join(broadcast(cand), Seq("neighbor_id"))
      .withColumn("d2_micro", expr(l2Micro("qv", "cv")))
      .withColumn("rank", row_number().over(wR))
      .filter(col("rank") <= TopK)
      .select("query_id", "rank", "neighbor_id", "d2_micro", "adist_micro")
      .orderBy("query_id", "rank")
  }

  // ---------------------------------------------------------------
  // emb_pq — flat PQ over raw vectors.
  // ---------------------------------------------------------------
  private def pqTopK(s: SparkSession, dir: String): DataFrame = {
    val e = Dedup.withNorm(Tables.load(s, dir, "embeddings")).select("vec_id", "v")
    val stride = math.ceil(e.count().toDouble / Ks).toLong
    val subs = subspaces(e)
    val cb = refinedPqCodebook(e, subs, stride)
    val codes = encodeAgainst(subs, cb).withColumnRenamed("vec_id", "neighbor_id")
    val lut = queryLut(subs, cb)
    val wS = Window.partitionBy("query_id").orderBy(col("adist_micro"), col("neighbor_id"))
    val shortlist = codes.join(broadcast(lut), Seq("m", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("qd")).as("adist_micro"))
      .withColumn("srank", row_number().over(wS))
      .filter(col("srank") <= Shortlist)
      .select("query_id", "neighbor_id", "adist_micro")
    exactRerank(e, shortlist)
  }

  // ---------------------------------------------------------------
  // sim_ivf_pq — IVF cells + PQ codes + exact re-rank over
  // L2-normalized vectors (≡ cosine ranking).
  // ---------------------------------------------------------------
  private def ivfPqTopK(s: SparkSession, dir: String): DataFrame = {
    val e = Dedup.withNorm(Tables.load(s, dir, "embeddings"))
      .select(col("vec_id"), expr("transform(v, x -> x / sqrt(nrm))").as("v"))
    val n = e.count()
    val kStride = math.ceil(math.sqrt(n.toDouble)).toLong // k = √N cells
    val pqStride = math.ceil(n.toDouble / Ks).toLong

    // IVF: stride seeds → L2-micro argmin assignment → one ppm-Lloyd
    // pass → final assignment (corpus nprobe=1, queries nprobe=2)
    val cent0 = e.filter(col("vec_id") % kStride === 0)
      .select(col("vec_id").as("cid"), col("v").as("centv"))
    def assign(vs: DataFrame, cent: DataFrame, probes: Int): DataFrame = {
      val scored = vs.join(broadcast(cent), lit(true))
        .withColumn("cmicro", expr(l2Micro("v", "centv")))
      if (probes == 1)
        scored.groupBy("vec_id").agg(min(struct(col("cmicro"), col("cid"))).as("mc"))
          .select(col("vec_id"), col("mc.cid").as("cell"))
      else {
        val w = Window.partitionBy("vec_id").orderBy(col("cmicro"), col("cid"))
        scored.withColumn("r", row_number().over(w)).filter(col("r") <= probes)
          .select(col("vec_id"), col("cid").as("cell"))
      }
    }
    val cent = e.join(assign(e, cent0, 1), "vec_id")
      .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
      .select(col("cell"), col("dim"),
        expr("CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)").as("v_ppm"))
      .groupBy("cell", "dim")
      .agg(count(lit(1)).as("cn"), sum(col("v_ppm")).as("s_ppm"))
      .withColumn("comp", col("s_ppm").cast("double") / 1000000.0 / col("cn"))
      .groupBy("cell")
      .agg(collect_list(struct(col("dim"), col("comp"))).as("cc"))
      .select(col("cell").as("cid"), expr("transform(array_sort(cc), s -> s.comp)").as("centv"))
    val corpusCell = assign(e, cent, 1)
    val queryCell = assign(e.filter(col("vec_id") < NQueries), cent, NProbe)
      .withColumnRenamed("vec_id", "query_id")

    // PQ on the same normalized vectors; ADC join keyed by cell too,
    // so only probed cells' codes ever match the LUT
    val subs = subspaces(e)
    val cb = refinedPqCodebook(e, subs, pqStride)
    val codesCell = encodeAgainst(subs, cb).join(corpusCell, "vec_id")
      .select(col("vec_id").as("neighbor_id"), col("cell"), col("m"), col("code"))
    val lutCell = queryLut(subs, cb).join(broadcast(queryCell), Seq("query_id"))
      .select(col("query_id"), col("cell"), col("m"), col("code"), col("qd"))
    val wS = Window.partitionBy("query_id").orderBy(col("adist_micro"), col("neighbor_id"))
    val shortlist = codesCell.join(broadcast(lutCell), Seq("cell", "m", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("qd")).as("adist_micro"))
      .withColumn("srank", row_number().over(wS))
      .filter(col("srank") <= Shortlist)
      .select("query_id", "neighbor_id", "adist_micro")
    exactRerank(e, shortlist)
  }

  private val pqSql =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |cnt AS (SELECT CAST(ceil(CAST(count(*) AS DOUBLE) / $Ks) AS BIGINT) AS stride FROM e),
      |ms AS (SELECT CAST(unnest(range(0, $M)) AS INT) AS m),
      |sub AS (
      |  SELECT vec_id, m, list_slice(v, m * $SubDim + 1, m * $SubDim + $SubDim) AS sub
      |  FROM e, ms),
      |cb0 AS (
      |  SELECT CAST(vec_id // (SELECT stride FROM cnt) AS INT) AS code, m,
      |    list_slice(v, m * $SubDim + 1, m * $SubDim + $SubDim) AS cw
      |  FROM e, ms
      |  WHERE vec_id % (SELECT stride FROM cnt) = 0
      |    AND vec_id < $Ks * (SELECT stride FROM cnt)),
      |d0 AS (
      |  SELECT s.vec_id, s.m, c.code,
      |    CAST(floor((list_dot_product(s.sub, s.sub) - 2 * list_dot_product(s.sub, c.cw)
      |      + list_dot_product(c.cw, c.cw)) * 1000000) AS BIGINT) AS dmicro
      |  FROM sub s JOIN cb0 c ON s.m = c.m
      |  WHERE s.vec_id % $TrainStride = 0),
      |a0 AS (
      |  SELECT vec_id, m, code FROM (
      |    SELECT vec_id, m, code,
      |      row_number() OVER (PARTITION BY vec_id, m ORDER BY dmicro, code) AS r
      |    FROM d0) x
      |  WHERE r = 1),
      |px AS (
      |  SELECT m, code, CAST(i AS INT) AS dim,
      |    CAST(floor(sub[CAST(i + 1 AS INT)] * 1000000) AS BIGINT) AS v_ppm
      |  FROM (SELECT a.m, a.code, s.sub, unnest(range(0, len(s.sub))) AS i
      |        FROM sub s JOIN a0 a ON s.vec_id = a.vec_id AND s.m = a.m) u),
      |cs AS (SELECT m, code, dim, count(*) AS nn, sum(v_ppm) AS s_ppm FROM px GROUP BY m, code, dim),
      |cb AS (
      |  SELECT m, code, list(CAST(s_ppm AS DOUBLE) / 1000000 / nn ORDER BY dim) AS cw
      |  FROM cs GROUP BY m, code),
      |d1 AS (
      |  SELECT s.vec_id, s.m, c.code,
      |    CAST(floor((list_dot_product(s.sub, s.sub) - 2 * list_dot_product(s.sub, c.cw)
      |      + list_dot_product(c.cw, c.cw)) * 1000000) AS BIGINT) AS dmicro
      |  FROM sub s JOIN cb c ON s.m = c.m),
      |enc AS (
      |  SELECT vec_id AS neighbor_id, m, code FROM (
      |    SELECT vec_id, m, code,
      |      row_number() OVER (PARTITION BY vec_id, m ORDER BY dmicro, code) AS r
      |    FROM d1) x
      |  WHERE r = 1),
      |lut AS (SELECT vec_id AS query_id, m, code, dmicro AS qd
      |        FROM d1 WHERE vec_id < $NQueries),
      |adc AS (
      |  SELECT l.query_id, t.neighbor_id, CAST(sum(l.qd) AS BIGINT) AS adist_micro
      |  FROM enc t JOIN lut l ON t.m = l.m AND t.code = l.code
      |  WHERE l.query_id <> t.neighbor_id
      |  GROUP BY 1, 2),
      |sl AS (
      |  SELECT query_id, neighbor_id, adist_micro FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adist_micro, neighbor_id) AS srank
      |    FROM adc) x
      |  WHERE srank <= $Shortlist),
      |rr AS (
      |  SELECT sl.query_id, sl.neighbor_id, sl.adist_micro,
      |    CAST(floor((list_dot_product(q.v, q.v) - 2 * list_dot_product(q.v, c.v)
      |      + list_dot_product(c.v, c.v)) * 1000000) AS BIGINT) AS d2_micro
      |  FROM sl JOIN e q ON sl.query_id = q.vec_id JOIN e c ON sl.neighbor_id = c.vec_id),
      |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY d2_micro, neighbor_id) AS INT) AS rank
      |      FROM rr)
      |SELECT query_id, rank, neighbor_id, d2_micro, adist_micro FROM r WHERE rank <= $TopK
      |ORDER BY query_id, rank""".stripMargin

  private val ivfPqSql =
    s"""WITH e0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v0 FROM embeddings),
      |e AS (SELECT vec_id, list_transform(v0, x -> x / sqrt(list_dot_product(v0, v0))) AS v FROM e0),
      |cnt AS (SELECT count(*) AS n FROM e),
      |kst AS (SELECT CAST(ceil(sqrt(n)) AS BIGINT) AS st FROM cnt),
      |pst AS (SELECT CAST(ceil(CAST(n AS DOUBLE) / $Ks) AS BIGINT) AS st FROM cnt),
      |cent0 AS (SELECT vec_id AS cid, v AS centv FROM e WHERE vec_id % (SELECT st FROM kst) = 0),
      |ca0 AS (
      |  SELECT vec_id, cid AS cell FROM (
      |    SELECT x.vec_id, c.cid,
      |      row_number() OVER (PARTITION BY x.vec_id ORDER BY
      |        CAST(floor((list_dot_product(x.v, x.v) - 2 * list_dot_product(x.v, c.centv)
      |          + list_dot_product(c.centv, c.centv)) * 1000000) AS BIGINT), c.cid) AS r
      |    FROM e x CROSS JOIN cent0 c) a
      |  WHERE r = 1),
      |cpx AS (
      |  SELECT cell, CAST(i AS INT) AS dim,
      |    CAST(floor(v[CAST(i + 1 AS INT)] * 1000000) AS BIGINT) AS v_ppm
      |  FROM (SELECT ca0.cell, x.v, unnest(range(0, len(x.v))) AS i
      |        FROM e x JOIN ca0 ON x.vec_id = ca0.vec_id) u),
      |ccs AS (SELECT cell, dim, count(*) AS cn, sum(v_ppm) AS s_ppm FROM cpx GROUP BY cell, dim),
      |cent AS (
      |  SELECT cell AS cid, list(CAST(s_ppm AS DOUBLE) / 1000000 / cn ORDER BY dim) AS centv
      |  FROM ccs GROUP BY cell),
      |corpuscell AS (
      |  SELECT vec_id, cid AS cell FROM (
      |    SELECT x.vec_id, c.cid,
      |      row_number() OVER (PARTITION BY x.vec_id ORDER BY
      |        CAST(floor((list_dot_product(x.v, x.v) - 2 * list_dot_product(x.v, c.centv)
      |          + list_dot_product(c.centv, c.centv)) * 1000000) AS BIGINT), c.cid) AS r
      |    FROM e x CROSS JOIN cent c) a
      |  WHERE r = 1),
      |qcell AS (
      |  SELECT vec_id AS query_id, cid AS cell FROM (
      |    SELECT x.vec_id, c.cid,
      |      row_number() OVER (PARTITION BY x.vec_id ORDER BY
      |        CAST(floor((list_dot_product(x.v, x.v) - 2 * list_dot_product(x.v, c.centv)
      |          + list_dot_product(c.centv, c.centv)) * 1000000) AS BIGINT), c.cid) AS r
      |    FROM e x CROSS JOIN cent c WHERE x.vec_id < $NQueries) a
      |  WHERE r <= $NProbe),
      |ms AS (SELECT CAST(unnest(range(0, $M)) AS INT) AS m),
      |sub AS (
      |  SELECT vec_id, m, list_slice(v, m * $SubDim + 1, m * $SubDim + $SubDim) AS sub
      |  FROM e, ms),
      |cb0 AS (
      |  SELECT CAST(vec_id // (SELECT st FROM pst) AS INT) AS code, m,
      |    list_slice(v, m * $SubDim + 1, m * $SubDim + $SubDim) AS cw
      |  FROM e, ms
      |  WHERE vec_id % (SELECT st FROM pst) = 0
      |    AND vec_id < $Ks * (SELECT st FROM pst)),
      |d0 AS (
      |  SELECT s.vec_id, s.m, c.code,
      |    CAST(floor((list_dot_product(s.sub, s.sub) - 2 * list_dot_product(s.sub, c.cw)
      |      + list_dot_product(c.cw, c.cw)) * 1000000) AS BIGINT) AS dmicro
      |  FROM sub s JOIN cb0 c ON s.m = c.m
      |  WHERE s.vec_id % $TrainStride = 0),
      |a0 AS (
      |  SELECT vec_id, m, code FROM (
      |    SELECT vec_id, m, code,
      |      row_number() OVER (PARTITION BY vec_id, m ORDER BY dmicro, code) AS r
      |    FROM d0) x
      |  WHERE r = 1),
      |px AS (
      |  SELECT m, code, CAST(i AS INT) AS dim,
      |    CAST(floor(sub[CAST(i + 1 AS INT)] * 1000000) AS BIGINT) AS v_ppm
      |  FROM (SELECT a.m, a.code, s.sub, unnest(range(0, len(s.sub))) AS i
      |        FROM sub s JOIN a0 a ON s.vec_id = a.vec_id AND s.m = a.m) u),
      |cs AS (SELECT m, code, dim, count(*) AS nn, sum(v_ppm) AS s_ppm FROM px GROUP BY m, code, dim),
      |cb AS (
      |  SELECT m, code, list(CAST(s_ppm AS DOUBLE) / 1000000 / nn ORDER BY dim) AS cw
      |  FROM cs GROUP BY m, code),
      |d1 AS (
      |  SELECT s.vec_id, s.m, c.code,
      |    CAST(floor((list_dot_product(s.sub, s.sub) - 2 * list_dot_product(s.sub, c.cw)
      |      + list_dot_product(c.cw, c.cw)) * 1000000) AS BIGINT) AS dmicro
      |  FROM sub s JOIN cb c ON s.m = c.m),
      |enc AS (
      |  SELECT vec_id, m, code FROM (
      |    SELECT vec_id, m, code,
      |      row_number() OVER (PARTITION BY vec_id, m ORDER BY dmicro, code) AS r
      |    FROM d1) x
      |  WHERE r = 1),
      |encc AS (
      |  SELECT enc.vec_id AS neighbor_id, cc.cell, enc.m, enc.code
      |  FROM enc JOIN corpuscell cc ON enc.vec_id = cc.vec_id),
      |lutc AS (
      |  SELECT l.query_id, qc.cell, l.m, l.code, l.qd
      |  FROM (SELECT vec_id AS query_id, m, code, dmicro AS qd
      |        FROM d1 WHERE vec_id < $NQueries) l
      |  JOIN qcell qc ON l.query_id = qc.query_id),
      |adc AS (
      |  SELECT l.query_id, t.neighbor_id, CAST(sum(l.qd) AS BIGINT) AS adist_micro
      |  FROM encc t JOIN lutc l ON t.cell = l.cell AND t.m = l.m AND t.code = l.code
      |  WHERE l.query_id <> t.neighbor_id
      |  GROUP BY 1, 2),
      |sl AS (
      |  SELECT query_id, neighbor_id, adist_micro FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adist_micro, neighbor_id) AS srank
      |    FROM adc) x
      |  WHERE srank <= $Shortlist),
      |rr AS (
      |  SELECT sl.query_id, sl.neighbor_id, sl.adist_micro,
      |    CAST(floor((list_dot_product(q.v, q.v) - 2 * list_dot_product(q.v, c.v)
      |      + list_dot_product(c.v, c.v)) * 1000000) AS BIGINT) AS d2_micro
      |  FROM sl JOIN e q ON sl.query_id = q.vec_id JOIN e c ON sl.neighbor_id = c.vec_id),
      |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY d2_micro, neighbor_id) AS INT) AS rank
      |      FROM rr)
      |SELECT query_id, rank, neighbor_id, d2_micro, adist_micro FROM r WHERE rank <= $TopK
      |ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------
  // emb_quantize — INT8 scalar quantization audit (the OTHER
  // embedding-compression path besides PQ: per-dimension affine
  // int8, the format every vector store ships as its first memory
  // cut — 4× smaller than float32 with near-lossless recall).
  // Before a deployment swaps its serving index to int8 it wants the
  // reconstruction-error bound per dimension, not a vibe: this op
  // quantizes each component to code = ((v−min)·255) DIV (max−min),
  // reconstructs r = min + (code·(max−min)) DIV 255, and publishes
  // per-dimension max/mean absolute reconstruction error — all in
  // the corpus-standard floor(x·10⁶) ppm integers, so codes, the
  // reconstruction and every error statistic are engine-exact.
  //
  // Plan shape: pass 1 posexplode → per-dim min/max (map-side
  // partial agg to 64 rows); pass 2 re-explodes the corpus and joins
  // the BROADCAST 64-row stats on dim, then partial-aggregates the
  // error moments back to 64 rows. The corpus is never shuffled —
  // both shuffles move ≤ |dims| rows; at 100 TB this is two columnar
  // scans and nothing else. Constant dimensions (max = min) encode
  // as code 0 / zero error by definition.
  // ---------------------------------------------------------------
  private def int8Quantize(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.load(s, dir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("dim"),
        expr("CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)").as("v_ppm"))
    val stats = cells.groupBy("dim")
      .agg(min(col("v_ppm")).as("min_ppm"), max(col("v_ppm")).as("max_ppm"))
    cells.join(broadcast(stats), "dim")
      .withColumn("code", expr(
        "CASE WHEN max_ppm > min_ppm THEN ((v_ppm - min_ppm) * 255) DIV (max_ppm - min_ppm) ELSE CAST(0 AS BIGINT) END"))
      .withColumn("err", expr(
        "abs(v_ppm - (min_ppm + (code * (max_ppm - min_ppm)) DIV 255))"))
      .groupBy("dim", "min_ppm", "max_ppm")
      .agg(count(lit(1)).as("n"), max(col("err")).as("max_err_ppm"),
        sum(col("err")).as("sum_err_ppm"))
      .withColumn("mean_err_ppm", expr("sum_err_ppm DIV n"))
      .select("dim", "min_ppm", "max_ppm", "n", "max_err_ppm", "sum_err_ppm", "mean_err_ppm")
      .orderBy("dim")
  }

  private val int8QuantizeSql =
    """WITH cells AS (
      |  SELECT CAST(i AS INT) AS dim,
      |    CAST(floor(CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE) * 1000000) AS BIGINT) AS v_ppm
      |  FROM (SELECT embedding, unnest(range(0, len(embedding))) AS i FROM embeddings) u),
      |st AS (SELECT dim, min(v_ppm) AS min_ppm, max(v_ppm) AS max_ppm FROM cells GROUP BY dim),
      |q AS (
      |  SELECT c.dim, st.min_ppm, st.max_ppm,
      |    abs(c.v_ppm - (st.min_ppm +
      |      (CASE WHEN st.max_ppm > st.min_ppm
      |            THEN ((c.v_ppm - st.min_ppm) * 255) // (st.max_ppm - st.min_ppm)
      |            ELSE 0 END * (st.max_ppm - st.min_ppm)) // 255)) AS err
      |  FROM cells c JOIN st ON c.dim = st.dim)
      |SELECT dim, min_ppm, max_ppm, count(*) AS n,
      |  max(err) AS max_err_ppm, CAST(sum(err) AS BIGINT) AS sum_err_ppm,
      |  CAST(sum(err) // count(*) AS BIGINT) AS mean_err_ppm
      |FROM q GROUP BY dim, min_ppm, max_ppm
      |ORDER BY dim""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("emb_pq", pqTopK, Some(pqSql)),
    Op("sim_ivf_pq", ivfPqTopK, Some(ivfPqSql)),
    Op("emb_quantize", int8Quantize, Some(int8QuantizeSql)))
}
