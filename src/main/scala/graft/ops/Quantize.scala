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
  * Codebooks are seeded by stride-sampled subvectors (the sim_ivf
  * seeding trick) then refined by ONE deterministic Lloyd iteration
  * in exact integer-ppm component means — the same quantization
  * emb_label_centroid hash-gates, so both engines reproduce the
  * refined codewords bit-for-bit. Every distance is floored to
  * integer micro units BEFORE any comparison or sum (floor of a
  * double is midpoint-free on both engines, and BIGINT sums are
  * exact — SURVEY §5), so encode argmin, the ADC sums, the shortlist
  * cut and the final ranking all replicate in DuckDB.
  *
  * Scale shape: encode is a broadcast join (codebook: M·Ks = 128
  * rows) against the exploded corpus — N·M·Ks distance rows, linear
  * in N, map-side only; the Lloyd pass is a posexplode + partial
  * aggregation collapsing to M·Ks·SubDim rows. ADC joins the N·M
  * code stream to a broadcast LUT (queries·M·Ks rows) and
  * partial-aggregates the per-pair sums map-side before the single
  * shuffle on (query, neighbor). The re-rank broadcasts the
  * queries·Shortlist candidate ids against the corpus scan — the
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

  // L2² in integer micro units via the dot-product expansion — the
  // same graft_array_dot / list_dot_product kernels both engines
  // already agree on bit-for-bit: (a − b)² = a·a − 2a·b + b·b.
  private def l2Micro(a: String, b: String) =
    s"CAST(floor((graft_array_dot($a, $a) - 2 * graft_array_dot($a, $b) + graft_array_dot($b, $b)) * 1000000) AS BIGINT)"

  private def pqTopK(s: SparkSession, dir: String): DataFrame = {
    val e = Dedup.withNorm(Tables.load(s, dir, "embeddings")).select("vec_id", "v")
    val stride = math.ceil(e.count().toDouble / Ks).toLong

    val subs = e.withColumn("m", explode(expr(s"sequence(0, ${M - 1})")))
      .select(col("vec_id"), col("m"), expr(s"slice(v, m * $SubDim + 1, $SubDim)").as("sub"))

    // seed codebook: Ks stride-sampled vectors × M subvectors (128 rows)
    val cb0 = e.filter(col("vec_id") % stride === 0 && col("vec_id") < Ks * stride)
      .select(expr(s"CAST(vec_id DIV $stride AS INT)").as("code"), col("v"))
      .withColumn("m", explode(expr(s"sequence(0, ${M - 1})")))
      .select(col("code"), col("m"), expr(s"slice(v, m * $SubDim + 1, $SubDim)").as("cw"))

    // encode: per (vector, subspace) argmin over the broadcast
    // codebook — min(struct(dmicro, code)) instead of a row_number
    // window: the N·M·Ks distance rows collapse map-side (partial
    // agg) to N·M before the shuffle, and nothing is sorted. Tie →
    // lowest code, identical to the oracle's ORDER BY dmicro, code.
    def encodeAgainst(vs: DataFrame, cb: DataFrame): DataFrame =
      vs.join(broadcast(cb), Seq("m"))
        .withColumn("dmicro", expr(l2Micro("sub", "cw")))
        .groupBy("vec_id", "m")
        .agg(min(struct(col("dmicro"), col("code"))).as("mc"))
        .select(col("vec_id"), col("m"), col("mc.code").as("code"))
    def encode(cb: DataFrame): DataFrame = encodeAgainst(subs, cb)

    // one Lloyd iteration: refined codeword = exact integer-ppm mean
    // of its assigned subvectors (refinedCentroids pattern, per
    // (m, code)). Trains on a 1-in-TrainStride sample — the standard
    // PQ split (train on a subset, encode everything): the seed
    // assignment never touches the full corpus, so only ONE full
    // N·M·Ks encode pass remains.
    val train = subs.filter(col("vec_id") % TrainStride === 0)
    val cb = train.join(encodeAgainst(train, cb0), Seq("vec_id", "m"))
      .select(col("m"), col("code"), posexplode(col("sub")).as(Seq("dim", "x")))
      .select(col("m"), col("code"), col("dim"),
        expr("CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)").as("v_ppm"))
      .groupBy("m", "code", "dim")
      .agg(count(lit(1)).as("n"), sum(col("v_ppm")).as("s_ppm"))
      .withColumn("comp", col("s_ppm").cast("double") / 1000000.0 / col("n"))
      .groupBy("m", "code")
      .agg(collect_list(struct(col("dim"), col("comp"))).as("cc"))
      .select(col("m"), col("code"), expr("transform(array_sort(cc), s -> s.comp)").as("cw"))

    val codes = encode(cb).withColumnRenamed("vec_id", "neighbor_id")

    // ADC: per-query LUT of subvector→codeword distances (broadcast),
    // approximate distance = exact BIGINT sum of 8 lookups
    val lut = subs.filter(col("vec_id") < NQueries)
      .withColumnRenamed("vec_id", "query_id")
      .join(broadcast(cb), Seq("m"))
      .select(col("query_id"), col("m"), col("code"), expr(l2Micro("sub", "cw")).as("qd"))

    val wS = Window.partitionBy("query_id").orderBy(col("adist_micro"), col("neighbor_id"))
    val shortlist = codes.join(broadcast(lut), Seq("m", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("qd")).as("adist_micro"))
      .withColumn("srank", row_number().over(wS))
      .filter(col("srank") <= Shortlist)
      .select("query_id", "neighbor_id", "adist_micro")

    // exact re-rank of the shortlist: broadcast the queries·Shortlist
    // candidate set against the corpus scan (corpus never shuffles)
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

  val ops: Seq[Op] = Seq(
    Op("emb_pq", pqTopK, Some(pqSql)))
}
