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
  * doubles, broadcast in every assign join; assignment is N·√N dots,
  * linear per vector). The merge path is the cheap one by
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
      .select("vec_id", "v", "nrm").localCheckpoint()
    val standing = e.filter(col("vec_id") % BatchMod =!= (BatchMod - 1))
    // grid sizes are corpus metadata (one count action each)
    val strideS = math.ceil(math.sqrt(standing.count().toDouble)).toLong
    val strideF = math.ceil(math.sqrt(e.count().toDouble)).toLong
    // standing grid: seeds + Lloyd means from the STANDING corpus
    // only (the batch did not exist when this index was trained);
    // rebuilt grid: trained from scratch over the full corpus
    val centS = Similarity.refinedCentroids(standing, strideS)
    val centF = Similarity.refinedCentroids(e, strideF)

    val exact = {
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

    def graded(cent: DataFrame, method: String): DataFrame = {
      // the merged index IS "assign the full corpus to the standing
      // centroids": standing vectors keep their cells, batch vectors
      // insert into their nearest existing cell
      val corpus = Similarity.assignTo(e, cent, "vec_id", 1)
        .select(col("vec_id").as("neighbor_id"), col("v").as("cv"),
          col("nrm").as("cn"), col("cell"))
      val queries = Similarity.assignTo(e.filter(col("vec_id") < NQueries), cent,
          "vec_id", NProbe)
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

    graded(centS, "merged").unionByName(graded(centF, "rebuilt"))
      .orderBy("method", "query_id")
  }

  /** One Lloyd-refined grid as oracle CTEs: seeds/means from the
    * `srcFilter` subset of `n`, centroids published as `${pfx}centf`
    * — the ivfCellsDuck derivation parameterized by training set.
    */
  private def gridDuck(pfx: String, srcFilter: String): String =
    s"""${pfx}src AS (SELECT * FROM n WHERE $srcFilter),
      |${pfx}st AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS stride FROM ${pfx}src),
      |${pfx}c0 AS (SELECT vec_id AS cid, v AS centv, nrm AS centn FROM ${pfx}src
      |            WHERE vec_id % (SELECT stride FROM ${pfx}st) = 0),
      |${pfx}a0 AS (
      |  SELECT vec_id, cid AS cell FROM (
      |    SELECT x.vec_id, c.cid,
      |      row_number() OVER (PARTITION BY x.vec_id
      |        ORDER BY round(list_dot_product(x.v, c.centv) / sqrt(x.nrm * c.centn), 4) DESC, c.cid) AS cr
      |    FROM ${pfx}src x CROSS JOIN ${pfx}c0 c) a
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

  /** Search + grade one grid: corpus primary assignment, nprobe=$NProbe
    * query probe, top-K, recall vs `exact`, structure stats.
    */
  private def gradedDuck(pfx: String, method: String): String =
    s"""${pfx}corpus AS (
      |  SELECT vec_id AS neighbor_id, v, nrm, cid AS cell FROM (
      |    SELECT x.vec_id, x.v, x.nrm, c.cid,
      |      row_number() OVER (PARTITION BY x.vec_id
      |        ORDER BY round(list_dot_product(x.v, c.centv) / sqrt(x.nrm * c.centn), 4) DESC, c.cid) AS cr
      |    FROM n x CROSS JOIN ${pfx}centf c) a
      |  WHERE cr = 1),
      |${pfx}q AS (
      |  SELECT vec_id AS query_id, v, nrm, cid AS cell FROM (
      |    SELECT x.vec_id, x.v, x.nrm, c.cid,
      |      row_number() OVER (PARTITION BY x.vec_id
      |        ORDER BY round(list_dot_product(x.v, c.centv) / sqrt(x.nrm * c.centn), 4) DESC, c.cid) AS cr
      |    FROM n x CROSS JOIN ${pfx}centf c WHERE x.vec_id < $NQueries) a
      |  WHERE cr <= $NProbe),
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
      |n AS (SELECT vec_id, v, list_dot_product(v, v) AS nrm FROM e),
      |${gridDuck("s", s"vec_id % $BatchMod <> ${BatchMod - 1}")},
      |${gridDuck("f", "TRUE")},
      |bp AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |         round(list_dot_product(q.v, c.v) / sqrt(q.nrm * c.nrm), 4) AS sim
      |       FROM n q JOIN n c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id),
      |exact AS (SELECT query_id, neighbor_id, sim AS exact_sim FROM (
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

  val ops: Seq[Op] = Seq(
    Op("sim_index_merge", indexMerge, Some(indexMergeSql)))
}
