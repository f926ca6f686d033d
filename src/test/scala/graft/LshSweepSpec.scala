package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LSH banding parameter sweep over one 32-perm MinHash signature:
  * with b bands of r = 32/b rows, a full 2r-row band match implies
  * both r-row halves match, so candidate sets are provably MONOTONE
  * in the band count — candidates(4 bands) ⊆ candidates(8) ⊆
  * candidates(16) — and recall against the exact Jaccard pairs can
  * only grow with more bands. This is the dial a 100 TB deployment
  * turns: more bands = more recall = more verify work.
  */
class LshSweepSpec extends AnyFunSuite with SparkSuite {

  private lazy val sigs: DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    graft.ops.TextOps.withTokens(Tables.load(spark, sfDir, "documents"))
      .filter(size(col("toks")) >= 3)
      .withColumn("sh", expr("graft_shingles3(toks)"))
      .withColumn("msig", expr("graft_minhash32(sh)"))
      .select("doc_id", "sh", "msig")
      .cache()
  }

  /** Candidate pairs for b bands × (32/b) rows over the shared sig. */
  private def candidates(nBands: Int): Set[(Long, Long)] = {
    val rows = 32 / nBands
    val bandSigs = (0 until nBands).map { j =>
      val parts = (0 until rows)
        .map(r => s"CAST(element_at(msig, ${j * rows + r + 1}) AS STRING)")
      expr(parts.mkString("concat_ws('_', ", ", ", ")"))
    }
    val bands = sigs.select(col("doc_id"), posexplode(array(bandSigs: _*)).as(Seq("band", "sig")))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("candidate sets are monotone in band count (4 ⊆ 8 ⊆ 16)") {
    val c4 = candidates(4)
    val c8 = candidates(8)
    val c16 = candidates(16)
    assert(c4.subsetOf(c8) && c8.subsetOf(c16))
    assert(c16.nonEmpty)
  }

  test("recall against exact Jaccard >= 0.5 pairs is nondecreasing with bands") {
    val exactPairs = Registry.byName("dedup_ngram_jaccard").run(spark, sfDir)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPairs.nonEmpty)
    val recalls = Seq(4, 8, 16).map { b =>
      val c = candidates(b)
      exactPairs.count(c.contains).toDouble / exactPairs.size
    }
    assert(recalls == recalls.sorted, s"recall not monotone: $recalls")
    // at 16 bands × 2 rows the sketch should catch essentially all
    // true pairs in this corpus
    assert(recalls.last >= recalls.head)
    // the shipped op (8 × 4) must equal the sweep's 8-band candidates
    // after exact-Jaccard verification
    val verified = Registry.byName("dedup_minhash_lsh").run(spark, sfDir)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified == exactPairs.filter(candidates(8).contains))
  }

  test("hyperplane banding sweep: recall rises with bands, buckets sharpen with planes") {
    // the embedding-dedup dial (OR-of-ANDs over Similarity.planesFor):
    // same total planes split into more bands = higher recall; more
    // planes PER band = finer buckets (fewer candidates) at the cost
    // of per-band recall. Ground truth = brute-force pairs at tau.
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.load(spark, dir, "embeddings")
    def pairsOf(df: DataFrame): Set[(Long, Long)] =
      df.select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = graft.ops.Dedup.withNorm(emb).select(col("vec_id"), col("v"), col("nrm"))
    val brute = pairsOf(
      e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
        .join(e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb")),
          col("vec_a") < col("vec_b"))
        .withColumn("sim", round(expr("graft_array_dot(va, vb)") / sqrt(col("na") * col("nb")), 4))
        .filter(col("sim") >= 0.4))
    assert(brute.nonEmpty)
    // 16 planes split as (bands, planesPerBand): recall grows with bands
    val recalls = Seq((4, 4), (8, 2), (16, 1)).map { case (b, r) =>
      val got = pairsOf(graft.ops.Dedup.embeddingPairsLsh(emb, 0.4, b, r))
      assert(got.subsetOf(brute)) // exact verify never passes a sub-tau pair
      brute.count(got.contains).toDouble / brute.size
    }
    assert(recalls == recalls.sorted, s"recall not monotone in bands: $recalls")
    assert(recalls.last == 1.0, s"16x1 banding should catch every pair: $recalls")
    // the registered op's banding (8x2) is the measured middle: >= 0.9
    assert(recalls(1) >= 0.9)
  }

  test("IVF Lloyd refinement improves cell balance and holds top-k recall") {
    import graft.ops.{Dedup, Similarity}
    val dir = "/root/testdata/sf0.01"
    val e = Dedup.withNorm(Tables.load(spark, dir, "embeddings"))
      .select(col("vec_id"), col("v"), col("nrm")).cache()
    val seeds = e.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("cid"), col("v").as("centv"), col("nrm").as("centn"))
    val refined = Similarity.refinedCentroids(e, 25L, Similarity.coarseSeeds(e, 25L))
    def cellSizes(cent: org.apache.spark.sql.DataFrame): Seq[Long] =
      Similarity.assignTo(e, cent, "vec_id", 1)
        .groupBy("cell").count().collect().map(_.getLong(1)).toSeq
    val s0 = cellSizes(seeds)
    val s1 = cellSizes(refined)
    assert(s1.sum == s0.sum) // every vector assigned exactly once
    val imb0 = s0.max.toDouble / (s0.sum.toDouble / s0.size)
    val imb1 = s1.max.toDouble / (s1.sum.toDouble / s1.size)
    info(s"cell imbalance max/mean: seeds=$imb0 refined=$imb1 " +
      s"(max ${s0.max} -> ${s1.max} over ${s0.size} -> ${s1.size} cells)")
    assert(imb1 <= imb0, s"Lloyd step worsened cell balance: $imb0 -> $imb1")
    // top-k recall vs the brute op must not collapse under refinement
    def topk(name: String): Set[(Long, Long)] =
      Registry.byName(name).run(spark, dir).select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = topk("sim_knn_brute")
    val ivf = topk("sim_ivf")
    val recall = brute.count(ivf.contains).toDouble / brute.size
    info(s"sim_ivf refined recall vs brute: $recall")
    // deterministic 0.30 measured at sf0.01 (nprobe=2 of 20 cells —
    // 3x the probed corpus fraction)
    assert(recall >= 0.3, s"IVF recall collapsed: $recall")
  }

  test("knn graph: canonical ranked edges, no self-loops, recall vs brute top-3") {
    import graft.ops.Dedup
    val dir = "/root/testdata/sf0.01"
    val g = Registry.byName("sim_knn_graph").run(spark, dir).cache()
    assert(g.count() > 0)
    assert(g.filter(col("vec_id") === col("neighbor_id")).count() == 0)
    val perVec = g.groupBy("vec_id").agg(count(lit(1)).as("n"), max(col("rank")).as("mx"))
    assert(perVec.filter(col("n") =!= col("mx") || col("n") > 3).count() == 0)
    // brute-force top-3 ground truth (test-only all-pairs)
    val e = Dedup.withNorm(Tables.load(spark, dir, "embeddings"))
      .select(col("vec_id"), col("v"), col("nrm")).cache()
    val a = e.select(col("vec_id").as("va"), col("v").as("xa"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vb"), col("v").as("xb"), col("nrm").as("nb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("va").orderBy(col("sim").desc, col("vb"))
    val brute = a.join(b, col("va") =!= col("vb"))
      .withColumn("sim",
        round(expr("graft_array_dot(xa, xb)") / sqrt(col("na") * col("nb")), 4))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = g.select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(got.contains).toDouble / brute.size
    info(s"knn-graph recall vs brute top-3: $recall")
    // measured 0.987 at sf0.01 (r11 asymmetric probe 8/1 over ~2√N-vector cells)
    assert(recall >= 0.8, s"knn-graph recall collapsed: $recall")
  }

  test("two-level IVF keeps the one-level assignment topology and holds recall") {
    import graft.ops.Dedup
    val dir = "/root/testdata/sf0.01"
    val e = Dedup.withNorm(Tables.load(spark, dir, "embeddings"))
      .select(col("vec_id"), col("v"), col("nrm")).cache()
    val n = e.count()
    val stride = math.ceil(math.sqrt(n.toDouble)).toLong
    val k = e.filter(col("vec_id") % stride === 0).count()
    val cstride = math.ceil(math.sqrt(k.toDouble)).toLong
    val kCoarse = e.filter(col("vec_id") % (stride * cstride) === 0).count()
    // the point of the second level: coarse table ~ N^1/4 — a vector
    // ranks kCoarse + ~k/kCoarse centroids instead of all k
    info(s"N=$n fine=$k coarse=$kCoarse (one-level cost k=$k, " +
      s"two-level ~${kCoarse + k / math.max(kCoarse, 1)})")
    assert(kCoarse < k, "coarse quantizer did not shrink the ranked set")
    val res = Registry.byName("sim_ivf_twolevel").run(spark, dir).cache()
    // every result cell is a fine-centroid id (assignment topology)
    val fids = e.filter(col("vec_id") % stride === 0)
      .collect().map(_.getLong(0)).toSet
    assert(res.select("cell").distinct().collect().map(_.getLong(0)).forall(fids.contains))
    def topk(name: String): Set[(Long, Long)] =
      Registry.byName(name).run(spark, dir).select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = topk("sim_knn_brute")
    val two = res.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(two.contains).toDouble / brute.size
    info(s"sim_ivf_twolevel recall vs brute: $recall")
    // coarse pruning costs recall vs one-level IVF's 0.30 floor;
    // anything >= the probed-fraction baseline means the hierarchy
    // routes queries to the right region
    assert(recall >= 0.2, s"two-level IVF recall collapsed: $recall")
  }

  test("bucketed range search verifies exactly and recalls most of brute truth") {
    def resSet(name: String): Set[(Long, Long, Double)] =
      Registry.byName(name).run(spark, sfDir)
        .select("query_id", "neighbor_id", "sim")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = resSet("sim_range_search")
    val lsh = resSet("sim_range_search_lsh")
    assert(brute.nonEmpty)
    // the exact-cosine verify step means every returned pair is a true
    // ≥ τ pair with the identical (rounded) sim — a strict subset
    // relation, not just id overlap
    assert(lsh.subsetOf(brute))
    val recall = brute.count(lsh.contains).toDouble / brute.size
    info(s"banded range-search recall vs brute: $recall (${lsh.size}/${brute.size})")
    // measured 0.97 (65/67) at sf0.001 with the 8×2 banding
    assert(recall >= 0.9, s"banded range recall too low: $recall")
  }
}
