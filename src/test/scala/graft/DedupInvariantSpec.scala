package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-operator invariants the dedup family must satisfy on any
  * corpus (beyond the per-op oracle hash checks).
  */
class DedupInvariantSpec extends AnyFunSuite with SparkSuite {

  private def pairs(name: String) =
    Registry.byName(name).run(spark, sfDir)

  test("minhash-LSH verified pairs are a subset of exact jaccard pairs") {
    val exact = pairs("dedup_ngram_jaccard").select("doc_a", "doc_b")
    val lsh = pairs("dedup_minhash_lsh").select("doc_a", "doc_b")
    assert(lsh.join(exact, Seq("doc_a", "doc_b"), "left_anti").count() == 0)
  }

  test("jaccard pair output is canonical (a<b) and within bounds") {
    val j = pairs("dedup_ngram_jaccard")
    assert(j.filter(col("doc_a") >= col("doc_b")).count() == 0)
    assert(j.filter(col("inter") > col("uni") || col("inter") < 1).count() == 0)
  }

  test("semantic dedup: one kept vector per cluster, clusters closed over embedding pairs") {
    val sd = pairs("dedup_semantic").cache()
    assert(sd.count() > 0)
    // exactly one kept (the min id) per cluster; kept iff canonical
    val perCluster = sd.groupBy("cluster_id")
      .agg(sum(col("is_kept")).as("n_kept"), count(lit(1)).as("n"),
        min(col("vec_id")).as("min_id"))
    assert(perCluster.filter(col("n_kept") =!= 1).count() == 0)
    assert(perCluster.filter(col("min_id") =!= col("cluster_id")).count() == 0)
    assert(sd.filter((col("vec_id") === col("cluster_id")) =!= (col("is_kept") === 1)).count() == 0)
    // closure: both ends of every embedding near-dup pair are clustered together
    val p = pairs("dedup_embedding").select(col("vec_a"), col("vec_b"))
    val lab = sd.select(col("vec_id"), col("cluster_id"))
    val joined = p
      .join(lab.withColumnRenamed("vec_id", "vec_a").withColumnRenamed("cluster_id", "ca"), "vec_a")
      .join(lab.withColumnRenamed("vec_id", "vec_b").withColumnRenamed("cluster_id", "cb"), "vec_b")
    assert(joined.filter(col("ca") =!= col("cb")).count() == 0)
    assert(joined.count() == p.count())
  }

  test("containment pairs match a brute-force shingle-set recompute") {
    import scala.jdk.CollectionConverters._
    // ground truth: collect per-doc shingle-id sets (fine at spec SF)
    // and recompute directional containment directly
    val sets = graft.ops.Dedup.docShingleSets(spark, sfDir)
      .collectAsList().asScala
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val expected = (for {
      (a, sa) <- sets.iterator; (b, sb) <- sets.iterator
      if a != b && sa.size >= 10
      inter = (sa & sb).size
      if inter * 5L >= sa.size * 4L
    } yield (a, b, sa.size.toLong, sb.size.toLong, inter.toLong)).toSet
    val got = pairs("dedup_containment")
      .select("contained_id", "container_id", "n_contained", "n_container", "inter")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected)
    // containment_ppm stays within the threshold band
    val c = pairs("dedup_containment")
    assert(c.filter(col("containment_ppm") < 800000L ||
      col("containment_ppm") > 1000000L).count() == 0)
  }

  test("simhash pairs respect the hamming threshold and canonicalization") {
    val sh = pairs("dedup_simhash")
    assert(sh.filter(col("hamming") > 4 || col("hamming") < 0).count() == 0)
    assert(sh.filter(col("doc_a") >= col("doc_b")).count() == 0)
  }

  test("exact dedup: canonical id is group minimum; singletons not duplicates") {
    val d = pairs("dedup_exact")
    assert(d.filter(col("canonical_id") > col("doc_id")).count() == 0)
    assert(d.filter(col("group_size") === 1 && col("is_duplicate") === 1).count() == 0)
  }

  test("dup clusters: canonical min ids, size >= 2, closed over the pair graph") {
    val cl = pairs("dedup_clusters")
    assert(cl.filter(col("cluster_id") > col("doc_id")).count() == 0)
    assert(cl.filter(col("cluster_size") < 2).count() == 0)
    // both endpoints of every near-dup pair share a cluster
    val p = pairs("dedup_ngram_jaccard").select("doc_a", "doc_b")
    val la = cl.select(col("doc_id").as("doc_a"), col("cluster_id").as("ca"))
    val lb = cl.select(col("doc_id").as("doc_b"), col("cluster_id").as("cb"))
    assert(p.join(la, "doc_a").join(lb, "doc_b")
      .filter(col("ca") =!= col("cb")).count() == 0)
  }

  test("typed MinHashUnion aggregator equals the declarative posexplode+min form") {
    val agg = pairs("dedup_source_sketch")
    val declarative = graft.ops.TextOps.withTokens(Tables.load(spark, sfDir, "documents"))
      .filter(size(col("toks")) >= 3)
      .withColumn("msig", expr("graft_minhash32(graft_shingles3(toks))"))
      .select(col("source"), posexplode(col("msig")).as(Seq("perm", "v")))
      .groupBy("source", "perm").agg(min(col("v")).as("sig_min"))
    assert(agg.count() > 0)
    assert(agg.join(declarative, Seq("source", "perm", "sig_min"), "left_anti").count() == 0)
    assert(declarative.join(agg, Seq("source", "perm", "sig_min"), "left_anti").count() == 0)
  }

  test("df-cap drops saturating shingles but keeps J>=0.5 pair recall") {
    import spark.implicits._
    // 30 docs, ALL sharing a boilerplate suffix (saturating shingles,
    // df = 30) + 3 pairs of identical docs (true near-dups, J = 1)
    val common = "zz yy xx ww vv"
    val docs = (0 until 30).map { i =>
      val body = if (i < 6) s"p${i / 2}a p${i / 2}b p${i / 2}c p${i / 2}d p${i / 2}e"
        else s"u${i}a u${i}b u${i}c u${i}d u${i}e"
      (i.toLong, s"$body $common")
    }.toDF("doc_id", "text")
    val uncapped = graft.ops.Dedup.ngramJaccardPairs(docs, maxDf = 1000000L)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = graft.ops.Dedup.ngramJaccardPairs(docs, maxDf = 10L)
    val cappedPairs = capped.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Set((0L, 1L), (2L, 3L), (4L, 5L))
    assert(uncapped == expected)
    assert(cappedPairs == expected, "cap lost a true near-dup pair")
    // sizes were recomputed over the PRUNED universe: each doc keeps
    // 5 of its 8 shingles (3 boilerplate shingles hit the cap; the 2
    // boundary shingles are doc-specific and survive)
    assert(capped.filter(col("inter") =!= 5 || col("uni") =!= 5).count() == 0)
  }

  test("registered jaccard cap leaves testdata output unchanged (cap never fires)") {
    val registered = pairs("dedup_ngram_jaccard")
    val uncapped = graft.ops.Dedup.ngramJaccardPairs(
      Tables.load(spark, sfDir, "documents"), maxDf = Long.MaxValue)
    assert(registered.exceptAll(uncapped).count() == 0)
    assert(uncapped.exceptAll(registered).count() == 0)
  }

  test("cell-bounded embedding dedup: subset of brute force with recall >= 0.9") {
    // sf0.01: enough vectors for a meaningful pair population (59
    // true pairs at tau=0.4)
    val dir = "/root/testdata/sf0.01"
    val lsh = Registry.byName("dedup_embedding").run(spark, dir)
      .select("vec_a", "vec_b")
    // brute-force ground truth lives ONLY here, as the recall oracle
    val e = graft.ops.Dedup.withNorm(Tables.load(spark, dir, "embeddings"))
      .select(col("vec_id"), col("v"), col("nrm"))
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    val brute = a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("sim", round(expr("graft_array_dot(va, vb)") / sqrt(col("na") * col("nb")), 4))
      .filter(col("sim") >= 0.4)
      .select("vec_a", "vec_b")
    val nBrute = brute.count()
    val nLsh = lsh.count()
    assert(lsh.join(brute, Seq("vec_a", "vec_b"), "left_anti").count() == 0,
      "candidate path produced a pair below the threshold (verify step broken)")
    info(s"embedding-dedup recall vs brute: $nLsh/$nBrute")
    assert(nBrute > 0 && nLsh * 10 >= nBrute * 9, s"recall $nLsh/$nBrute < 0.9")
  }

  test("label centroids cover every vector once; outlier ranks are contiguous") {
    val cent = pairs("emb_label_centroid").cache()
    val total = Tables.load(spark, sfDir, "embeddings").count()
    // every (label,dim) cell counts each vector of that label exactly once
    assert(cent.filter(col("dim") === 0).agg(sum("n_vecs")).head().getLong(0) == total)
    assert(cent.filter(col("centroid") < -1.000001 || col("centroid") > 1.000001).count() == 0)
    val out = pairs("emb_outliers").cache()
    val perLabel = out.groupBy("label").agg(count(lit(1)).as("n"), max(col("rank")).as("mx"))
    assert(perLabel.filter(col("n") =!= 3 || col("mx") =!= 3).count() == 0)
    assert(out.filter(col("dist2") < 0).count() == 0)
    // rank 1 is the per-label max distance
    val w = out.groupBy("label").agg(max(col("dist2")).as("mx"))
    assert(out.filter(col("rank") === 1).join(w, "label")
      .filter(col("dist2") =!= col("mx")).count() == 0)
  }

  test("multi-probe LSH recall dominates single-bucket LSH against brute truth") {
    def hits(name: String): Long = {
      val truth = pairs("sim_knn_brute").select("query_id", "neighbor_id")
      pairs(name).select("query_id", "neighbor_id").join(truth, Seq("query_id", "neighbor_id")).count()
    }
    val single = hits("sim_knn_lsh")
    val multi = hits("sim_knn_multiprobe")
    // multiprobe candidates are a superset per query ⇒ true-top-k overlap
    // can only grow
    assert(multi >= single, s"multiprobe overlap $multi < single-bucket $single")
    assert(multi > 0)
  }

  test("knn returns k ranked neighbors per query with sim in [-1,1]") {
    val k = pairs("sim_knn_brute")
    assert(k.groupBy("query_id").count().filter(col("count") =!= 5).count() == 0)
    assert(k.filter(col("sim") > 1.0001 || col("sim") < -1.0001).count() == 0)
  }

  test("incremental dedup agrees exactly with the full minhash-LSH pass") {
    val inc = pairs("dedup_incremental").cache()
    assert(inc.count() > 0)
    // the batch is the id range above every corpus match
    val t = inc.agg(min(col("doc_id"))).head().getLong(0) - 1
    assert(inc.filter(col("verdict") === "dup_of_corpus" && col("dup_of") > t).count() == 0)
    assert(inc.filter(col("verdict") === "dup_in_batch" &&
      (col("dup_of") <= t || col("dup_of") >= col("doc_id"))).count() == 0)
    assert(inc.filter(col("verdict") === "novel" && col("dup_of") =!= col("doc_id")).count() == 0)
    // same bands + same verify ⇒ per batch doc, n_matches equals the
    // number of full-pass pairs whose higher id is that doc
    val full = pairs("dedup_minhash_lsh")
      .filter(col("doc_b") > t)
      .groupBy(col("doc_b").as("doc_id")).agg(count(lit(1)).as("full_matches"))
    val joined = inc.join(full, Seq("doc_id"), "left")
      .withColumn("fm", coalesce(col("full_matches"), lit(0L)))
    assert(joined.filter(col("n_matches") =!= col("fm")).count() == 0)
    inc.unpersist()
  }

  test("recall_eval exercises the banded path: multiple jaccard deciles on a banded corpus") {
    // The gate corpus happens to collapse every true pair into one
    // Jaccard decile, so the oracle hash alone never proves the
    // per-band grouping/recall arithmetic. This corpus pins two
    // deciles by construction: 3 identical pairs (J=1 → band 9) and
    // 3 shared-prefix pairs (29 of 40/41 tokens shared → word-3-gram
    // inter=27, uni=38+39−27=50, J=0.54 → band 5). Token vocabularies
    // are disjoint across pairs, so no cross-pair truth rows exist.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_recall_bands").toString
    val docs = (0 until 3).flatMap { p =>
      val t = (1 to 40).map(i => s"p${p}a$i").mkString(" ")
      Seq((p * 10L, t), (p * 10L + 1, t))
    } ++ (3 until 6).flatMap { p =>
      val shared = (1 to 29).map(i => s"p${p}a$i")
      val a = (shared ++ (30 to 40).map(i => s"p${p}a$i")).mkString(" ")
      val b = (shared ++ (30 to 41).map(i => s"p${p}b$i")).mkString(" ")
      Seq((p * 10L, a), (p * 10L + 1, b))
    }
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("synth"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = Registry.byName("dedup_recall_eval").run(spark, dir).collect()
      .map(r => r.getAs[Long]("jband") ->
        (r.getAs[Long]("n_true"), r.getAs[Long]("n_found"), r.getAs[Long]("recall_ppm")))
      .toMap
    assert(got.keySet == Set(5L, 9L), s"expected bands {5,9}, got ${got.keySet}")
    // identical docs share every minhash band, so LSH must find all 3
    assert(got(9L) == ((3L, 3L, 1000000L)), s"band 9 was ${got(9L)}")
    val (t5, f5, ppm5) = got(5L)
    assert(t5 == 3L, s"band 5 n_true was $t5")
    assert(f5 >= 0L && f5 <= 3L)
    assert(ppm5 == f5 * 1000000L / 3L)
  }
}
