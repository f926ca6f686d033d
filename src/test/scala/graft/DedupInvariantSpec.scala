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

  test("knn returns k ranked neighbors per query with sim in [-1,1]") {
    val k = pairs("sim_knn_brute")
    assert(k.groupBy("query_id").count().filter(col("count") =!= 5).count() == 0)
    assert(k.filter(col("sim") > 1.0001 || col("sim") < -1.0001).count() == 0)
  }
}
