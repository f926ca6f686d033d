package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants for the split-hygiene / experiment ops:
  * conservation against the staged artifacts they compose, and
  * recomputation of every derived rate from raw evidence.
  */
class LeakageSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("exp_split_leakage: buckets conserve the staged pair graph and shares sum to ~1") {
    val rows = run("exp_split_leakage").collect()
    val nPairs = graft.ops.Dedup.nearDupPairs(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == nPairs,
      "every staged near-dup pair lands in exactly one split bucket")
    val shareSum = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - rows.length)
    for (r <- rows) {
      assert(r.getAs[String]("split_a") <= r.getAs[String]("split_b"), "unordered buckets")
      assert((r.getAs[Int]("is_leak") == 1) ==
        (r.getAs[String]("split_a") != r.getAs[String]("split_b")))
    }
  }

  test("samp_dedup_weighted: membership matches the bp*size rule exactly") {
    val kept = run("samp_dedup_weighted").collect()
    assert(kept.map(_.getAs[Long]("doc_id")).distinct.length == kept.length)
    // recompute the rule from the same staged labels
    val labels = graft.ops.Dedup.clusterLabels(spark, sfDir)
      .select(col("doc_id"), col("cluster_size")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_size")).toMap
    val expected = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 10000")
          .as("bp"))
      .collect()
      .filter(r => r.getAs[Long]("bp") * labels.getOrElse(r.getAs[Long]("doc_id"), 1L) < 5000L)
      .map(_.getAs[Long]("doc_id")).toSet
    assert(kept.map(_.getAs[Long]("doc_id")).toSet == expected)
    // singleton acceptance is a fair coin: far more than chance-level
    // deviation would mean the draw is biased
    val singles = kept.count(_.getAs[Long]("cluster_size") == 1L)
    val nSingleDocs = Tables.load(spark, sfDir, "documents").count() - labels.size
    assert(singles > nSingleDocs * 2 / 5 && singles < nSingleDocs * 3 / 5,
      s"singleton keep rate $singles of $nSingleDocs outside 40-60%")
  }

  test("ev_ab_lift: counts conserve users and winner follows the exact cross-product") {
    val r = run("ev_ab_lift").head()
    val ev = Tables.events(spark, sfDir)
    val nUsers = ev.select("user_id").distinct().count()
    val nConv = ev.filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(r.getAs[Long]("n_users_a") + r.getAs[Long]("n_users_b") == nUsers)
    assert(r.getAs[Long]("n_conv_a") + r.getAs[Long]("n_conv_b") == nConv)
    assert(r.getAs[Long]("rate_a_ppm") ==
      r.getAs[Long]("n_conv_a") * 1000000L / r.getAs[Long]("n_users_a"))
    val lhs = BigInt(r.getAs[Long]("n_conv_b")) * BigInt(r.getAs[Long]("n_users_a"))
    val rhs = BigInt(r.getAs[Long]("n_conv_a")) * BigInt(r.getAs[Long]("n_users_b"))
    val expect = if (lhs > rhs) "B" else if (lhs < rhs) "A" else "tie"
    assert(r.getAs[String]("winner") == expect)
  }
}
