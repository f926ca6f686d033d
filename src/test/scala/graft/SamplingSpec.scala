package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the deterministic sampling/sharding family (beyond
  * the per-op oracle hash checks): reproducibility, stability under
  * corpus growth, stratum coverage and shard balance.
  */
class SamplingSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("train/val/test split covers every doc once, near 90/5/5, stable under growth") {
    val sp = run("exp_split").cache()
    val total = Tables.load(spark, sfDir, "documents").count()
    assert(sp.count() == total)
    val frac = sp.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / total).toMap
    assert(frac.keySet == Set("train", "val", "test"))
    // hash thresholds hold in expectation; wide tolerance for small SF
    assert(frac("train") > 0.8 && frac("train") < 0.97, s"train ${frac("train")}")
    assert(frac("val") < 0.12 && frac("test") < 0.12)
    // growth stability: recompute the assignment over a half corpus —
    // a doc's split never migrates as data arrives
    val half = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 2 === 0)
      .withColumn("bp",
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 10000"))
      .withColumn("half_split",
        when(col("bp") < 9000, "train").when(col("bp") < 9500, "val").otherwise("test"))
      .select("doc_id", "half_split")
    assert(sp.join(half, "doc_id")
      .filter(col("split") =!= col("half_split")).count() == 0)
    sp.unpersist()
  }

  test("stratified sample is reproducible and within rate bounds") {
    val s1 = run("samp_stratified").collect().toSeq
    val s2 = run("samp_stratified").collect().toSeq
    assert(s1 == s2) // hash-deterministic: identical across runs
    val total = Tables.load(spark, sfDir, "documents").count()
    val frac = s1.size.toDouble / total
    // 20% nominal; md5 is uniform enough for a wide tolerance band
    assert(frac > 0.1 && frac < 0.3, s"sample fraction $frac far from 0.2")
    assert(s1.forall(_.getLong(2) < 2000L)) // every h_bp under threshold
  }

  test("stratified sample is stable under corpus growth (no doc flips out)") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    val half = docs.filter(col("doc_id") % 2 === 0)
    def sampleIds(df: org.apache.spark.sql.DataFrame): Set[Long] = df
      .withColumn("h_bp",
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 10000"))
      .filter(col("h_bp") < 2000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val fromHalf = sampleIds(half)
    val fromFull = sampleIds(docs)
    // growing the corpus only ADDS sampled docs; membership of
    // existing docs never changes (incremental-pipeline contract)
    assert(fromHalf.subsetOf(fromFull))
  }

  test("fixed-per-class sample has exactly min(K, stratum size) rows per class") {
    val fixed = run("samp_fixed_per_class").cache()
    val strata = Tables.load(spark, sfDir, "documents")
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = fixed.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == strata.keySet) // every stratum represented
    got.foreach { case (lang, n) =>
      assert(n == math.min(50L, strata(lang)), s"$lang: $n rows")
    }
    // ranks are contiguous from 1 per stratum
    assert(fixed.filter(col("rk") < 1 || col("rk") > 50).count() == 0)
  }

  test("shards cover all docs exactly once and are balanced") {
    val sh = run("exp_shards").collect()
    assert(sh.map(_.getLong(0)).toSeq == (0L until 16L)) // all 16 shards, ordered
    val counts = sh.map(_.getLong(1))
    val total = Tables.load(spark, sfDir, "documents").count()
    assert(counts.sum == total) // a partition, not a sample
    val (mx, mn) = (counts.max.toDouble, counts.min.toDouble)
    assert(mx / mn < 2.0, s"shard imbalance max/min = ${mx / mn}")
  }

  test("mixture sample respects per-source rates and nests under rate increases") {
    val m = run("samp_mixture").cache()
    // every kept doc is under its source's threshold
    assert(m.filter(col("h_bp") >= col("rate_bp")).count() == 0)
    // per-source kept fraction tracks the configured rate (wide band:
    // small strata at test SF)
    val totals = Tables.load(spark, sfDir, "documents")
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = m.groupBy("source", "rate_bp").count().collect()
    kept.foreach { r =>
      val (src, bp, n) = (r.getString(0), r.getLong(1), r.getLong(2))
      val frac = n.toDouble / totals(src)
      val nominal = bp / 10000.0
      assert(math.abs(frac - nominal) < 0.25, s"$src: kept $frac vs nominal $nominal")
    }
    // nested-sample contract: the docs kept at rate r are a subset of
    // those kept at any higher rate (same hash, higher threshold) —
    // mixture re-weighting reuses every doc already selected
    val ids1250 = m.filter(col("h_bp") < 1250).select("doc_id").collect().map(_.getLong(0)).toSet
    val ids5000 = m.filter(col("h_bp") < 5000).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1250.subsetOf(ids5000))
  }

  test("sequence packing is a permutation manifest with in-budget offsets") {
    val p = run("exp_pack_sequences").cache()
    val docs = Tables.load(spark, sfDir, "documents")
    // every doc packed exactly once
    assert(p.count() == docs.count())
    assert(p.select("doc_id").distinct().count() == docs.count())
    // offsets always inside the budget; seq ids non-negative
    assert(p.filter(col("seq_offset") < 0 || col("seq_offset") >= 256).count() == 0)
    assert(p.filter(col("seq_id") < 0).count() == 0)
    // per-shard reconstruction: tokens_before chain is consistent —
    // seq_id * budget + seq_offset strictly increases per shard in
    // manifest order, so a loader can replay the concatenation
    val rows = p.collect()
    rows.groupBy(_.getLong(0)).foreach { case (shard, rs) =>
      val starts = rs.map(r => r.getLong(1) * 256 + r.getLong(2))
      assert(starts.toSeq == starts.toSeq.sorted, s"shard $shard manifest out of order")
      assert(starts.distinct.length == starts.length, s"shard $shard overlapping starts")
    }
    // deterministic across runs
    assert(p.collect().toSeq == run("exp_pack_sequences").collect().toSeq)
  }

  test("stratified sampling plan is a pure scan+filter (no shuffle)") {
    val phys = run("samp_stratified").queryExecution.executedPlan.toString
    // the only exchange allowed is the final global orderBy's range
    // partitioning; the FILTER itself must sit on the scan side —
    // strip the sort's exchange and require no other Exchange
    val beforeSort = phys.split("Sort ").last
    assert(!beforeSort.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in sampling plan:\n$phys")
  }
}
