package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the partsupp-adapted TPC-H shapes (Q2/Q11/Q16/Q20)
  * and the round-5 corpus-quality text ops — structural properties
  * the DuckDB oracle's hash compare can't state.
  */
class Analytics3Spec extends AnyFunSuite with SparkSuite {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("q2: every returned cost is the true minimum over the region-scoped supply") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val p = Tables.load(spark, sfDir, "part")
      .filter(col("p_size") === 15 && col("p_type") === "MEDIUM").select("p_partkey")
    val asiaSup = Tables.load(spark, sfDir, "supplier")
      .join(Tables.load(spark, sfDir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.load(spark, sfDir, "region").filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey")
    val trueMin = li.join(p, col("l_partkey") === col("p_partkey"))
      .join(asiaSup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey").as("tm_partkey"))
      .agg(min(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("true_min"))
    val bad = run("q2_min_cost_supplier")
      .join(trueMin, col("p_partkey") === col("tm_partkey"))
      .filter(col("cost") =!= col("true_min"))
    assert(bad.count() == 0)
  }

  test("q11: every returned value exceeds 2x the per-part average; none missing") {
    val df = run("q11_important_parts").cache()
    val n = df.count()
    assert(n > 0)
    // recompute the full per-part value set and its threshold
    val nationSup = Tables.load(spark, sfDir, "supplier")
      .join(Tables.load(spark, sfDir, "nation").filter(col("n_name") === "NATION_13"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val value = Tables.load(spark, sfDir, "lineitem")
      .join(nationSup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount")).cast("decimal(8,4)")).as("v"))
    val Array(total, cnt) = value.agg(sum(col("v")).cast("double"), count(lit(1)))
      .head().toSeq.map(_.toString.toDouble).toArray
    val expected = value.filter(col("v").cast("double") * cnt > total * 2).count()
    assert(n == expected)
  }

  test("q16: exclusions hold — no banned brand/type/size bucket appears") {
    val df = run("q16_supplier_variety").cache()
    assert(df.count() > 0)
    assert(df.filter(col("p_brand") === "BRAND_5" ||
      col("p_type").startsWith("MEDIUM") ||
      !col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)).count() == 0)
    // counting flagged suppliers too can only grow the count
    val withFlagged = Tables.load(spark, sfDir, "lineitem")
      .select("l_partkey", "l_suppkey").distinct()
      .join(Tables.load(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("all_cnt"))
    val shrunk = df.join(withFlagged, Seq("p_brand", "p_type", "p_size"))
      .filter(col("supplier_cnt") > col("all_cnt"))
    assert(shrunk.count() == 0)
  }

  test("q20: every returned supplier is in the nation and actually qualifies") {
    val df = run("q20_excess_shippers").cache()
    assert(df.count() > 0)
    val natSup = Tables.load(spark, sfDir, "supplier")
      .join(Tables.load(spark, sfDir, "nation").filter(col("n_name") === "NATION_13"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_name")
    assert(df.join(natSup, Seq("s_name"), "left_anti").count() == 0)
  }

  test("txt_repetition: ppm shares bounded, top_c consistent with dup_pos") {
    val df = run("txt_repetition").cache()
    assert(df.count() > 0)
    assert(df.filter(col("top_ppm") <= 0 || col("top_ppm") > 1000000).count() == 0)
    assert(df.filter(col("dup_ppm") < 0 || col("dup_ppm") > 1000000).count() == 0)
    assert(df.filter(col("top_c") > col("n_bigrams")).count() == 0)
    // a doc whose most frequent bigram is unique has zero duplicated positions
    assert(df.filter(col("top_c") === 1 && col("dup_ppm") =!= 0).count() == 0)
  }

  test("txt_boilerplate: shares bounded and exact same-source dups are 100% boilerplate") {
    val df = run("txt_boilerplate").cache()
    assert(df.count() > 0)
    assert(df.filter(col("bp_pos") > col("n_grams")).count() == 0)
    // two identical docs in the same source share every trigram
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), md5(lower(trim(col("text")))).as("h"))
    val sameSourceDup = docs.as("a")
      .join(docs.as("b"),
        col("a.h") === col("b.h") && col("a.source") === col("b.source") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id")).distinct()
    val notFull = sameSourceDup.join(df, "doc_id").filter(col("bp_ppm") =!= 1000000)
    assert(notFull.count() == 0)
  }
}
