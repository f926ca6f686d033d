package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side recomputation invariants for the Reconcile pack. */
class ReconcileSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("etl_reconciliation: counts tie out against direct scans; cents are exact") {
    val rows = run("etl_reconciliation").collect()
    val nOrders = Tables.load(spark, sfDir, "orders").count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == nOrders)
    // headerless audit: no-lines count equals a direct anti-join
    val noLines = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "lineitem").select("l_orderkey").distinct(),
        col("o_orderkey") === col("l_orderkey"), "left_anti").count()
    assert(rows.map(_.getAs[Long]("n_no_lines")).sum == noLines)
    // header cents recompute exactly per status
    val direct = Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)")).as("hc"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("hc")).toMap
    for (r <- rows) {
      assert(direct(r.getAs[String]("status")) == r.getAs[Long]("header_cents"))
      assert(r.getAs[Long]("n_within_1pct") >= 0 &&
        r.getAs[Long]("n_within_1pct") <= r.getAs[Long]("n_orders"))
    }
  }

  test("ev_type_affinity: cos² re-derives from raw per-user count vectors") {
    val rows = run("ev_type_affinity").collect()
    val types = Tables.load(spark, sfDir, "events")
      .select("event_type").distinct().count().toInt
    assert(rows.length == types * (types - 1) / 2)
    val uc = Tables.load(spark, sfDir, "events")
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) -> r.getAs[Long]("c"))
      .toMap
    for (r <- rows) {
      val (t1, t2) = (r.getAs[String]("t1"), r.getAs[String]("t2"))
      assert(t1 < t2)
      val users = uc.keys.map(_._1).toSet
      val dot = users.toSeq.map(u =>
        BigInt(uc.getOrElse((u, t1), 0L)) * BigInt(uc.getOrElse((u, t2), 0L))).sum
      val na = users.toSeq.map(u => { val c = BigInt(uc.getOrElse((u, t1), 0L)); c * c }).sum
      val nb = users.toSeq.map(u => { val c = BigInt(uc.getOrElse((u, t2), 0L)); c * c }).sum
      assert(BigInt(r.getAs[Long]("cos2_ppm")) == dot * dot * 1000000 / (na * nb))
      assert(r.getAs[Long]("cos2_ppm") <= 1000000L) // Cauchy–Schwarz
      assert(r.getAs[Long]("n_co_users") ==
        users.count(u => uc.contains((u, t1)) && uc.contains((u, t2))))
    }
  }

  test("txt_ttr: diversity ratios re-derive from a driver-side token count") {
    val rows = run("txt_ttr").collect()
    val docs = Tables.load(spark, sfDir, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byLang = docs.groupBy(_._1)
    assert(rows.length == byLang.size)
    for (r <- rows) {
      val toks = byLang(r.getAs[String]("lang"))
        .flatMap(_._2.trim.split("\\s+"))
      val counts = toks.groupBy(identity).view.mapValues(_.length)
      val types = counts.size.toLong
      val hapax = counts.count(_._2 == 1).toLong
      assert(r.getAs[Long]("tokens") == toks.length.toLong)
      assert(r.getAs[Long]("types") == types)
      assert(r.getAs[Long]("hapax") == hapax)
      assert(r.getAs[Long]("ttr_ppm") == types * 1000000L / toks.length)
      assert(r.getAs[Long]("hapax_ppm") == hapax * 1000000L / types)
    }
  }
}
