package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side recomputation invariants for the growth-analytics pack. */
class GrowthOpsSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("q_abc_pareto: classes partition the catalog at the exact 80/95 boundaries") {
    val rows = run("q_abc_pareto").collect()
    assert(rows.map(_.getAs[String]("abc_class")).toSeq.sorted ==
      rows.map(_.getAs[String]("abc_class")).toSeq)
    val perPart = Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_partkey")
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)")).as("rev"))
      .collect().map(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("rev")))
      .sortBy(t => (-t._2, t._1))
    val t = perPart.map(p => BigInt(p._2)).sum
    var cum = BigInt(0)
    val classes = perPart.map { case (_, rev) =>
      cum += rev
      if (cum * 100 <= t * 80) "A" else if (cum * 100 <= t * 95) "B" else "C"
    }
    val mine = classes.zip(perPart.map(_._2)).groupBy(_._1)
    assert(rows.map(_.getAs[String]("abc_class")).toSet == mine.keySet)
    for (r <- rows) {
      val g = mine(r.getAs[String]("abc_class"))
      assert(r.getAs[Long]("n_parts") == g.length)
      val rev = g.map(x => BigInt(x._2)).sum
      assert(BigInt(r.getAs[Long]("revenue_cents")) == rev)
      assert(BigInt(r.getAs[Long]("share_ppm")) == rev * 1000000 / t)
    }
    // total parts and revenue conserved
    assert(rows.map(_.getAs[Long]("n_parts")).sum == perPart.length)
  }

  test("q_new_vs_repeat: per-month splits re-derive; every customer is new exactly once") {
    val rows = run("q_new_vs_repeat").collect()
    val nCustWithOrders = Tables.load(spark, sfDir, "orders")
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_new")).sum == nCustWithOrders)
    val nOrders = Tables.load(spark, sfDir, "orders").count()
    assert(rows.map(r => r.getAs[Long]("n_new") + r.getAs[Long]("n_repeat")).sum == nOrders)
    for (r <- rows) {
      val (nc, rc) = (r.getAs[Long]("new_cents"), r.getAs[Long]("repeat_cents"))
      assert(r.getAs[Long]("new_share_ppm") ==
        BigInt(nc) * 1000000 / BigInt(nc + rc).max(1))
    }
    // months are sorted, distinct, and well-formed
    val months = rows.map(_.getAs[String]("month")).toSeq
    assert(months == months.sorted && months.distinct == months)
    assert(months.forall(_.matches("\\d{4}-\\d{2}")))
  }

  test("ev_entropy_profile: band population re-derives from raw per-user type counts") {
    val rows = run("ev_entropy_profile").collect()
    val ut = Tables.load(spark, sfDir, "events")
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("nt"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("nt")))
    def bitlen(x: Long): Long = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val hByUser = ut.groupBy(_._1).map { case (_, g) =>
      val n = g.map(_._2).sum
      val sbits = g.map { case (_, nt) => nt * bitlen(nt) }.sum
      (n * bitlen(n) - sbits) * 1000L / n
    }
    val bands = hByUser.groupBy(_ / 500).view.mapValues(_.size.toLong).toMap
    assert(rows.map(r => r.getAs[Long]("band") -> r.getAs[Long]("n_users")).toMap == bands)
    val tot = bands.values.sum
    for (r <- rows) {
      assert(r.getAs[Long]("band_lo_milli") == r.getAs[Long]("band") * 500)
      assert(r.getAs[Long]("user_share_ppm") ==
        r.getAs[Long]("n_users") * 1000000L / tot)
      assert(r.getAs[Long]("band") >= 0)
      // 5 event types: whole-bit H ≤ bitlen(n) − bitlen(n/5) ≤ 3 bits ⇒ band ≤ 6
      assert(r.getAs[Long]("band") <= 6)
    }
  }
}
