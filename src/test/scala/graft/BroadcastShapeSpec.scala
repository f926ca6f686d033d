package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions for the round-5 additions: the
  * dimension sides of the partsupp-adapted TPC-H shapes and the
  * sketch ops must BROADCAST (a sort-merge join against a 25-row
  * nation or a 64Ki-bit bloom bitmap is a wasted shuffle at 100 TB),
  * and the 1-row scalar thresholds must compile to broadcast
  * nested-loop, never a cartesian. Complements PlanGuardSpec (which
  * bans the catastrophic shapes registry-wide) with positive
  * assertions on the shapes we designed for.
  */
class BroadcastShapeSpec extends AnyFunSuite with SparkSuite {

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sfDir).queryExecution.executedPlan.toString

  test("q2/q11/q16/q20: every dimension join broadcasts") {
    Seq("q2_min_cost_supplier", "q11_important_parts",
        "q16_supplier_variety", "q20_excess_shippers").foreach { n =>
      val p = plan(n)
      assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin") ||
        p.contains("BroadcastNestedLoopJoin"), s"$n: no broadcast in plan")
    }
  }

  test("q11: the scalar threshold joins as broadcast nested-loop, not cartesian") {
    val p = plan("q11_important_parts")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("bloom pre-filter: the bit-positions relation broadcasts to the probe side") {
    val p = plan("etl_bloom_prefilter")
    assert(p.contains("BroadcastExchange"), "bloom bits should broadcast")
  }

  test("hll: registers partial-aggregate map-side before the shuffle") {
    // two-phase hash aggregation on (event_type, idx): a partial
    // aggregate must appear below the exchange — the property that
    // makes the sketch mergeable ACROSS partitions without moving rows
    val p = plan("ev_hll_distinct")
    assert(p.contains("HashAggregate"))
    assert(p.contains("Exchange"))
  }

  test("q_skyline: frontier stats broadcast back; no cartesian") {
    val p = plan("q_skyline")
    assert(p.contains("BroadcastExchange"), "per-size frontier stats should broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("samp_temperature: totals ride the source-aggregate window; rates broadcast") {
    val p = plan("samp_temperature")
    // totals were a 1-row BNL join; they now ride an unpartitioned
    // window over the |sources|-row aggregate so the corpus is not
    // re-scanned per totals branch (the r7 scan-dedup sweep)
    assert(p.contains("BroadcastExchange"), "per-source rates should broadcast onto the scan")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("etl_late_arriving: every post-count join is dim-sized and broadcasts") {
    val p = plan("etl_late_arriving")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"))
    assert(!p.contains("CartesianProduct"))
  }
}
