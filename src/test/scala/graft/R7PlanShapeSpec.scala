package graft

import org.scalatest.funsuite.AnyFunSuite

/** Positive physical-plan assertions for the round-7 op packs: each
  * op's Scaladoc makes a concrete 100 TB plan claim (what broadcasts,
  * what shares an exchange, what never joins) — these tests pin those
  * claims to the actual compiled plan so a regression that silently
  * degrades the shape (a broadcast falling back to sort-merge, a
  * window and aggregate splitting into two shuffles) fails the build,
  * not a later benchmark.
  */
class R7PlanShapeSpec extends AnyFunSuite with SparkSuite {

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sfDir).queryExecution.executedPlan.toString

  /** Data shuffles only: the final orderBy's rangepartitioning over a
    * bounded result relation is presentation, not a data movement
    * concern — excluded.
    */
  private def countShuffles(p: String): Int =
    p.linesIterator.count(l => l.contains("Exchange hashpartitioning") ||
      l.contains("Exchange SinglePartition"))

  test("q_chi_square: one broadcast fact join, marginals as windows over the 25-row contingency aggregate") {
    val p = plan("q_chi_square")
    // the ONLY join: orders ⨝ broadcast(customer) — pinned exactly,
    // not "no more than one SMJ" (which passed vacuously pre-round-9)
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) == 1,
      s"expected exactly the orders⨝broadcast(customer) join:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no shuffle join belongs in this plan:\n$p")
    // each base table is scanned exactly once
    for (t <- Seq("customer", "orders")) {
      val scans = p.linesIterator.count(l =>
        l.contains("FileScan parquet") && l.contains(t))
      assert(scans == 1, s"$t scanned $scans times (want 1):\n$p")
    }
    // marginals + total = THREE windows (per-segment, per-priority,
    // global), all above the (seg, pri) contingency HashAggregate —
    // never re-aggregated branches joined back
    assert(p.linesIterator.count(_.trim.startsWith("+- Window")) == 3,
      s"expected 3 marginal windows:\n$p")
    assert(p.contains("HashAggregate"), "contingency table should hash-agg")
    // exactly one data shuffle (the (seg, pri) aggregate exchange) +
    // one SinglePartition funnel for the bounded 25-row window input
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"expected one aggregate exchange:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange SinglePartition")) == 1,
      s"expected one bounded-input window funnel:\n$p")
  }

  test("q_gini / q_pearson_corr: the per-nation window/aggregate is partitioned (streams per nation)") {
    for (n <- Seq("q_gini", "q_pearson_corr")) {
      val p = plan(n)
      assert(!p.contains("Exchange SinglePartition") ||
        p.contains("BroadcastExchange"),
        s"$n must not funnel the fact through one partition")
    }
  }

  test("etl_dist_drift / exp_length_buckets: map-side partial aggregate below one shuffle, no join of fact tables") {
    for (n <- Seq("etl_dist_drift", "exp_length_buckets")) {
      val p = plan(n)
      assert(p.contains("HashAggregate"), s"$n: banded aggregate should hash-agg")
      assert(!p.contains("SortMergeJoin"), s"$n: no fact-fact join belongs here")
    }
  }

  test("ev_bot_detect: lag window and user aggregate share one user-keyed exchange") {
    val p = plan("ev_bot_detect")
    // one hashpartitioning exchange on user_id for window+agg, one for
    // the global top-k rank (bounded input); nothing else
    val shuffles = countShuffles(p)
    assert(shuffles <= 3, s"expected the window and aggregate to share the "
      + s"user_id exchange (≤3 shuffles incl. final rank), got $shuffles:\n$p")
  }

  test("ev_entropy_profile: one pipeline — fact scanned once, total via window, no join at all") {
    val p = plan("ev_entropy_profile")
    // (user,type) agg + user rollup + band agg (+ SinglePartition for
    // the bounded band window) — and critically NO duplicated fact
    // subtree: the events parquet is scanned exactly once
    val eventScans = p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("events"))
    assert(eventScans == 1, s"events scanned $eventScans times:\n$p")
    assert(countShuffles(p) <= 4, s"expected ≤4 shuffles:\n$p")
    assert(!p.contains("Join"), "no join belongs in this plan")
  }

  test("ev_type_affinity: join-free pipeline — diagonals reach pairs via keyed windows") {
    val p = plan("ev_type_affinity")
    assert(!p.contains("Join"), "restructured plan has no join at all")
    assert(p.contains("Window"), "norms ride keyed windows over the term aggregate")
  }

  test("q_abc_pareto: join-free — cumsum and catalog total both ride the part-grain window") {
    val p = plan("q_abc_pareto")
    // the unpartitioned window is legal ONLY because its input is the
    // per-part aggregate (PlanGuardSpec enforces this registry-wide)
    assert(p.contains("Window"))
    assert(!p.contains("Join"), "total rides the window, not a re-aggregated join")
  }

  test("mm_aspect_buckets / mm_modality_mix: no join wider than a broadcast") {
    for (n <- Seq("mm_aspect_buckets", "mm_modality_mix")) {
      val p = plan(n)
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
        s"$n: only constant-size broadcasts belong in this plan")
    }
  }

  test("round-7 packs: every table is scanned exactly once per plan (totals ride windows, not re-aggregated branches)") {
    // (op, expected number of FileScan nodes) — 2 = two distinct
    // tables, never the same table twice. A regression that swaps a
    // window-total for a 1-row-aggregate joined back re-scans the
    // fact (no exchange reuse across aggregate shapes) and trips this.
    val expected = Seq(
      "etl_dist_drift" -> 1, "exp_length_buckets" -> 1, "txt_ttr" -> 1,
      "mm_modality_mix" -> 1, "mm_aspect_buckets" -> 1, "q_abc_pareto" -> 1,
      "q_new_vs_repeat" -> 1, "ev_entropy_profile" -> 1, "ev_type_affinity" -> 1,
      "ev_bot_detect" -> 1, "q_chi_square" -> 2, "q_ks_test" -> 2,
      "q_gini" -> 2, "q_pearson_corr" -> 2, "etl_reconciliation" -> 2)
    val bad = expected.flatMap { case (n, want) =>
      val scans = plan(n).linesIterator.count(_.contains("FileScan parquet"))
      if (scans != want) Some(s"$n: $scans scans (want $want)") else None
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("etl_reconciliation: exactly one fact-sized aggregate feeds the header join") {
    val p = plan("etl_reconciliation")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"))
    // lineitem is touched once: a single scan of the lineitem parquet
    val lineitemScans = p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("lineitem"))
    assert(lineitemScans == 1, s"lineitem scanned $lineitemScans times")
  }
}
