package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-14 additions. */
class R14OpsSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("sim_descent_curve: structural invariants of the budget-recall curve") {
    val rows = run("sim_descent_curve").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSeq
    assert(rows.size == 9)
    // recall_ppm = n_hits ppm of n_exact, and hits never exceed truth
    rows.foreach { case (_, _, _, nExact, nHits, ppm, nVisited) =>
      assert(nExact > 0 && nHits >= 0 && nHits <= nExact)
      assert(ppm == nHits * 1000000L / nExact)
      assert(nVisited >= nHits)
    }
    // within a chain (same entry mode + width), deeper hops only ADD
    // visited candidates (the walk never unvisits), so n_visited is
    // structurally monotone. n_hits is NOT asserted monotone: a
    // rounded-sim tie can displace a truth row from the top-K when a
    // smaller-id equal-sim candidate arrives in a later hop.
    rows.groupBy(r => (r._1, r._2)).values.foreach { chain =>
      val byHop = chain.sortBy(_._3)
      assert(byHop.map(_._7) == byHop.map(_._7).sorted,
        "n_visited must be non-decreasing in hops")
    }
    // recorded-margin check on the checked-in corpus (NOT structural:
    // the cell entry seeds a superset at hop 0, but hop-1 beams can
    // diverge, so a regenerated corpus could in principle invert
    // this; the checked-in sf0.001/sf0.1 margins are wide)
    val single1 = rows.collectFirst { case ("single", 8L, 1L, _, _, _, v) => v }.get
    val cell1 = rows.collectFirst { case ("cell", 8L, 1L, _, _, _, v) => v }.get
    assert(cell1 >= single1,
      s"recorded margin inverted: cell hop-1 visited $cell1 < single $single1")
  }

  test("sim_descent_curve frees its walk snapshots and exact truth (no persistent-RDD growth)") {
    // first run may stage shared memoized artifacts (kNN graph, IVF
    // routing) — those persist by design; the op's OWN state (9 walk
    // snapshots + the brute-truth checkpoint) must all be freed, so a
    // second run leaves the persistent-RDD set exactly where it was
    run("sim_descent_curve").collect()
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    run("sim_descent_curve").collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(leaked.isEmpty, s"sim_descent_curve leaked persistent RDDs: $leaked")
  }

  test("sim_descent_curve: sf0.1 pinned margins (production point beats bucket indexes)") {
    val big = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$big/embeddings.parquet").exists,
      s"$big not present; pinned-margin check skipped")
    val rows = Registry.byName("sim_descent_curve").run(spark, big).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(5)))
      .toSeq
    val prod = rows.collectFirst {
      case ("cell", 32L, 6L, ppm) => ppm
    }.get
    val singleBest = rows.collect { case ("single", _, _, ppm) => ppm }.max
    // recorded on the checked-in capture: 500000 vs 50000 (10x); both
    // gated bucket indexes read 270000 on the same corpus
    assert(prod > singleBest,
      s"production point ($prod ppm) must beat the best single-entry point ($singleBest ppm)")
    assert(prod >= 400000L,
      s"production point ($prod ppm) must hold the recorded ~50% recall band")
  }
}
