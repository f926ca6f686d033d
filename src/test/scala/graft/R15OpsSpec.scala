package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-15 additions. */
class R15OpsSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("graph_pagerank_residuals: curve is the converged loop's own stop-test trace") {
    val curve = run("graph_pagerank_residuals").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // rounds are dense 1..n
    assert(curve.map(_._1) == (1L to curve.size).map(identity))
    // every non-final round's residual exceeded the tolerance (the
    // loop kept going), the final one met it (the loop stopped)
    assert(curve.init.forall(_._2 > graft.ops.GraphOps.PrTolPpm),
      "a non-final round at/below tolerance means the loop overran its stop")
    assert(curve.last._2 <= graft.ops.GraphOps.PrTolPpm)
    // the curve length IS the converged op's gated n_rounds column
    val nRounds = run("graph_pagerank_converged")
      .select("n_rounds").head().getLong(0)
    assert(nRounds == curve.size.toLong)
  }

  test("pagerank fixpoint memo: second read re-uses the run (no new persistent RDDs)") {
    run("graph_pagerank_converged").count()
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    run("graph_pagerank_residuals").count() // same snapshot -> memo hit
    run("graph_pagerank_converged").count()
    val after = spark.sparkContext.getPersistentRDDs.keySet.toSet
    assert((after -- before).isEmpty,
      s"memoized fixpoint re-ran or leaked: ${after -- before}")
  }
}
