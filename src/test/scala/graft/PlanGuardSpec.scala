package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Window => LWindow}
import org.scalatest.funsuite.AnyFunSuite

/** Mechanical enforcement of SURVEY §4's scale rules over EVERY
  * registered operator — the regression net for the 100 TB story:
  *
  *  1. No CartesianProductExec anywhere. A cartesian over two big
  *     sides is the one plan shape that cannot survive scale;
  *     1-row-scalar cross joins compile to BroadcastNestedLoopJoin,
  *     which stays allowed.
  *  2. Every window with an EMPTY partition spec must sit above an
  *     Aggregate in the same lineage — an unpartitioned window is
  *     only sane over a grain-reduced (bounded) relation; over a raw
  *     fact table it funnels everything into one task.
  *
  * Checked on the optimized logical plan (robust node types, not
  * string matching) for the physical cartesian check's logical
  * counterpart Join-with-no-condition — plus the physical plan string
  * for CartesianProductExec itself.
  */
class PlanGuardSpec extends AnyFunSuite with SparkSuite {

  private def subtreeHasAggregate(p: LogicalPlan): Boolean =
    p.collectFirst { case _: Aggregate => () }.isDefined

  test("no registered op compiles to a cartesian product") {
    val offenders = Registry.all.flatMap { op =>
      val phys = op.run(spark, sfDir).queryExecution.executedPlan.toString
      if (phys.contains("CartesianProduct")) Some(op.name) else None
    }
    assert(offenders.isEmpty, s"cartesian plans: $offenders")
  }

  test("every unpartitioned window runs over a pre-aggregated (bounded) input") {
    val offenders = Registry.all.flatMap { op =>
      val logical = op.run(spark, sfDir).queryExecution.optimizedPlan
      val bad = logical.collect {
        case w: LWindow if w.partitionSpec.isEmpty && !subtreeHasAggregate(w.child) => w
      }
      if (bad.nonEmpty) Some(op.name) else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned windows over raw (unbounded) inputs: $offenders")
  }
}
