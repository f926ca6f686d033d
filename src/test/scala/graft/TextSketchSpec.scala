package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min-sketch invariants beyond the oracle hash check. */
class TextSketchSpec extends AnyFunSuite with SparkSuite {

  test("CMS estimates never underestimate and rank consistently") {
    val hh = Registry.byName("txt_heavy_hitters").run(spark, sfDir).cache()
    assert(hh.count() == 20)
    // the defining CMS property: collisions only ADD
    assert(hh.filter(col("est_count") < col("exact_count")).count() == 0)
    // rank follows the estimate (desc, token tiebreak) — verify monotone
    val ests = hh.orderBy("rk").select("est_count").collect().map(_.getLong(0))
    assert(ests.zip(ests.tail).forall { case (a, b) => a >= b })
    // the true global top token cannot be displaced: its estimate is
    // >= its exact count, which is >= every other token's exact count
    val topExact = Tables.load(spark, sfDir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("g"))
      .groupBy("g").count().orderBy(col("count").desc, col("g"))
      .limit(1).collect()(0)
    assert(hh.filter(col("token") === topExact.getString(0)).count() == 1,
      s"true top token '${topExact.getString(0)}' missing from heavy hitters")
    hh.unpersist()
  }
}
