package graft

import graft.etl.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted two-phase patterns must be EQUIVALENT to their direct
  * formulations — salting redistributes work, never changes results.
  */
class SkewSpec extends AnyFunSuite with SparkSuite {

  test("saltedAggregate equals direct groupBy aggregation") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val direct = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"), count(lit(1)).as("n"))
    val salted = Skew.saltedAggregate(
      li, Seq("l_returnflag"),
      partials = Seq(
        (sum(col("l_quantity").cast("decimal(18,2)")), "q_p"),
        (count(lit(1)), "n_p")),
      merges = names => Seq(
        sum(col(names(0))).cast("decimal(38,2)").as("q"), sum(col(names(1))).as("n")))
    val d = direct.withColumn("q", col("q").cast("decimal(38,2)"))
    assert(salted.join(d, Seq("l_returnflag", "q", "n"), "left_anti").count() == 0)
    assert(salted.count() == d.count())
  }

  test("saltedJoin equals direct join") {
    val li = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_partkey")
    val p = Tables.load(spark, sfDir, "part").select(col("p_partkey"), col("p_brand"))
    val direct = li.join(p, col("l_partkey") === col("p_partkey"))
    val salted = Skew.saltedJoin(
      li.withColumnRenamed("l_partkey", "k"),
      p.withColumnRenamed("p_partkey", "k"), "k")
    assert(salted.count() == direct.count())
    assert(salted.groupBy("p_brand").count()
      .join(direct.groupBy("p_brand").count(), Seq("p_brand", "count"), "left_anti")
      .count() == 0)
  }
}
