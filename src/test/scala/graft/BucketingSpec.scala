package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Bucketed tables co-locate join keys at write time: a join between
  * two tables bucketed on the same key by the same count plans with
  * NO shuffle exchange on either side — the 100 TB repeated-join
  * pattern (SURVEY.md §4).
  */
class BucketingSpec extends AnyFunSuite with SparkSuite {

  test("bucketed-bucketed join plans without a shuffle") {
    val wh = Files.createTempDirectory("graft_warehouse").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // external bucketed tables (warehouse.dir is a static conf)
    Tables.load(spark, sfDir, "orders")
      .write.option("path", s"$wh/b_orders")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    Tables.load(spark, sfDir, "lineitem")
      .write.option("path", s"$wh/b_lineitem")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    // disable auto-broadcast so the join strategy decision is about bucketing
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == Tables.load(spark, sfDir, "lineitem").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
