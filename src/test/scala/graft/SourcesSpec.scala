package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SourcesSpec extends AnyFunSuite with SparkSuite {

  test("csv round-trip with explicit schema preserves data") {
    val tmp = Files.createTempDirectory("graft_csv").toString
    val orig = Tables.load(spark, sfDir, "nation")
    Sources.writeCsv(orig, tmp)
    val back = Sources.csv(spark, tmp, orig.schema)
    assert(back.count() == orig.count())
    assert(back.join(orig, Seq("n_nationkey", "n_name", "n_regionkey"), "left_anti").count() == 0)
  }

  test("partitioned parquet write produces hive layout and prunes partitions") {
    val tmp = Files.createTempDirectory("graft_part").toString
    val orders = Tables.load(spark, sfDir, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
    Sources.writeParquet(orders, tmp, partitionBy = Seq("order_year"))
    val dirs = new java.io.File(tmp).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("order_year=")))
    val back = Sources.parquet(spark, tmp).filter(col("order_year") === 1999)
    val expected = orders.filter(col("order_year") === 1999).count()
    assert(back.count() == expected && expected > 0)
    // partition pruning visible in the plan (no full-scan of other years)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || back.inputFiles.forall(_.contains("order_year=1999")))
  }

  test("source ops round-trip through the driver contract non-empty") {
    Seq("src_csv_roundtrip", "src_json_roundtrip", "src_partitioned_prune",
      "src_orc_roundtrip", "src_schema_evolution").foreach { name =>
      assert(Registry.byName(name).run(spark, sfDir).count() > 0, s"$name empty")
    }
  }

  test("src_manifest_isolation: v1 read skips on-disk uncommitted files; v2 sees all") {
    val rows = Registry.byName("src_manifest_isolation").run(spark, sfDir).collect()
    val orders = Tables.load(spark, sfDir, "orders")
    val pre = orders.filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp")).count()
    val all = orders.count()
    val v1 = rows.filter(_.getString(0) == "v1")
    val v2 = rows.filter(_.getString(0) == "v2")
    assert(v1.map(_.getLong(2)).sum == pre && v2.map(_.getLong(2)).sum == all)
    // the dirty window really existed: during the v1 read, MORE files
    // were on disk than the manifest exposed
    v1.foreach { r =>
      assert(r.getLong(4) == 4L && r.getLong(5) == 8L,
        "v1 read must see 4 of 8 on-disk files")
    }
    v2.foreach(r => assert(r.getLong(4) == 8L && r.getLong(5) == 8L))
  }

  test("writeParquet honors target file count") {
    val tmp = Files.createTempDirectory("graft_files").toString
    Sources.writeParquet(Tables.load(spark, sfDir, "lineitem"), tmp, targetFiles = Some(4))
    val files = new java.io.File(tmp).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 4)
  }
}
