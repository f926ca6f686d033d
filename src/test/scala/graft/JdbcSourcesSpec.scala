package graft

import graft.sources.Jdbc
import graft.sources.Jdbc.JdbcSourceSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JdbcSourcesSpec extends AnyFunSuite with SparkSuite {

  private def freshSpec(table: String): JdbcSourceSpec = JdbcSourceSpec(
    url = s"jdbc:derby:memory:jdbcspec_${table.toLowerCase};create=true",
    table = table)

  test("write→read round trip is value-exact incl. timestamps") {
    val spec = freshSpec("ORDERS_RT")
    val orig = Tables.load(spark, sfDir, "orders")
    Jdbc.write(orig.coalesce(2), spec,
      stringColumnTypes = Map("o_orderstatus" -> 8, "o_orderpriority" -> 32))
    val back = Jdbc.read(spark, spec)
    assert(back.count() == orig.count())
    // full-row anti-join both ways == bit-exact content
    val cols = orig.columns.toSeq
    assert(back.join(orig, cols, "left_anti").count() == 0)
    assert(orig.join(back, cols, "left_anti").count() == 0)
  }

  test("dialect round-trips NULL strings and booleans (typed catalog fidelity)") {
    import spark.implicits._
    // the meta_jdbc_catalog failure modes: Option[String] = None used
    // to die in setNull(CLOB); Boolean must map to Derby BOOLEAN (the
    // common fallback BIT(1) is not a Derby type)
    val spec = freshSpec("CFG_NULLS")
    val rows = Seq((1, Some("a"), true), (2, None: Option[String], false))
      .toDF("id", "opt_str", "flag")
    Jdbc.write(rows, spec)
    val back = Jdbc.read(spark, spec).orderBy("id")
      .as[(Int, Option[String], Boolean)].collect().toSeq
    assert(back == Seq((1, Some("a"), true), (2, None, false)))
  }

  test("partitioned read splits the key range into parallel scans") {
    val spec = freshSpec("ORDERS_PART").copy(
      partitionColumn = Some("o_orderkey"), numPartitions = 4)
    val orig = Tables.load(spark, sfDir, "orders")
    Jdbc.write(orig.coalesce(2), spec,
      stringColumnTypes = Map("o_orderstatus" -> 8, "o_orderpriority" -> 32))
    val back = Jdbc.read(spark, spec)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == orig.count())
  }

  test("unsized partitioned read derives parallelism from key bounds") {
    val spec = freshSpec("ORDERS_AUTO").copy(partitionColumn = Some("o_orderkey"))
    val orig = Tables.load(spark, sfDir, "orders")
    Jdbc.write(orig.coalesce(2), spec,
      stringColumnTypes = Map("o_orderstatus" -> 8, "o_orderpriority" -> 32))
    assert(spec.numPartitions == 0) // default = derive, not 1
    val back = Jdbc.read(spark, spec)
    val (lo, hi) = Jdbc.keyBounds(spec, "o_orderkey")
    assert(back.rdd.getNumPartitions ==
      Jdbc.partitionsFor((lo, hi), Jdbc.DefaultBatchSize))
    assert(back.count() == orig.count())
  }

  test("partitionsFor maps BatchSize onto the key span") {
    assert(Jdbc.partitionsFor((1L, 15000L), 2000) == 8)
    assert(Jdbc.partitionsFor((1L, 100L), 2000) == 1)
    assert(Jdbc.partitionsFor((1L, 100L), 0) == 1) // FULL config, no chunking
    assert(Jdbc.partitionsFor((1L, 10000000L), 10) == 64) // clamped
  }

  test("numeric predicates push into the remote query") {
    val spec = freshSpec("ORDERS_PUSH")
    val orig = Tables.load(spark, sfDir, "orders")
    Jdbc.write(orig.coalesce(2), spec,
      stringColumnTypes = Map("o_orderstatus" -> 8, "o_orderpriority" -> 32))
    val filtered = Jdbc.read(spark, spec).filter(col("o_orderkey") > 100L)
    val expected = orig.filter(col("o_orderkey") > 100L).count()
    assert(filtered.count() == expected && expected > 0)
    // the JDBC relation carries the pushed predicate
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") || scan.toLowerCase.contains("o_orderkey"))
  }

  test("watermark-incremental extraction over JDBC ships only new rows") {
    import graft.etl.IncrementalTracker
    val spec = freshSpec("ORDERS_INCR")
    val orig = Tables.load(spark, sfDir, "orders")
    val half = orig.count() / 2
    Jdbc.write(orig.filter(col("o_orderkey") <= half).coalesce(1), spec,
      stringColumnTypes = Map("o_orderstatus" -> 8, "o_orderpriority" -> 32))
    // first pull: everything, watermark = max key
    val (b1, w1) = IncrementalTracker.strictBatch(
      Jdbc.read(spark, spec), "o_orderkey", None)
    val n1 = b1.count()
    assert(n1 > 0 && w1.contains(half.toString))
    // late arrivals land in the source DB
    Jdbc.write(orig.filter(col("o_orderkey") > half).coalesce(1), spec,
      mode = org.apache.spark.sql.SaveMode.Append)
    // second pull: only the new rows, via a filter PUSHED to the remote DB
    val (b2, w2) = IncrementalTracker.strictBatch(
      Jdbc.read(spark, spec), "o_orderkey", w1)
    assert(b2.count() == orig.count() - n1)
    assert(b2.agg(min(col("o_orderkey"))).head().getLong(0) > half)
    assert(w2.exists(_.toLong > half))
    val plan = b2.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(o_orderkey"))
  }

  test("funnel warning is scoped to data-sized tables (VERDICT r11 item 4)") {
    import spark.implicits._
    // config-sized: one connection is the CORRECT plan — no warning
    // at the default (DefaultBatchSize) threshold
    val cfg = freshSpec("CFG_SMALL")
    Jdbc.write(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"), cfg)
    assert(Jdbc.unpartitionedWarning(cfg).isEmpty,
      "a 3-row config reload must not fire the scale warning")

    // data-sized (relative to an explicit threshold): warning fires,
    // names the table and the fix
    val big = freshSpec("CFG_BIG")
    Jdbc.write((1 to 150).map(i => (i, s"v$i")).toDF("id", "v"), big)
    val warn = Jdbc.unpartitionedWarning(big, threshold = 100L)
    assert(warn.exists(m => m.contains("CFG_BIG") && m.contains("partitionColumn")))
    // boundary: exactly-threshold rows are still "config-sized"
    assert(Jdbc.unpartitionedWarning(big, threshold = 150L).isEmpty)
    // the probe itself ships at most one row — sanity: it is row-exact
    assert(Jdbc.hasMoreRowsThan(big, 149L) && !Jdbc.hasMoreRowsThan(big, 150L))
  }

  test("src_jdbc op equals the parquet-side incremental extraction") {
    val viaJdbc = Registry.byName("src_jdbc").run(spark, sfDir)
    val viaParquet = graft.etl.ExtractionPlanner
      .extract(spark, sfDir, graft.meta.SampleCatalog.orders)
      .orderBy("Order_Key")
    assert(viaJdbc.count() > 0)
    assert(viaJdbc.exceptAll(viaParquet).count() == 0)
    assert(viaParquet.exceptAll(viaJdbc).count() == 0)
  }
}
