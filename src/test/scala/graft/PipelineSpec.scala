package graft

import graft.etl.Pipeline
import graft.meta.{ColumnConfig, ExtractSpec, SampleCatalog, TableConfig}
import org.scalatest.funsuite.AnyFunSuite

/** Failure semantics of the staging pipeline (ref: SMFG_DW_ETL_DAG.py
  * marks PARTIAL/FAILED and logs per-table errors without aborting
  * the rest of the run).
  */
class PipelineSpec extends AnyFunSuite with SparkSuite {

  private val broken = ExtractSpec(
    TableConfig(99, "warehouse", "orders"),
    Seq(ColumnConfig(991, 99, "no_such_column", Some("Broken"))))

  test("a failing table yields a FAILED stage row and PARTIAL master, others succeed") {
    val result = Pipeline.runStagingExtract(spark, sfDir, Seq(SampleCatalog.customer, broken))
    assert(result.master.status == "PARTIAL")
    val byTable = result.stages.map(s => s.tableId.get -> s.status).toMap
    assert(byTable(3) == "SUCCESS" && byTable(99) == "FAILED")
    assert(result.stages.find(_.tableId.contains(99)).get.errorMessage.nonEmpty)
  }

  test("rerunFailed retries ONLY failed tables and merges update-if-exists") {
    val first = Pipeline.runStagingExtract(spark, sfDir, Seq(SampleCatalog.customer, broken))
    assert(first.master.status == "PARTIAL")
    // the operator fixed the config (column now exists) and reruns
    val fixed = ExtractSpec(
      broken.table,
      Seq(ColumnConfig(991, 99, "o_orderkey", Some("Fixed"))))
    val rerun = Pipeline.rerunFailed(spark, sfDir, Seq(SampleCatalog.customer, fixed), first)
    assert(rerun.master.status == "SUCCESS")
    // one row per table — the FAILED row was REPLACED, not appended
    assert(rerun.stages.size == 2)
    val byTable = rerun.stages.map(s => s.tableId.get -> s).toMap
    assert(byTable(99).status == "SUCCESS" && byTable(99).rowCount.exists(_ > 0))
    // the successful table's original row carried over (same rowCount)
    assert(byTable(3) == first.stages.find(_.tableId.contains(3)).get)
    // both extracts available after the merge
    assert(rerun.extracts.keySet == Set("customer", "orders"))
  }

  test("runWithRetries: transient failure succeeds on retry, one stage row per attempt") {
    import scala.concurrent.duration.Duration
    val fixed = ExtractSpec(
      broken.table,
      Seq(ColumnConfig(991, 99, "o_orderkey", Some("Fixed"))))
    // catalog re-read per attempt: broken on attempt 1, fixed after —
    // the deterministic form of a transient failure (scheduler retry
    // picks up the repaired config/source)
    var calls = 0
    val catalog = () => {
      calls += 1
      Seq(SampleCatalog.customer, if (calls == 1) broken else fixed)
    }
    val (merged, attempts) = Pipeline.runWithRetries(spark, sfDir, catalog,
      Pipeline.RetryPolicy(retries = 2, delay = Duration.Zero))
    assert(merged.master.status == "SUCCESS")
    // retried once, then stopped early (no third attempt)
    assert(attempts.size == 2)
    // attempt 1: both tables; attempt 2: ONLY the failed table's new row
    assert(attempts(0).stages.size == 2)
    assert(attempts(0).stages.count(_.status == "FAILED") == 1)
    assert(attempts(1).stages.map(_.tableId) == Seq(Some(99)))
    assert(attempts(1).stages.head.status == "SUCCESS")
    // final audit: one row per table, update-if-exists applied
    assert(merged.stages.size == 2 && merged.stages.forall(_.status == "SUCCESS"))
  }

  test("runWithRetries stops at the cap and keeps the FAILED row") {
    import scala.concurrent.duration.Duration
    val (merged, attempts) = Pipeline.runWithRetries(spark, sfDir,
      () => Seq(SampleCatalog.customer, broken),
      Pipeline.RetryPolicy(retries = 2, delay = Duration.Zero))
    assert(merged.master.status == "PARTIAL")
    assert(attempts.size == 3) // initial + 2 capped retries
    assert(merged.stages.count(_.status == "FAILED") == 1)
  }

  test("rerunFailed keeps the FAILED row when the current catalog can't retry it") {
    val first = Pipeline.runStagingExtract(spark, sfDir, Seq(SampleCatalog.customer, broken))
    val rerun = Pipeline.rerunFailed(spark, sfDir, Seq(SampleCatalog.customer), first)
    assert(rerun.master.status == "PARTIAL")
    assert(rerun.stages.count(_.status == "FAILED") == 1)
  }

  test("zone config supplies output paths; per-table override wins") {
    val zones = graft.meta.MetaStore.sampleZones
    val overridden = SampleCatalog.customer.copy(table =
      SampleCatalog.customer.table.copy(stagingZonePath = Some("custom/path")))
    val result = Pipeline.runStagingExtract(spark, sfDir,
      Seq(overridden, SampleCatalog.part), zones = Some(zones))
    val byTable = result.stages.map(s => s.tableName -> s.outputPath).toMap
    assert(byTable("customer").contains("custom/path"))
    assert(byTable("part").contains("staging_zone/part"))
  }

  test("audit log round-trips through a JDBC database (reference's MySQL logger)") {
    import graft.sources.Jdbc
    val url = "jdbc:derby:memory:pipeline_audit;create=true"
    val result = Pipeline.runStagingExtract(spark, sfDir, Seq(SampleCatalog.customer, broken),
      zones = Some(graft.meta.MetaStore.sampleZones))
    Pipeline.writeAuditLog(spark, result, url)
    val master = Jdbc.read(spark, Jdbc.JdbcSourceSpec(url, "DW_PROCESS_MASTER")).collect()
    assert(master.length == 1)
    assert(master(0).getAs[String]("status") == "PARTIAL")
    val stages = Jdbc.read(spark, Jdbc.JdbcSourceSpec(url, "DW_PROCESS_STAGE_DETAIL"))
    assert(stages.count() == 2)
    import org.apache.spark.sql.functions.col
    assert(stages.filter(col("status") === "FAILED").count() == 1)
    assert(stages.filter(col("outputPath") === "staging_zone/customer").count() == 1)
  }

  test("writeStaged lands each successful extract under its zone path") {
    val root = java.nio.file.Files.createTempDirectory("graft_zone_root").toString
    val zones = graft.meta.MetaStore.sampleZones.copy(stagingZone = s"$root/staging")
    val result = Pipeline.runStagingExtract(spark, sfDir,
      Seq(SampleCatalog.customer, broken), zones = Some(zones))
    val written = Pipeline.writeStaged(result, zones)
    assert(written.keySet == Set("customer")) // FAILED table skipped
    val back = spark.read.parquet(written("customer"))
    assert(back.count() == Tables.load(spark, sfDir, "customer").count())
    assert(written("customer").startsWith(s"$root/staging/"))
  }

  test("inactive tables are skipped") {
    val inactive = SampleCatalog.part.copy(table = SampleCatalog.part.table.copy(activeFlag = false))
    val result = Pipeline.runStagingExtract(spark, sfDir, Seq(SampleCatalog.customer, inactive))
    assert(result.stages.map(_.tableName) == Seq("customer"))
    assert(result.master.status == "SUCCESS")
  }
}
