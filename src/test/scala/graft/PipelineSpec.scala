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

  test("onFailure hook fires once with the still-failed rows and an ALERT audit row lands") {
    import scala.concurrent.duration.Duration
    var alerted: Seq[graft.meta.StageDetail] = Nil
    var fires = 0
    val (merged, _) = Pipeline.runWithRetries(spark, sfDir,
      () => Seq(SampleCatalog.customer, broken),
      Pipeline.RetryPolicy(retries = 1, delay = Duration.Zero,
        onFailure = rows => { fires += 1; alerted = rows }))
    assert(fires == 1)
    assert(alerted.map(_.tableId) == Seq(Some(99)))
    val alert = merged.stages.filter(_.stageName == "ALERT")
    assert(alert.size == 1)
    assert(alert.head.status == "SENT")
    assert(alert.head.tableName == "orders")
    assert(alert.head.rowCount.contains(1L))
    // the alert row rides the normal audit surface
    val log = Pipeline.stageLog(spark, merged)
    assert(log.filter(org.apache.spark.sql.functions.col("stage_name") === "ALERT").count() == 1)
  }

  test("a throwing onFailure hook is contained to an ALERT_FAILED row") {
    import scala.concurrent.duration.Duration
    val (merged, _) = Pipeline.runWithRetries(spark, sfDir,
      () => Seq(broken),
      Pipeline.RetryPolicy(retries = 0, delay = Duration.Zero,
        onFailure = _ => sys.error("mail relay down")))
    val alert = merged.stages.filter(_.stageName == "ALERT")
    assert(alert.size == 1 && alert.head.status == "ALERT_FAILED")
    assert(alert.head.errorMessage.exists(_.contains("mail relay down")))
  }

  test("no ALERT row when everything succeeds (with or without retries)") {
    import scala.concurrent.duration.Duration
    var fires = 0
    val (merged, _) = Pipeline.runWithRetries(spark, sfDir,
      () => Seq(SampleCatalog.customer),
      Pipeline.RetryPolicy(retries = 1, delay = Duration.Zero, onFailure = _ => fires += 1))
    assert(fires == 0)
    assert(!merged.stages.exists(_.stageName == "ALERT"))
  }

  test("preflight: vanished source is UNREACHABLE, drifted config is SCHEMA_DRIFT, good ones probe") {
    val zones = graft.meta.MetaStore.sampleZones
    val ghost = ExtractSpec(
      TableConfig(98, "warehouse", "no_such_table"),
      Seq(ColumnConfig(981, 98, "whatever")))
    val drifted = ExtractSpec(
      TableConfig(97, "warehouse", "part"),
      Seq(ColumnConfig(971, 97, "p_partkey"), ColumnConfig(972, 97, "p_gone")))
    val checks = graft.etl.Preflight.run(spark, sfDir,
      Seq(SampleCatalog.customer, ghost, drifted), zones)
    val byName = checks.filter(_.checkType == "source_probe").map(c => c.name -> c).toMap
    assert(byName("no_such_table").status == "UNREACHABLE")
    assert(byName("no_such_table").nRows == -1L)
    assert(byName("part").status == "SCHEMA_DRIFT" && byName("part").nMissing == 1)
    assert(byName("customer").status == "REACHABLE" && byName("customer").nRows > 0)
    // zone rows precede probes and a blank path is MISSING
    assert(checks.take(4).forall(c => c.checkType == "config" && c.status == "OK"))
    val blank = graft.etl.Preflight.run(spark, sfDir, Nil, zones.copy(logsPath = ""))
    assert(blank.find(_.name == "logs_path").get.status == "MISSING")
  }

  test("tunnel config validation: OK shape, and each broken field counts as invalid") {
    val good = graft.meta.MetaStore.sampleTunnel
    assert(graft.etl.Preflight.tunnelCheck(good, 9).status == "OK")
    assert(graft.etl.Preflight.tunnelCheck(good, 9).nMissing == 0)
    val broken = good.copy(sshHost = " ", sshPort = 0, keyPath = "",
      remotePort = 70000)
    val c = graft.etl.Preflight.tunnelCheck(broken, 9)
    assert(c.status == "INVALID" && c.nMissing == 4)
    // local bind colliding with the ssh port is its own rule
    val collide = good.copy(localPort = good.sshPort)
    assert(graft.etl.Preflight.tunnelCheck(collide, 9).nMissing == 1)
    // the gated op carries the tunnel row
    val run = graft.etl.Preflight.run(spark, sfDir, Nil, zones = graft.meta.MetaStore.sampleZones,
      tunnel = Some(good))
    assert(run.last.checkType == "tunnel_config" && run.last.status == "OK")
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
