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

  test("inactive tables are skipped") {
    val inactive = SampleCatalog.part.copy(table = SampleCatalog.part.table.copy(activeFlag = false))
    val result = Pipeline.runStagingExtract(spark, sfDir, Seq(SampleCatalog.customer, inactive))
    assert(result.stages.map(_.tableName) == Seq("customer"))
    assert(result.master.status == "SUCCESS")
  }
}
