package graft

import graft.etl.ExtractionPlanner
import graft.meta.MetaStore
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class MetaStoreSpec extends AnyFunSuite with SparkSuite {

  test("catalog round-trips through parquet and drives identical extraction") {
    val tmp = Files.createTempDirectory("graft_meta").toString
    MetaStore.save(spark, MetaStore.sample, tmp)
    val loaded = MetaStore.load(spark, tmp)
    assert(loaded.tables.map(_.tableName).sorted ==
      MetaStore.sample.tables.map(_.tableName).sorted)
    val sqlBefore = ExtractionPlanner.renderSql(MetaStore.sample.specFor(2))
    val sqlAfter = ExtractionPlanner.renderSql(loaded.specFor(2))
    assert(sqlBefore == sqlAfter)
    assert(loaded.activeSpecs.size == MetaStore.sample.activeSpecs.size)
    val n = ExtractionPlanner.extract(spark, sfDir, loaded.specFor(1)).count()
    assert(n == Tables.load(spark, sfDir, "lineitem").count())
  }

  test("zone config round-trips and selects by environment") {
    import graft.meta.ZoneConfig
    val tmp = Files.createTempDirectory("graft_zones").toString
    val dev = MetaStore.sampleZones
    val prod = ZoneConfig("PROD", "s3://lake/raw", "s3://lake/staging",
      "s3://lake/curated", "s3://lake/logs")
    MetaStore.saveZones(spark, Seq(dev, prod), tmp)
    assert(MetaStore.loadZones(spark, tmp, "DEV") == dev)
    val p = MetaStore.loadZones(spark, tmp, "PROD")
    assert(p.stagingPathFor("orders") == "s3://lake/staging/orders")
    assertThrows[RuntimeException](MetaStore.loadZones(spark, tmp, "UAT"))
  }
}
