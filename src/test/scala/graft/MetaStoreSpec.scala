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
}
