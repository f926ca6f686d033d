package graft

import graft.etl.ExtractionPlanner
import graft.meta._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ExtractionPlannerSpec extends AnyFunSuite with SparkSuite {

  test("renderSql reproduces the reference's generated query shape") {
    // ref: Staging_Extraction_Metadata_Query.sql — SELECT <transform-or-col
    // AS alias, ...> FROM schema.table [WHERE incrementalFilter]
    val sql = ExtractionPlanner.renderSql(SampleCatalog.orders)
    assert(sql.startsWith("SELECT o_orderkey AS Order_Key, "))
    assert(sql.contains(" FROM warehouse.orders WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'"))
    assert(ExtractionPlanner.renderSql(SampleCatalog.customer).endsWith("FROM warehouse.customer"))
  }

  test("include-flag pruning and aliasing") {
    val df = ExtractionPlanner.extract(spark, sfDir, SampleCatalog.customer)
    assert(df.columns.toSeq ==
      Seq("Customer_Key", "Customer_Name", "Account_Balance", "Market_Segment"))
  }

  test("incremental filter reduces rows") {
    val full = Tables.load(spark, sfDir, "orders").count()
    val inc = ExtractionPlanner.extract(spark, sfDir, SampleCatalog.orders).count()
    assert(inc > 0 && inc < full)
  }

  test("output mapping applies target types and position order") {
    val staged = ExtractionPlanner.extract(spark, sfDir, SampleCatalog.lineitem)
    val out = ExtractionPlanner.mapToOutput(staged, SampleCatalog.lineitemOutput)
    assert(out.columns.toSeq ==
      Seq("Order_Key", "Line_Number", "Line_Id", "Ship_Date", "Net_Price", "Return_Flag"))
    val types = out.schema.fields.map(_.dataType).toSeq
    assert(types == Seq(LongType, IntegerType, LongType, DateType, DoubleType, StringType))
  }
}
