package graft.meta

/** Sample warehouse catalog over the testdata star schema — plays the
  * role of the reference's seeded config (ref: /root/reference/
  * source_code/sql/"2. SampleConfigInsert.sql", which configures one
  * source table with per-column aliases/include flags). Here the
  * sources are the TPC-H-shaped tables.
  *
  * TransformationLogic strings are ANSI SQL accepted by BOTH Spark's
  * `expr()` and DuckDB, so generated extractions stay oracle-checkable.
  */
object SampleCatalog {

  /** Exact per-row money product (SURVEY.md §5: factor-level decimal
    * casts; final double is exact for these magnitudes).
    */
  val netPriceExpr: String =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,4)) AS DOUBLE)"

  val lineitem: ExtractSpec = ExtractSpec(
    TableConfig(1, "warehouse", "lineitem", loadType = "FULL"),
    Seq(
      ColumnConfig(1, 1, "l_orderkey", Some("Order_Key")),
      ColumnConfig(2, 1, "l_linenumber", Some("Line_Number")),
      ColumnConfig(3, 1, "l_quantity", Some("Quantity")),
      ColumnConfig(4, 1, "l_extendedprice", Some("Extended_Price")),
      ColumnConfig(5, 1, "l_extendedprice", Some("Net_Price"), transformationLogic = Some(netPriceExpr)),
      ColumnConfig(6, 1, "l_returnflag", Some("Return_Flag")),
      ColumnConfig(7, 1, "l_shipdate", Some("Ship_Date"), transformationLogic = Some("CAST(l_shipdate AS DATE)")),
      ColumnConfig(8, 1, "l_shipdate", Some("Ship_Year"), transformationLogic = Some("CAST(year(l_shipdate) AS INT)")),
      ColumnConfig(9, 1, "l_tax", Some("Tax"), includeFlag = false),
      ColumnConfig(10, 1, "l_discount", Some("Discount"), includeFlag = false)
    )
  )

  val orders: ExtractSpec = ExtractSpec(
    TableConfig(2, "warehouse", "orders", loadType = "INCREMENTAL",
      incrementalFilter = Some("o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'")),
    Seq(
      ColumnConfig(11, 2, "o_orderkey", Some("Order_Key")),
      ColumnConfig(12, 2, "o_custkey", Some("Customer_Key")),
      ColumnConfig(13, 2, "o_orderstatus", Some("Order_Status")),
      ColumnConfig(14, 2, "o_totalprice", Some("Total_Price")),
      ColumnConfig(15, 2, "o_orderdate", Some("Order_Date"), transformationLogic = Some("CAST(o_orderdate AS DATE)")),
      ColumnConfig(16, 2, "o_orderpriority", Some("Order_Priority"))
    )
  )

  val customer: ExtractSpec = ExtractSpec(
    TableConfig(3, "warehouse", "customer", loadType = "FULL"),
    Seq(
      ColumnConfig(21, 3, "c_custkey", Some("Customer_Key")),
      ColumnConfig(22, 3, "c_name", Some("Customer_Name")),
      ColumnConfig(23, 3, "c_nationkey", Some("Nation_Key"), includeFlag = false),
      ColumnConfig(24, 3, "c_acctbal", Some("Account_Balance")),
      ColumnConfig(25, 3, "c_mktsegment", Some("Market_Segment"))
    )
  )

  val part: ExtractSpec = ExtractSpec(
    TableConfig(4, "warehouse", "part", loadType = "FULL"),
    Seq(
      ColumnConfig(31, 4, "p_partkey", Some("Part_Key")),
      ColumnConfig(32, 4, "p_name", Some("Part_Name")),
      ColumnConfig(33, 4, "p_brand", Some("Brand"), transformationLogic = Some("upper(p_brand)")),
      ColumnConfig(34, 4, "p_size", Some("Size_Class"),
        transformationLogic = Some("CASE WHEN p_size < 10 THEN 'SMALL' WHEN p_size < 30 THEN 'MEDIUM' ELSE 'LARGE' END")),
      ColumnConfig(35, 4, "p_type", Some("Type_Brand"), transformationLogic = Some("p_type || '/' || p_brand")),
      ColumnConfig(36, 4, "p_retailprice", Some("Retail_Price"))
    )
  )

  val all: Seq[ExtractSpec] = Seq(lineitem, orders, customer, part)

  /** DW output mapping for the staged lineitem (ref: DW_Output_Column_Config
    * — TargetColumnName/TargetDataType/TargetPosition/IsKey).
    */
  val lineitemOutput: Seq[OutputColumnConfig] = Seq(
    OutputColumnConfig(1, 1, 1, "Order_Key", "BIGINT", 1, isKey = true),
    OutputColumnConfig(2, 1, 1, "Line_Number", "INT", 2, isKey = true),
    OutputColumnConfig(3, 1, 1, "Line_Id", "BIGINT", 3,
      additionalTransform = Some("Order_Key * 100 + Line_Number")),
    OutputColumnConfig(4, 1, 1, "Ship_Date", "DATE", 4),
    OutputColumnConfig(5, 1, 1, "Net_Price", "DOUBLE", 5),
    OutputColumnConfig(6, 1, 1, "Return_Flag", "VARCHAR(1)", 6)
  )
}
