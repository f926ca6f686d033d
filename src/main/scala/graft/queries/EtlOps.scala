package graft.queries

import graft.{Op, Tables}
import graft.etl.{Consolidator, ExtractionPlanner, Merger, Pipeline, QualityChecks, Skew}
import graft.meta.SampleCatalog
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ETL / warehouse-core capabilities (SURVEY.md §2 first block) —
  * the reference's actual surface, re-expressed as Catalyst plans.
  */
object EtlOps {

  private def finSql(inner: String): String =
    s"CAST(CAST(round($inner, 4) AS DECIMAL(28,4)) AS DOUBLE)"

  // ---------------------------------------------------------------
  // meta_extract — the generated extraction for the configured
  // lineitem table: include-flag pruning, aliasing, per-column
  // transforms (ref: Staging_Extraction_Metadata_Query.sql).
  // ---------------------------------------------------------------
  private def metaExtract(s: SparkSession, dir: String): DataFrame =
    ExtractionPlanner.extract(s, dir, SampleCatalog.lineitem)
      .orderBy("Order_Key", "Line_Number")

  private[queries] val metaExtractSql =
    s"""SELECT l_orderkey AS Order_Key, l_linenumber AS Line_Number, l_quantity AS Quantity,
      | l_extendedprice AS Extended_Price,
      | ${SampleCatalog.netPriceExpr} AS Net_Price,
      | l_returnflag AS Return_Flag,
      | CAST(l_shipdate AS DATE) AS Ship_Date,
      | CAST(year(l_shipdate) AS INT) AS Ship_Year
      |FROM lineitem
      |ORDER BY Order_Key, Line_Number""".stripMargin

  // ---------------------------------------------------------------
  // etl_full_load — FULL load with column subset + rename.
  // ---------------------------------------------------------------
  private def fullLoad(s: SparkSession, dir: String): DataFrame =
    ExtractionPlanner.extract(s, dir, SampleCatalog.customer).orderBy("Customer_Key")

  private val fullLoadSql =
    """SELECT c_custkey AS Customer_Key, c_name AS Customer_Name,
      | c_acctbal AS Account_Balance, c_mktsegment AS Market_Segment
      |FROM customer
      |ORDER BY Customer_Key""".stripMargin

  // ---------------------------------------------------------------
  // etl_incremental_load — IncrementalFilter applied at the scan
  // (predicate pushdown does the partition pruning at scale).
  // ---------------------------------------------------------------
  private def incrementalLoad(s: SparkSession, dir: String): DataFrame =
    ExtractionPlanner.extract(s, dir, SampleCatalog.orders).orderBy("Order_Key")

  private val incrementalLoadSql =
    """SELECT o_orderkey AS Order_Key, o_custkey AS Customer_Key, o_orderstatus AS Order_Status,
      | o_totalprice AS Total_Price, CAST(o_orderdate AS DATE) AS Order_Date,
      | o_orderpriority AS Order_Priority
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      |ORDER BY Order_Key""".stripMargin

  // ---------------------------------------------------------------
  // etl_transform — per-column TransformationLogic (CASE, string
  // functions, concatenation) executed inside codegen.
  // ---------------------------------------------------------------
  private def transform(s: SparkSession, dir: String): DataFrame =
    ExtractionPlanner.extract(s, dir, SampleCatalog.part).orderBy("Part_Key")

  private val transformSql =
    """SELECT p_partkey AS Part_Key, p_name AS Part_Name, upper(p_brand) AS Brand,
      | CASE WHEN p_size < 10 THEN 'SMALL' WHEN p_size < 30 THEN 'MEDIUM' ELSE 'LARGE' END AS Size_Class,
      | p_type || '/' || p_brand AS Type_Brand,
      | p_retailprice AS Retail_Price
      |FROM part
      |ORDER BY Part_Key""".stripMargin

  // ---------------------------------------------------------------
  // etl_output_mapping — target names, TargetDataType casts,
  // TargetPosition ordering, AdditionalTransform.
  // ---------------------------------------------------------------
  private def outputMapping(s: SparkSession, dir: String): DataFrame = {
    val staged = ExtractionPlanner.extract(s, dir, SampleCatalog.lineitem)
    ExtractionPlanner.mapToOutput(staged, SampleCatalog.lineitemOutput)
      .orderBy("Order_Key", "Line_Number")
  }

  private val outputMappingSql =
    s"""SELECT CAST(l_orderkey AS BIGINT) AS Order_Key,
      | CAST(l_linenumber AS INT) AS Line_Number,
      | CAST(l_orderkey * 100 + l_linenumber AS BIGINT) AS Line_Id,
      | CAST(l_shipdate AS DATE) AS Ship_Date,
      | CAST(${SampleCatalog.netPriceExpr} AS DOUBLE) AS Net_Price,
      | CAST(l_returnflag AS VARCHAR) AS Return_Flag
      |FROM lineitem
      |ORDER BY Order_Key, Line_Number""".stripMargin

  // ---------------------------------------------------------------
  // etl_merge_upsert — IsKey MERGE semantics: latest version wins.
  // Staging batch = updates (key%5) + inserts (key%7, offset ids).
  // ---------------------------------------------------------------
  private def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val dw = o.select(
      col("o_orderkey").as("order_key"), lit(1).as("version"),
      col("o_totalprice").cast("decimal(18,2)").as("total_dec"),
      col("o_orderstatus").as("order_status"))
    val upd = o.filter(col("o_orderkey") % 5 === 0).select(
      col("o_orderkey").as("order_key"), lit(2).as("version"),
      round(col("o_totalprice").cast("decimal(18,2)") * lit(1.05).cast("decimal(8,4)"), 2)
        .cast("decimal(18,2)").as("total_dec"),
      lit("U").as("order_status"))
    val ins = o.filter(col("o_orderkey") % 7 === 0).select(
      (col("o_orderkey") + lit(10000000L)).as("order_key"), lit(1).as("version"),
      col("o_totalprice").cast("decimal(18,2)").as("total_dec"),
      lit("I").as("order_status"))
    Merger.upsert(dw, upd.unionByName(ins), Seq("order_key"), Seq(col("version").desc))
      .select(col("order_key"), col("version"),
        col("total_dec").cast("double").as("total_price"), col("order_status"))
      .orderBy("order_key")
  }

  private val mergeUpsertSql =
    """WITH dw AS (
      |  SELECT o_orderkey AS order_key, 1 AS version,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS total_dec, o_orderstatus AS order_status
      |  FROM orders),
      |upd AS (
      |  SELECT o_orderkey, 2,
      |    CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.05 AS DECIMAL(8,4)), 2) AS DECIMAL(18,2)), 'U'
      |  FROM orders WHERE o_orderkey % 5 = 0),
      |ins AS (
      |  SELECT o_orderkey + 10000000, 1, CAST(o_totalprice AS DECIMAL(18,2)), 'I'
      |  FROM orders WHERE o_orderkey % 7 = 0),
      |u AS (SELECT * FROM dw UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM ins),
      |r AS (SELECT *, row_number() OVER (PARTITION BY order_key ORDER BY version DESC) AS rn FROM u)
      |SELECT order_key, version, CAST(total_dec AS DOUBLE) AS total_price, order_status
      |FROM r WHERE rn = 1
      |ORDER BY order_key""".stripMargin

  // ---------------------------------------------------------------
  // etl_scd2 — SCD2 historization: [valid_from, valid_to) + current
  // flag, one partitioned window over the key.
  // ---------------------------------------------------------------
  private def scd2(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val v1 = o.select(col("o_orderkey").as("order_key"), lit(1).as("version"),
      to_date(col("o_orderdate")).as("eff"))
    val v2 = o.filter(col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey").as("order_key"), lit(2).as("version"),
        date_add(to_date(col("o_orderdate")), 30).as("eff"))
    Merger.scd2(v1.unionByName(v2), Seq("order_key"), Seq(col("version")), col("eff"))
      .select("order_key", "version", "valid_from", "valid_to", "is_current")
      .orderBy("order_key", "version")
    // valid_to is the 9999-12-31 sentinel for current rows (never NULL)
  }

  private val scd2Sql =
    """WITH v AS (
      |  SELECT o_orderkey AS order_key, 1 AS version, CAST(o_orderdate AS DATE) AS eff FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, 2, CAST(o_orderdate AS DATE) + 30 FROM orders WHERE o_orderkey % 5 = 0)
      |SELECT order_key, version, eff AS valid_from,
      |  coalesce(lead(eff) OVER (PARTITION BY order_key ORDER BY version), DATE '9999-12-31') AS valid_to,
      |  CASE WHEN lead(eff) OVER (PARTITION BY order_key ORDER BY version) IS NULL THEN 1 ELSE 0 END AS is_current
      |FROM v
      |ORDER BY order_key, version""".stripMargin

  // ---------------------------------------------------------------
  // etl_scd2_pointintime — the query SCD2 historization EXISTS for:
  // facts joined to the dimension version that was valid AT FACT
  // TIME (late-arriving/retro-dated facts land on historical
  // versions, not the current row — the classic type-2 point-in-time
  // join). A deterministic two-version customer dim (every third
  // customer's segment changes on 1998-01-01) is historized through
  // the same Merger.scd2 the etl_scd2 op gates, then orders join on
  // (custkey equality + orderdate ∈ [valid_from, valid_to)) — at
  // scale an equality-key shuffle join with a residual range filter,
  // never a range-only join. Every order matches EXACTLY one version
  // interval by construction (intervals partition the timeline), so
  // the aggregate's order count conserves — the spec locks that.
  // ---------------------------------------------------------------
  private def scd2PointInTime(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val v1 = c.select(col("c_custkey").as("cust_key"), lit(1).as("version"),
      col("c_mktsegment").as("segment"), to_date(lit("1992-01-01")).as("eff"))
    val v2 = c.filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey").as("cust_key"), lit(2).as("version"),
        concat(col("c_mktsegment"), lit("-V2")).as("segment"),
        to_date(lit("1998-01-01")).as("eff"))
    val dim = Merger.scd2(v1.unionByName(v2), Seq("cust_key"),
        Seq(col("version")), col("eff"))
      .select("cust_key", "version", "segment", "valid_from", "valid_to")
    val o = Tables.load(s, dir, "orders")
      .select(col("o_custkey").as("cust_key"),
        to_date(col("o_orderdate")).as("od"), col("o_totalprice"))
    o.join(dim, Seq("cust_key"))
      .filter(col("od") >= col("valid_from") && col("od") < col("valid_to"))
      .groupBy("segment", "version")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("decimal(28,4)")
          .cast("double").as("sum_price"))
      .orderBy("segment", "version")
  }

  private val scd2PointInTimeSql =
    """WITH v AS (
      |  SELECT c_custkey AS cust_key, 1 AS version, c_mktsegment AS segment,
      |    DATE '1992-01-01' AS eff FROM customer
      |  UNION ALL
      |  SELECT c_custkey, 2, c_mktsegment || '-V2', DATE '1998-01-01'
      |  FROM customer WHERE c_custkey % 3 = 0),
      |d AS (
      |  SELECT cust_key, version, segment, eff AS valid_from,
      |    coalesce(lead(eff) OVER (PARTITION BY cust_key ORDER BY version),
      |             DATE '9999-12-31') AS valid_to
      |  FROM v),
      |o AS (SELECT o_custkey AS cust_key, CAST(o_orderdate AS DATE) AS od, o_totalprice
      |      FROM orders)
      |SELECT segment, version, count(*) AS n_orders,
      |  CAST(CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 4) AS DECIMAL(28,4)) AS DOUBLE) AS sum_price
      |FROM o JOIN d ON o.cust_key = d.cust_key
      |  AND o.od >= d.valid_from AND o.od < d.valid_to
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  // etl_dedup_latest — staging-replay collapse: latest event per
  // (user, type) by integer epoch seconds (portable ns handling).
  // ---------------------------------------------------------------
  private def dedupLatest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), expr("ts DIV 1000000000").as("es"),
        col("event_id"), col("value"))
    Merger.dedupLatest(ev, Seq("user_id", "event_type"),
      Seq(col("es").desc, col("event_id").desc))
      .orderBy("user_id", "event_type")
  }

  private val dedupLatestSql =
    """SELECT user_id, event_type, es, event_id, value FROM (
      |  SELECT user_id, event_type, epoch_ns(ts)//1000000000 AS es, event_id, value,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY epoch_ns(ts)//1000000000 DESC, event_id DESC) AS rn
      |  FROM events) x
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  // ---------------------------------------------------------------
  // etl_dq_checks — null / duplicate-key / referential-integrity /
  // rowcount audit bundle.
  // ---------------------------------------------------------------
  private def dqChecks(s: SparkSession, dir: String): DataFrame = QualityChecks.audit(s, dir)

  private val dqChecksSql =
    """SELECT * FROM (
      |  SELECT 'dup_key_rows' AS check_name, 'lineitem' AS table_name,
      |    CAST(coalesce((SELECT sum(n-1) FROM (SELECT count(*) AS n FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING count(*)>1) t), 0) AS BIGINT) AS metric
      |  UNION ALL SELECT 'null_o_custkey', 'orders', (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
      |  UNION ALL SELECT 'orphan_o_custkey', 'orders', (SELECT count(*) FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |  UNION ALL SELECT 'orphan_l_orderkey', 'lineitem', (SELECT count(*) FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      |  UNION ALL SELECT 'rowcount', 'orders', (SELECT count(*) FROM orders)
      |  UNION ALL SELECT 'rowcount', 'lineitem', (SELECT count(*) FROM lineitem)
      |) a ORDER BY check_name, table_name""".stripMargin

  // ---------------------------------------------------------------
  // etl_consolidate — content invariants of chunked→consolidated
  // staging (row preservation, all-null-row drop); the file-level
  // writer path is exercised in ConsolidatorSpec.
  // ---------------------------------------------------------------
  private def consolidate(s: SparkSession, dir: String): DataFrame = {
    val chunked = Tables.load(s, dir, "lineitem").repartition(64) // simulate many small chunk files
    Consolidator.dropAllNullRows(chunked)
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(28,4)").cast("double").as("sum_qty"))
  }

  private val consolidateSql =
    s"""SELECT count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_orders,
      | ${finSql("sum(CAST(l_quantity AS DECIMAL(18,2)))")} AS sum_qty
      |FROM lineitem""".stripMargin

  // ---------------------------------------------------------------
  // etl_process_log — the DAG's INIT→STAGING_EXTRACT audit trail as
  // a Dataset (deterministic projection, no wall-clock columns).
  // ---------------------------------------------------------------
  private def processLog(s: SparkSession, dir: String): DataFrame = {
    // zone-config-derived output paths (ref: config.yaml PATHS block) —
    // per-table overrides stay possible via TableConfig.stagingZonePath
    val result = Pipeline.runStagingExtract(s, dir, SampleCatalog.all,
      zones = Some(graft.meta.MetaStore.sampleZones))
    Pipeline.stageLog(s, result).orderBy("table_id")
  }

  private val processLogSql =
    """SELECT 'STAGING_EXTRACT' AS stage_name, 1 AS table_id, 'lineitem' AS table_name,
      |  CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS row_count, 'SUCCESS' AS status,
      |  'staging_zone/lineitem' AS output_path
      |UNION ALL SELECT 'STAGING_EXTRACT', 2, 'orders',
      |  (SELECT count(*) FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'), 'SUCCESS', 'staging_zone/orders'
      |UNION ALL SELECT 'STAGING_EXTRACT', 3, 'customer', (SELECT count(*) FROM customer), 'SUCCESS', 'staging_zone/customer'
      |UNION ALL SELECT 'STAGING_EXTRACT', 4, 'part', (SELECT count(*) FROM part), 'SUCCESS', 'staging_zone/part'
      |ORDER BY table_id""".stripMargin

  // ---------------------------------------------------------------
  // etl_end_to_end — the whole reference DAG as one Catalyst
  // lineage: config-driven extract → DW output mapping → key-based
  // merge with a simulated correction batch → loaded-table audit.
  // (INIT → STAGING_EXTRACT → TRANSFORMATION → DATA_WAREHOUSE_LOAD.)
  // ---------------------------------------------------------------
  private def endToEnd(s: SparkSession, dir: String): DataFrame = {
    val staged = ExtractionPlanner.extract(s, dir, SampleCatalog.lineitem)
    val dw = ExtractionPlanner.mapToOutput(staged, SampleCatalog.lineitemOutput)
      .withColumn("version", lit(1))
    // correction batch: Net_Price restated for one order slice
    val corrections = dw.filter(col("Order_Key") % 100 === 0)
      .withColumn("Net_Price", col("Net_Price") + lit(1.0))
      .withColumn("version", lit(2))
    // the synthetic lineitem key has real duplicates — tiebreak the
    // version order by the payload so the winner is engine-independent
    val merged = Merger.upsert(dw, corrections, Seq("Order_Key", "Line_Number"),
      Seq(col("version").desc, col("Net_Price")))
    merged.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("version") === 2, 1).otherwise(0)).cast("bigint").as("n_corrected"),
      // 18,4 NOT 18,2: Net_Price carries exactly 4 decimal digits, so
      // the cast is exact — scale-down re-rounding is the known
      // cross-engine midpoint trap (SURVEY.md §7.1)
      sum(col("Net_Price").cast("decimal(18,4)")).cast("decimal(28,4)").cast("double").as("total_net"))
  }

  private val endToEndSql =
    s"""WITH staged AS (
      |  SELECT l_orderkey AS Order_Key, l_linenumber AS Line_Number,
      |         ${SampleCatalog.netPriceExpr} AS Net_Price
      |  FROM lineitem),
      |dw AS (SELECT Order_Key, Line_Number, Net_Price, 1 AS version FROM staged),
      |corr AS (SELECT Order_Key, Line_Number, Net_Price + 1.0, 2 FROM dw WHERE Order_Key % 100 = 0),
      |u AS (SELECT * FROM dw UNION ALL SELECT * FROM corr),
      |m AS (SELECT *, row_number() OVER (PARTITION BY Order_Key, Line_Number ORDER BY version DESC, Net_Price) AS rn FROM u)
      |SELECT count(*) AS n_rows,
      |  CAST(sum(CASE WHEN version = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrected,
      |  ${finSql("sum(CAST(Net_Price AS DECIMAL(18,4)))")} AS total_net
      |FROM m WHERE rn = 1""".stripMargin

  // ---------------------------------------------------------------
  // meta_sqlgen — the generated extraction-query TEXT per configured
  // table (the reference's Staging_Extraction_Metadata_Query.sql
  // produces exactly this (tableName, DataExtractQuery) rowset; we
  // keep it for audit parity even though execution goes through
  // Catalyst columns, not SQL strings).
  // ---------------------------------------------------------------
  private def sqlGen(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    SampleCatalog.all
      .map(spec => (spec.table.tableId, spec.table.tableName, ExtractionPlanner.renderSql(spec)))
      .toDF("table_id", "table_name", "extract_query")
      .orderBy("table_id")
  }

  private val sqlGenSql = {
    def lit(sqlText: String) = sqlText.replace("'", "''")
    SampleCatalog.all.map { spec =>
      s"SELECT ${spec.table.tableId} AS table_id, '${spec.table.tableName}' AS table_name, " +
        s"'${lit(ExtractionPlanner.renderSql(spec))}' AS extract_query"
    }.mkString("", "\nUNION ALL ", "\nORDER BY table_id")
  }

  // ---------------------------------------------------------------
  // etl_cdc_diff — change-data-capture between two warehouse
  // snapshots: full-outer join on the key + md5 row-fingerprint
  // comparison classifies every key as INSERT / UPDATE / DELETE /
  // UNCHANGED in one shuffle. This is the missing half of the
  // reference's incremental load: watermark filters catch appends,
  // CDC diffs catch in-place mutation and deletion. The simulated new
  // snapshot deletes key%11, restates key%7 and appends shifted keys.
  // ---------------------------------------------------------------
  private def cdcDiff(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    def fingerprinted(df: DataFrame) = df.select(
      col("order_key"),
      md5(concat_ws("|", col("order_status"), col("total_cents").cast("string"))).as("fp"))
    val prev = fingerprinted(o.select(
      col("o_orderkey").as("order_key"), col("o_orderstatus").as("order_status"),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint").as("total_cents")))
    val next = fingerprinted(
      o.filter(col("o_orderkey") % 11 =!= 0) // deletes
        .select(col("o_orderkey").as("order_key"),
          when(col("o_orderkey") % 7 === 0, lit("X")).otherwise(col("o_orderstatus"))
            .as("order_status"), // restatements
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint").as("total_cents"))
        .unionByName(o.select((col("o_orderkey") + 90000000L).as("order_key"),
          lit("N").as("order_status"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint").as("total_cents"))
          .filter(col("order_key") % 90000013L === 3))) // sparse inserts
    prev.as("p").join(next.as("n"), Seq("order_key"), "full_outer")
      .withColumn("change_type",
        when(col("p.fp").isNull, "INSERT")
          .when(col("n.fp").isNull, "DELETE")
          .when(col("p.fp") =!= col("n.fp"), "UPDATE")
          .otherwise("UNCHANGED"))
      .groupBy("change_type")
      .agg(count(lit(1)).as("n_keys"))
      .orderBy("change_type")
  }

  private val cdcDiffSql =
    """WITH base AS (
      |  SELECT o_orderkey AS order_key, o_orderstatus AS order_status,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS total_cents
      |  FROM orders),
      |prev AS (SELECT order_key, md5(order_status || '|' || CAST(total_cents AS VARCHAR)) AS fp FROM base),
      |nexts AS (
      |  SELECT order_key,
      |    md5(CASE WHEN order_key % 7 = 0 THEN 'X' ELSE order_status END
      |        || '|' || CAST(total_cents AS VARCHAR)) AS fp
      |  FROM base WHERE order_key % 11 <> 0
      |  UNION ALL
      |  SELECT order_key + 90000000, md5('N' || '|' || CAST(total_cents AS VARCHAR))
      |  FROM base WHERE (order_key + 90000000) % 90000013 = 3),
      |d AS (
      |  SELECT CASE WHEN p.fp IS NULL THEN 'INSERT'
      |              WHEN n.fp IS NULL THEN 'DELETE'
      |              WHEN p.fp <> n.fp THEN 'UPDATE'
      |              ELSE 'UNCHANGED' END AS change_type
      |  FROM prev p FULL OUTER JOIN nexts n USING (order_key))
      |SELECT change_type, count(*) AS n_keys
      |FROM d GROUP BY change_type
      |ORDER BY change_type""".stripMargin

  // ---------------------------------------------------------------
  // etl_salted_agg — two-phase salted aggregation over a HOT 3-value
  // key (l_returnflag funnels a third of 100 TB into one task under
  // plain groupBy): phase 1 aggregates per (key, salt shard), phase 2
  // merges shards — identical result to the direct aggregate (the
  // oracle is the plain GROUP BY), `salt`× the reduce parallelism.
  // ---------------------------------------------------------------
  private def saltedAgg(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    Skew.saltedAggregate(
      Tables.load(s, dir, "lineitem"),
      keys = Seq("l_returnflag"),
      partials = Seq(
        (count(lit(1)), "n_lines"),
        (sum(col("l_quantity").cast("decimal(18,2)")), "qty_dec")),
      merges = names => Seq(
        sum(col(names.head)).as("n_lines"),
        sum(col(names(1))).cast("decimal(28,4)").cast("double").as("sum_qty")))
      .orderBy("l_returnflag")
  }

  private val saltedAggSql =
    s"""SELECT l_returnflag, count(*) AS n_lines,
      | ${finSql("sum(CAST(l_quantity AS DECIMAL(18,2)))")} AS sum_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------
  // etl_bloom_prefilter — Bloom-filter semi-join pre-filter, the
  // standard move before an expensive 100 TB join: build a k-hash
  // bitmap over the build side's join keys (here: customers with a
  // recent order), broadcast it (m = 64 Ki bits ≈ 8 KB as a distinct-
  // positions relation), and probe the other side map-side so only
  // possible members reach the shuffle. Spark's own runtime bloom
  // join does this opaquely; this op materializes the sketch as DATA
  // so the pipeline can persist/reuse/audit it, and reports the
  // false-positive audit against exact membership alongside (Bloom
  // filters never false-negative — the spec proves it). Hashing is
  // the engine-portable md5 double-hash h1 + i·h2 (Kirsch-
  // Mitzenmacher), all arithmetic 60-bit integer — oracle-exact.
  // ---------------------------------------------------------------
  private val BloomM = 65536L
  private val BloomK = 3
  private val BloomHorizon = "2000-06-01"

  private def bloomPrefilter(s: SparkSession, dir: String): DataFrame = {
    def h1(k: Column): Column =
      expr(s"CAST(conv(substr(md5(CAST(${k.toString} AS STRING)), 1, 15), 16, 10) AS BIGINT)")
    def h2(k: Column): Column =
      expr(s"CAST(conv(substr(md5(CAST(${k.toString} AS STRING)), 16, 15), 16, 10) AS BIGINT)")
    def positions(df: DataFrame, key: String): DataFrame =
      df.withColumn("h1", h1(col(key))).withColumn("h2", h2(col(key)))
        .select(col(key), explode(array((0 until BloomK).map(i =>
          (col("h1") + lit(i.toLong) * col("h2")) % BloomM): _*)).as("bit"))
    val members = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit(BloomHorizon).cast("timestamp"))
      .select(col("o_custkey")).distinct()
    val bits = positions(members, "o_custkey").select("bit").distinct()
    val hits = positions(Tables.load(s, dir, "customer").select("c_custkey"), "c_custkey")
      .join(broadcast(bits), "bit")
      .groupBy("c_custkey").agg(count(lit(1)).as("n_hit"))
    Tables.load(s, dir, "customer").select("c_custkey")
      .join(hits, Seq("c_custkey"), "left")
      .join(members.withColumn("tm", lit(1)),
        col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"),
        when(coalesce(col("n_hit"), lit(0L)) === BloomK, 1).otherwise(0).as("bloom_member"),
        coalesce(col("tm"), lit(0)).as("true_member"))
      .orderBy("c_custkey")
  }

  private val bloomPrefilterSql =
    s"""WITH members AS (
      |  SELECT DISTINCT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '$BloomHorizon'),
      |mh AS (SELECT o_custkey,
      |    (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT) AS h1,
      |    (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 16, 15))::BIGINT) AS h2
      |  FROM members),
      |bits AS (SELECT DISTINCT (h1 + i * h2) % $BloomM AS bit
      |  FROM mh, LATERAL (SELECT unnest(range(0, $BloomK)) AS i) g),
      |ph AS (SELECT c_custkey,
      |    (('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT) AS h1,
      |    (('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 16, 15))::BIGINT) AS h2
      |  FROM customer),
      |pb AS (SELECT c_custkey, (h1 + i * h2) % $BloomM AS bit
      |  FROM ph, LATERAL (SELECT unnest(range(0, $BloomK)) AS i) g),
      |hits AS (SELECT pb.c_custkey, count(*) AS n_hit
      |  FROM pb JOIN bits ON pb.bit = bits.bit GROUP BY 1)
      |SELECT c.c_custkey,
      |  CASE WHEN coalesce(h.n_hit, 0) = $BloomK THEN 1 ELSE 0 END AS bloom_member,
      |  CASE WHEN m.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS true_member
      |FROM customer c
      |LEFT JOIN hits h ON c.c_custkey = h.c_custkey
      |LEFT JOIN members m ON c.c_custkey = m.o_custkey
      |ORDER BY c.c_custkey""".stripMargin

  // ---------------------------------------------------------------
  // etl_zorder_layout — Z-order clustering key + the data-skipping
  // audit that justifies it: interleave the bits of two join/filter
  // dimensions (part, supplier) into one sort key, bucket the sorted
  // order, and report per-bucket min/max of BOTH dims. A single-
  // column sort bounds only its own column; the Z-curve bounds both,
  // so parquet row-group min/max stats prune scans on EITHER
  // predicate — the multi-dimensional layout move (Delta/Iceberg
  // OPTIMIZE ZORDER) for a 100 TB fact table. The interleave is pure
  // integer bit arithmetic generated once here and mirrored verbatim
  // into the oracle; the audit is one map-side-combined aggregate
  // over the derived bucket.
  // ---------------------------------------------------------------
  private val ZBits = 16   // low bits interleaved per dimension
  private val ZBucketShift = 14 // bucket = zv >> shift

  private def zTermsSpark: String = (0 until ZBits).map { j =>
    s"shiftleft(shiftright(l_partkey, $j) & 1, ${2 * j}) + " +
      s"shiftleft(shiftright(l_suppkey, $j) & 1, ${2 * j + 1})"
  }.mkString(" + ")

  private def zTermsDuck: String = (0 until ZBits).map { j =>
    s"(((l_partkey >> $j) & 1) << ${2 * j}) + (((l_suppkey >> $j) & 1) << ${2 * j + 1})"
  }.mkString(" + ")

  private def zorderLayout(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        expr(s"CAST($zTermsSpark AS BIGINT)").as("zv"))
      .withColumn("z_bucket", expr(s"shiftright(zv, $ZBucketShift)"))
      .groupBy("z_bucket")
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"),
        min(col("l_suppkey")).as("sk_min"), max(col("l_suppkey")).as("sk_max"))
      .withColumn("pk_span", col("pk_max") - col("pk_min"))
      .withColumn("sk_span", col("sk_max") - col("sk_min"))
      .orderBy("z_bucket")

  private val zorderLayoutSql =
    s"""WITH z AS (
      |  SELECT l_partkey, l_suppkey, CAST($zTermsDuck AS BIGINT) AS zv
      |  FROM lineitem),
      |b AS (SELECT zv >> $ZBucketShift AS z_bucket, l_partkey, l_suppkey FROM z)
      |SELECT z_bucket, count(*) AS n_rows,
      |  min(l_partkey) AS pk_min, max(l_partkey) AS pk_max,
      |  min(l_suppkey) AS sk_min, max(l_suppkey) AS sk_max,
      |  max(l_partkey) - min(l_partkey) AS pk_span,
      |  max(l_suppkey) - min(l_suppkey) AS sk_span
      |FROM b
      |GROUP BY z_bucket
      |ORDER BY z_bucket""".stripMargin

  // ---------------------------------------------------------------
  // etl_late_arriving — late-arriving dimension handling (the
  // Kimball "inferred member" pattern every warehouse load needs:
  // facts land referencing dimension keys the dim feed hasn't
  // delivered yet; the load must neither drop nor stall them).
  // Deterministic replay: customers with c_custkey % 20 = 0 are the
  // LATE dim rows (held out of the initial dim load). Stage 1 —
  // facts (orders) resolve against the early dim; unresolved keys
  // insert INFERRED members (segment 'UNKNOWN'). Stage 2 — the late
  // rows arrive and SCD1-correct their inferred placeholders.
  // Output: one audit row per fact-bearing customer key with the
  // before/after segment, the inferred flag, and whether arrival
  // corrected it. Plan shape: the fact side is touched once (one
  // map-side-combined groupBy on the fact key); everything after
  // runs on dim-sized frames — the unresolved-keys anti-join and the
  // arrival merge are broadcastable key-equality joins, exactly the
  // shape that survives a 1000-executor fact table.
  // ---------------------------------------------------------------
  private def lateArriving(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val late = cust.filter(col("c_custkey") % 20 === 0)
    val early = cust.filter(col("c_custkey") % 20 =!= 0)
    val factKeys = Tables.load(s, dir, "orders")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(count(lit(1)).as("n_facts"))
    val inferred = factKeys.join(early, Seq("c_custkey"), "left_anti")
      .select(col("c_custkey"), lit("UNKNOWN").as("segment_initial"),
        lit(1L).as("was_inferred"))
    val dim1 = early
      .select(col("c_custkey"), col("c_mktsegment").as("segment_initial"),
        lit(0L).as("was_inferred"))
      .unionByName(inferred)
    dim1
      .join(late.select(col("c_custkey"), col("c_mktsegment").as("late_segment")),
        Seq("c_custkey"), "left")
      .join(factKeys, Seq("c_custkey"))
      .select(col("c_custkey"), col("n_facts"), col("was_inferred"),
        col("segment_initial"),
        coalesce(col("late_segment"), col("segment_initial")).as("segment_final"),
        when(col("was_inferred") === 1 && col("late_segment").isNotNull, 1L)
          .otherwise(0L).as("corrected"))
      .orderBy("c_custkey")
  }

  private val lateArrivingSql =
    """WITH cust AS (SELECT c_custkey, c_mktsegment FROM customer),
      |late AS (SELECT * FROM cust WHERE c_custkey % 20 = 0),
      |early AS (SELECT * FROM cust WHERE c_custkey % 20 <> 0),
      |fk AS (SELECT o_custkey AS c_custkey, count(*) AS n_facts FROM orders GROUP BY 1),
      |inf AS (
      |  SELECT fk.c_custkey, 'UNKNOWN' AS segment_initial, CAST(1 AS BIGINT) AS was_inferred
      |  FROM fk LEFT JOIN early e ON fk.c_custkey = e.c_custkey WHERE e.c_custkey IS NULL),
      |dim1 AS (
      |  SELECT c_custkey, c_mktsegment AS segment_initial, CAST(0 AS BIGINT) AS was_inferred FROM early
      |  UNION ALL SELECT * FROM inf)
      |SELECT d.c_custkey, fk.n_facts, d.was_inferred, d.segment_initial,
      |  coalesce(l.c_mktsegment, d.segment_initial) AS segment_final,
      |  CAST(CASE WHEN d.was_inferred = 1 AND l.c_custkey IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS corrected
      |FROM dim1 d
      |LEFT JOIN late l ON d.c_custkey = l.c_custkey
      |JOIN fk ON d.c_custkey = fk.c_custkey
      |ORDER BY d.c_custkey""".stripMargin

  // ---------------------------------------------------------------
  // etl_incremental_agg — incremental view maintenance for a summary
  // table: the standing (ship-month × returnflag) revenue aggregate
  // is refreshed by merging the EXISTING aggregate with the DELTA
  // batch's aggregate — never re-scanning the historical fact table
  // (the self-maintainable-aggregate property: count/sum/min/max all
  // merge; avg derives from the merged sums). Deterministic replay:
  // rows with l_orderkey % 11 = 0 are the newly-landed delta, the
  // rest is the already-loaded history. The ORACLE is the FULL
  // direct aggregate over all rows — the hash match IS the
  // correctness statement (merged incrementals ≡ recompute). At
  // 100 TB this is the difference between touching a delta partition
  // and re-scanning years of facts; both inputs partial-aggregate
  // map-side and the merge shuffles |groups| rows, not the corpus.
  // ---------------------------------------------------------------
  private def incrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"),
        expr("date_format(l_shipdate, 'yyyy-MM')").as("ship_month"),
        col("l_returnflag"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
    def aggOf(df: DataFrame): DataFrame =
      df.groupBy("ship_month", "l_returnflag")
        .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"),
          min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
    val history = aggOf(li.filter(col("l_orderkey") % 11 =!= 0))
    val delta = aggOf(li.filter(col("l_orderkey") % 11 === 0))
    history.unionByName(delta)
      .groupBy("ship_month", "l_returnflag")
      .agg(sum(col("n_rows")).as("n_rows"), sum(col("sum_cents")).as("sum_cents"),
        min(col("min_cents")).as("min_cents"), max(col("max_cents")).as("max_cents"))
      .withColumn("avg_cents", expr("sum_cents DIV n_rows"))
      .orderBy("ship_month", "l_returnflag")
  }

  private val incrementalAggSql =
    """WITH li AS (
      |  SELECT strftime(l_shipdate, '%Y-%m') AS ship_month, l_returnflag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM lineitem)
      |SELECT ship_month, l_returnflag,
      |  count(*) AS n_rows, CAST(sum(cents) AS BIGINT) AS sum_cents,
      |  min(cents) AS min_cents, max(cents) AS max_cents,
      |  CAST(sum(cents) AS BIGINT) // count(*) AS avg_cents
      |FROM li
      |GROUP BY ship_month, l_returnflag
      |ORDER BY ship_month, l_returnflag""".stripMargin

  // ---------------------------------------------------------------
  // etl_row_hash_audit — ORDER-INSENSITIVE table fingerprints for
  // cross-environment reconciliation (the "is the replica identical"
  // check run after every migration/backfill — comparing checksums,
  // never shipping rows): per table, n_rows + the DECIMAL(38,0) SUM
  // of a canonical 60-bit per-row md5. Addition commutes, so the
  // fingerprint is independent of partitioning, file order and
  // parallelism — two environments agree iff their row multisets
  // agree (modulo hash collisions; 60 bits over these cardinalities
  // is vanishing). Map-only hash + one 1-row-per-table aggregate.
  // ---------------------------------------------------------------
  private def rowHashAudit(s: SparkSession, dir: String): DataFrame = {
    def fp(table: String, df: DataFrame, keyExpr: String): DataFrame =
      df.select(expr(keyExpr).as("canon"))
        .select(expr("CAST(conv(substr(md5(canon), 1, 15), 16, 10) AS BIGINT)").as("h"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("h").cast("decimal(38,0)")).cast("decimal(38,0)").cast("string")
            .as("checksum"))
        .select(lit(table).as("table_name"), col("n_rows"), col("checksum"))
    val c = fp("customer", Tables.load(s, dir, "customer"),
      "concat_ws('|', c_custkey, c_name, c_nationkey, c_mktsegment)")
    val o = fp("orders", Tables.load(s, dir, "orders"),
      "concat_ws('|', o_orderkey, o_custkey, o_orderstatus, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))")
    val n = fp("nation", Tables.load(s, dir, "nation"),
      "concat_ws('|', n_nationkey, n_name, n_regionkey)")
    c.unionByName(o).unionByName(n).orderBy("table_name")
  }

  private val rowHashAuditSql =
    """WITH c AS (
      |  SELECT 'customer' AS table_name, count(*) AS n_rows,
      |    CAST(sum(('0x' || substr(md5(c_custkey || '|' || c_name || '|' || c_nationkey || '|' || c_mktsegment), 1, 15))::BIGINT) AS VARCHAR) AS checksum
      |  FROM customer),
      |o AS (
      |  SELECT 'orders', count(*),
      |    CAST(sum(('0x' || substr(md5(o_orderkey || '|' || o_custkey || '|' || o_orderstatus || '|' ||
      |      CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR)), 1, 15))::BIGINT) AS VARCHAR)
      |  FROM orders),
      |n AS (
      |  SELECT 'nation', count(*),
      |    CAST(sum(('0x' || substr(md5(n_nationkey || '|' || n_name || '|' || n_regionkey), 1, 15))::BIGINT) AS VARCHAR)
      |  FROM nation)
      |SELECT * FROM c UNION ALL SELECT * FROM o UNION ALL SELECT * FROM n
      |ORDER BY table_name""".stripMargin

  // ---------------------------------------------------------------
  // etl_salted_join — the JOIN-side skew mitigation (etl_salted_agg
  // is the aggregation side): a deliberately hot join key (l_suppkey
  // % 10 funnels the fact table onto 10 values — plain shuffle join
  // puts a tenth of 100 TB in one task) joins through
  // Skew.saltedJoin: the fact side salts per row, the dim side
  // replicates ×16, the join runs on (key, salt) — 16× the reduce
  // parallelism on the hot key, row-identical to the plain join (the
  // salt never reaches the output; the oracle is the unsalted join +
  // GROUP BY). Honest scope note: a 10-row dim would BROADCAST in
  // production — salting earns its keep when the build side is too
  // big to broadcast AND the key is skewed; the op demonstrates the
  // mechanics on a corpus-sized probe side.
  // ---------------------------------------------------------------
  private def saltedJoin(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.load(s, dir, "lineitem")
      .select((col("l_suppkey") % 10).as("hot_key"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
    val dim = big.select("hot_key").distinct()
      .select(col("hot_key"), concat(lit("grp_"), col("hot_key")).as("label"))
    graft.etl.Skew.saltedJoin(big, dim, "hot_key")
      .groupBy("hot_key", "label")
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
      .orderBy("hot_key")
  }

  private val saltedJoinSql =
    """WITH b AS (SELECT l_suppkey % 10 AS hot_key,
      |            CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |          FROM lineitem),
      |d AS (SELECT DISTINCT hot_key, 'grp_' || CAST(hot_key AS VARCHAR) AS label FROM b)
      |SELECT b.hot_key, d.label, count(*) AS n_rows, CAST(sum(b.cents) AS BIGINT) AS sum_cents
      |FROM b JOIN d ON b.hot_key = d.hot_key
      |GROUP BY b.hot_key, d.label
      |ORDER BY b.hot_key""".stripMargin

  // ---------------------------------------------------------------
  // etl_gdpr_erasure — right-to-be-forgotten: given a deterministic
  // erasure-request set (subject keys ≡ 0 mod 97), rewrite every
  // subject-keyed table WITHOUT those subjects (broadcast anti-join —
  // the only scalable delete on an immutable lake: rewrite-minus,
  // or at 100 TB partition-scoped rewrite + deletion vectors) and
  // emit the per-table erasure AUDIT: before/after/erased counts and
  // a residual count RECOMPUTED FROM THE ERASED OUTPUT (must be 0 —
  // the audit carries its own proof, not a claim). The request set
  // is dim-sized and broadcasts; each fact table is scanned once.
  // ---------------------------------------------------------------
  private def gdprErasure(s: SparkSession, dir: String): DataFrame = {
    val subjects = Tables.load(s, dir, "customer")
      .select(col("c_custkey").as("subject"))
      .filter(col("subject") % 97 === 0)
    def audit(table: String, df: DataFrame, keyCol: String): DataFrame = {
      val erased = df.join(broadcast(subjects),
        df(keyCol) === subjects("subject"), "left_anti")
      val residual = erased.join(broadcast(subjects),
        erased(keyCol) === subjects("subject")).count()
      val (before, after) = (df.count(), erased.count())
      s.range(1).select(lit(table).as("table_name"),
        lit(before).as("n_before"), lit(after).as("n_after"),
        lit(before - after).as("n_erased"), lit(residual).as("n_residual"))
    }
    audit("customer", Tables.load(s, dir, "customer"), "c_custkey")
      .unionByName(audit("orders", Tables.load(s, dir, "orders"), "o_custkey"))
      .unionByName(audit("events", Tables.events(s, dir), "user_id"))
      .orderBy("table_name")
  }

  private val gdprErasureSql =
    """WITH subj AS (SELECT c_custkey AS subject FROM customer WHERE c_custkey % 97 = 0),
      |c AS (SELECT 'customer' AS table_name, count(*) AS n_before,
      |        CAST(count(*) FILTER (WHERE c_custkey NOT IN (SELECT subject FROM subj)) AS BIGINT) AS n_after
      |      FROM customer),
      |o AS (SELECT 'orders', count(*),
      |        CAST(count(*) FILTER (WHERE o_custkey NOT IN (SELECT subject FROM subj)) AS BIGINT)
      |      FROM orders),
      |e AS (SELECT 'events', count(*),
      |        CAST(count(*) FILTER (WHERE user_id NOT IN (SELECT subject FROM subj)) AS BIGINT)
      |      FROM events)
      |SELECT table_name, n_before, n_after,
      |  n_before - n_after AS n_erased, CAST(0 AS BIGINT) AS n_residual
      |FROM (SELECT * FROM c UNION ALL SELECT * FROM o UNION ALL SELECT * FROM e) u
      |ORDER BY table_name""".stripMargin

  // ---------------------------------------------------------------
  // meta_lineage — COLUMN-LEVEL LINEAGE as a queryable relation (the
  // governance surface the reference's metadata model encodes but
  // never exposes: which target column comes from which source
  // column through which transform, and whether it's a merge key).
  // One row per configured column across the catalog, the output
  // mapping joined on where it exists; `included=0` rows surface
  // columns the extraction DROPS — lineage must show what's absent,
  // not just what flows. The oracle is generated FROM THE SAME typed
  // catalog (like meta_sqlgen), so any drift between the config
  // model and its documented lineage fails the gate.
  // ---------------------------------------------------------------
  private def metaLineage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val outByTarget = SampleCatalog.lineitemOutput.map(o => o.targetColumnName -> o).toMap
    SampleCatalog.all.flatMap { spec =>
      spec.columns.map { c =>
        val target = c.aliasName.getOrElse(c.columnName)
        val out = if (spec.table.tableName == "lineitem") outByTarget.get(target) else None
        (spec.table.tableName, spec.table.loadType, c.columnId.toLong,
          c.columnName, target,
          if (c.includeFlag) 1L else 0L,
          c.transformationLogic.getOrElse(""),
          out.map(_.targetDataType).getOrElse(""),
          out.map(_.targetPosition.toLong).getOrElse(-1L),
          out.map(o => if (o.isKey) 1L else 0L).getOrElse(0L))
      }
    }.toDF("table_name", "load_type", "column_id", "source_column", "target_column",
      "included", "transform", "out_type", "out_position", "is_key")
      .orderBy("table_name", "column_id")
  }

  private val metaLineageSql: String = {
    def q(s0: String) = "'" + s0.replace("'", "''") + "'"
    val outByTarget = SampleCatalog.lineitemOutput.map(o => o.targetColumnName -> o).toMap
    val rows = SampleCatalog.all.flatMap { spec =>
      spec.columns.map { c =>
        val target = c.aliasName.getOrElse(c.columnName)
        val out = if (spec.table.tableName == "lineitem") outByTarget.get(target) else None
        Seq(q(spec.table.tableName), q(spec.table.loadType),
          s"CAST(${c.columnId} AS BIGINT)", q(c.columnName), q(target),
          s"CAST(${if (c.includeFlag) 1 else 0} AS BIGINT)",
          q(c.transformationLogic.getOrElse("")),
          q(out.map(_.targetDataType).getOrElse("")),
          s"CAST(${out.map(_.targetPosition).getOrElse(-1)} AS BIGINT)",
          s"CAST(${out.map(o => if (o.isKey) 1 else 0).getOrElse(0)} AS BIGINT)"
        ).mkString("(", ", ", ")")
      }
    }
    s"""SELECT * FROM (VALUES
      |${rows.mkString(",\n")}
      |) AS t(table_name, load_type, column_id, source_column, target_column,
      |       included, transform, out_type, out_position, is_key)
      |ORDER BY table_name, column_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // etl_scd3 — SCD Type 3 historization (current + previous value as
  // COLUMNS, the "show me what changed" dimension shape — the third
  // classic Kimball pattern next to the SCD2 interval table and the
  // late-arriving SCD1 correction already registered). Change stream:
  // v1 = the customer's original market segment; v2 (every 7th key) =
  // a deterministic re-segmentation. The dimension keeps ONE row per
  // key with (curr, prev, n_versions): a single key-partitioned
  // window pass over the change stream — no interval algebra, no
  // fact-table touch.
  // ---------------------------------------------------------------
  private def scd3(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val v1 = c.select(col("c_custkey").as("key"), lit(1).as("seq"),
      col("c_mktsegment").as("segment"))
    val v2 = c.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey").as("key"), lit(2).as("seq"),
        concat(lit("SEG_"), (col("c_custkey") % 3).cast("string")).as("segment"))
    val w = Window.partitionBy("key").orderBy(col("seq").desc)
    v1.unionByName(v2)
      .withColumn("rn", row_number().over(w))
      .withColumn("prev", lead(col("segment"), 1).over(w))
      .filter(col("rn") === 1)
      .select(col("key"),
        col("segment").as("curr_segment"),
        coalesce(col("prev"), lit("(none)")).as("prev_segment"),
        col("seq").cast("long").as("n_versions"))
      .orderBy("key")
  }

  private val scd3Sql =
    """WITH v AS (
      |  SELECT c_custkey AS key, 1 AS seq, c_mktsegment AS segment FROM customer
      |  UNION ALL
      |  SELECT c_custkey, 2, 'SEG_' || CAST(c_custkey % 3 AS VARCHAR)
      |  FROM customer WHERE c_custkey % 7 = 0),
      |r AS (SELECT *, row_number() OVER w AS rn, lead(segment, 1) OVER w AS prev
      |      FROM v WINDOW w AS (PARTITION BY key ORDER BY seq DESC))
      |SELECT key, segment AS curr_segment, coalesce(prev, '(none)') AS prev_segment,
      |  CAST(seq AS BIGINT) AS n_versions
      |FROM r WHERE rn = 1
      |ORDER BY key""".stripMargin

  // ---------------------------------------------------------------
  // etl_scd6 — SCD Type 6 historization (the 1+2+3 hybrid: Kimball's
  // "type six" because 1+2+3 = 6): a type-2 row per VERSION, where
  // every historical row ALSO carries the type-1-maintained CURRENT
  // value as a column (so point-in-time fact joins read the
  // historical attribute AND the as-of-now attribute from one row,
  // no second dimension lookup) plus the type-3 previous value.
  // Same seeded two-version change stream as etl_scd2/3/4. The
  // current value comes from an explicit max-seq aggregate + join —
  // not a window-frame first_value, whose default-frame subtleties
  // differ too easily across engines to gate on.
  // Plan shape: one key-grain aggregate + one key-keyed join + one
  // lag window over the key-partitioned union — all dimension-sized;
  // at 100 TB the type-1 current column is why SCD6 exists: the hot
  // fact join never touches a second (history) table.
  // ---------------------------------------------------------------
  private def scd6(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val v1 = c.select(col("c_custkey").as("key"), lit(1L).as("version"),
      col("c_mktsegment").as("segment"))
    val v2 = c.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey").as("key"), lit(2L).as("version"),
        concat(lit("SEG_"), (col("c_custkey") % 3).cast("string")).as("segment"))
    val v = v1.unionByName(v2)
    val cur = v.groupBy("key").agg(max("version").as("n_versions"))
      .withColumnRenamed("key", "ckey")
    val curVal = v.join(cur,
        col("key") === col("ckey") && col("version") === col("n_versions"))
      .select(col("key"), col("segment").as("segment_curr"), col("n_versions"))
    val w = Window.partitionBy("key").orderBy("version")
    v.withColumn("prev_segment",
        coalesce(lag(col("segment"), 1).over(w), lit("(none)")))
      .join(curVal, "key")
      .withColumn("is_current", (col("version") === col("n_versions")).cast("long"))
      .select("key", "version", "segment", "segment_curr", "prev_segment",
        "is_current", "n_versions")
      .orderBy("key", "version")
  }

  private val scd6Sql =
    """WITH v AS (
      |  SELECT c_custkey AS key, CAST(1 AS BIGINT) AS version, c_mktsegment AS segment FROM customer
      |  UNION ALL
      |  SELECT c_custkey, 2, 'SEG_' || CAST(c_custkey % 3 AS VARCHAR)
      |  FROM customer WHERE c_custkey % 7 = 0),
      |cur AS (SELECT key, max(version) AS n_versions FROM v GROUP BY key),
      |cv AS (SELECT v.key, v.segment AS segment_curr, cur.n_versions
      |       FROM v JOIN cur ON v.key = cur.key AND v.version = cur.n_versions),
      |r AS (SELECT v.key, v.version, v.segment,
      |        coalesce(lag(v.segment, 1) OVER (PARTITION BY v.key ORDER BY v.version),
      |                 '(none)') AS prev_segment
      |      FROM v)
      |SELECT r.key, r.version, r.segment, cv.segment_curr, r.prev_segment,
      |  CAST(CASE WHEN r.version = cv.n_versions THEN 1 ELSE 0 END AS BIGINT) AS is_current,
      |  cv.n_versions
      |FROM r JOIN cv ON r.key = cv.key
      |ORDER BY r.key, r.version""".stripMargin

  // ---------------------------------------------------------------
  // etl_scd4 — SCD Type 4 historization: the CURRENT table + HISTORY
  // table split (the warehouse pattern between SCD2's single
  // versioned dimension and a bitemporal store: the hot current
  // table stays key-sized for every fact join, the full version
  // trail lives in a separate history table the audits read). Same
  // seeded two-version stream as etl_scd2/scd3; the gate emits BOTH
  // tables as one relation tagged by table_role, so a drifted
  // current row (stale segment after the v2 restatement) or a lost
  // history version hash-fails. The current table carries
  // n_versions — the key-sized aggregate a production SCD4 keeps to
  // know when history compaction is due.
  // Plan shape: one window over the key-partitioned union — dims are
  // dimension-sized; at 100 TB the current table is what every fact
  // join broadcasts, which is the POINT of type 4.
  // ---------------------------------------------------------------
  private def scd4(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val v1 = c.select(col("c_custkey").as("key"), lit(1L).as("version"),
      col("c_mktsegment").as("segment"))
    val v2 = c.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey").as("key"), lit(2L).as("version"),
        concat(lit("SEG_"), (col("c_custkey") % 3).cast("string")).as("segment"))
    val versions = v1.unionByName(v2)
    val w = Window.partitionBy("key").orderBy(col("version").desc)
    val current = versions
      .withColumn("rn", row_number().over(w))
      .withColumn("n_versions", count(lit(1)).over(Window.partitionBy("key")))
      .filter(col("rn") === 1)
      .select(lit("current").as("table_role"), col("key"), col("version"),
        col("segment"), col("n_versions").cast("long").as("n_versions"))
    val history = versions
      .select(lit("history").as("table_role"), col("key"), col("version"),
        col("segment"), lit(1L).as("n_versions"))
    current.unionByName(history)
      .orderBy("table_role", "key", "version")
  }

  private val scd4Sql =
    """WITH v AS (
      |  SELECT c_custkey AS key, CAST(1 AS BIGINT) AS version, c_mktsegment AS segment FROM customer
      |  UNION ALL
      |  SELECT c_custkey, 2, 'SEG_' || CAST(c_custkey % 3 AS VARCHAR)
      |  FROM customer WHERE c_custkey % 7 = 0),
      |r AS (SELECT *, row_number() OVER w AS rn,
      |        count(*) OVER (PARTITION BY key) AS n_versions
      |      FROM v WINDOW w AS (PARTITION BY key ORDER BY version DESC)),
      |cur AS (SELECT 'current' AS table_role, key, version, segment,
      |          CAST(n_versions AS BIGINT) AS n_versions
      |        FROM r WHERE rn = 1),
      |hist AS (SELECT 'history' AS table_role, key, version, segment,
      |           CAST(1 AS BIGINT) AS n_versions
      |         FROM v)
      |SELECT * FROM cur UNION ALL SELECT * FROM hist
      |ORDER BY table_role, key, version""".stripMargin

  // ---------------------------------------------------------------
  // etl_k_anonymity — k-anonymity audit over the customer dimension's
  // quasi-identifiers (nation, market segment, account-balance band):
  // the privacy companion to etl_gdpr_erasure — erasure removes known
  // subjects; this measures whether the REMAINING rows re-identify
  // anyone. Every equivalence class of the generalized
  // quasi-identifier tuple is published with its size and a
  // k≥5 verdict; a release pipeline suppresses (or generalizes
  // further) the failing classes, and the failing-row total is the
  // number it must suppress. Banding uses floor(acctbal/1000) — floor
  // (not truncating DIV) so negative balances band consistently on
  // both engines.
  //
  // Plan shape: one dimension scan → map-side-combined groupBy on the
  // generalized tuple. At 100 TB the dimension is still the small
  // side; the audit is one bounded aggregate.
  // ---------------------------------------------------------------
  private val KAnon = 5

  private def kAnonymity(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(floor(c_acctbal / 1000.0) AS BIGINT)").as("bal_band"))
      .groupBy("c_nationkey", "c_mktsegment", "bal_band")
      .agg(count(lit(1)).as("n"))
      .withColumn("is_safe", (col("n") >= KAnon).cast("int"))
      .orderBy("c_nationkey", "c_mktsegment", "bal_band")

  private val kAnonymitySql =
    s"""SELECT c_nationkey, c_mktsegment,
      |  CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
      |  count(*) AS n,
      |  CAST(CASE WHEN count(*) >= $KAnon THEN 1 ELSE 0 END AS INT) AS is_safe
      |FROM customer
      |GROUP BY 1, 2, 3
      |ORDER BY c_nationkey, c_mktsegment, bal_band""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("meta_lineage", metaLineage, Some(metaLineageSql)),
    Op("etl_gdpr_erasure", gdprErasure, Some(gdprErasureSql)),
    Op("etl_salted_join", saltedJoin, Some(saltedJoinSql)),
    Op("etl_row_hash_audit", rowHashAudit, Some(rowHashAuditSql)),
    Op("etl_incremental_agg", incrementalAgg, Some(incrementalAggSql)),
    Op("etl_late_arriving", lateArriving, Some(lateArrivingSql)),
    Op("etl_zorder_layout", zorderLayout, Some(zorderLayoutSql)),
    Op("etl_bloom_prefilter", bloomPrefilter, Some(bloomPrefilterSql)),
    Op("meta_sqlgen", sqlGen, Some(sqlGenSql)),
    Op("etl_cdc_diff", cdcDiff, Some(cdcDiffSql)),
    Op("etl_salted_agg", saltedAgg, Some(saltedAggSql)),
    Op("etl_end_to_end", endToEnd, Some(endToEndSql)),
    Op("meta_extract", metaExtract, Some(metaExtractSql)),
    Op("etl_full_load", fullLoad, Some(fullLoadSql)),
    Op("etl_incremental_load", incrementalLoad, Some(incrementalLoadSql)),
    Op("etl_transform", transform, Some(transformSql)),
    Op("etl_output_mapping", outputMapping, Some(outputMappingSql)),
    Op("etl_merge_upsert", mergeUpsert, Some(mergeUpsertSql)),
    Op("etl_scd2", scd2, Some(scd2Sql)),
    Op("etl_scd3", scd3, Some(scd3Sql)),
    Op("etl_scd4", scd4, Some(scd4Sql)),
    Op("etl_scd6", scd6, Some(scd6Sql)),
    Op("etl_scd2_pointintime", scd2PointInTime, Some(scd2PointInTimeSql)),
    Op("etl_dedup_latest", dedupLatest, Some(dedupLatestSql)),
    Op("etl_k_anonymity", kAnonymity, Some(kAnonymitySql)),
    Op("etl_dq_checks", dqChecks, Some(dqChecksSql)),
    Op("etl_consolidate", consolidate, Some(consolidateSql)),
    Op("etl_process_log", processLog, Some(processLogSql)))
}
