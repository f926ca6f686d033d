package graft.queries

import graft.{Op, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse-modeling operators beyond the reference's staging DAG:
  * optimizer-statistics collection, surrogate-key management, and
  * Data Vault 2.0 hash-key modeling — the dimensional-warehouse
  * capabilities a team migrating off the reference (ref:
  * dw_data_load.py's key-based MERGE model) reaches for next.
  */
object EtlOps2 {

  // ---------------------------------------------------------------
  // meta_table_stats — ANALYZE-style per-column statistics as a
  // queryable relation (row count, non-null count, exact NDV, min /
  // max in canonical string form): the optimizer-statistics /
  // data-profiling surface a metadata-driven warehouse publishes
  // next to its TableConfig catalog. One aggregate pass PER TABLE
  // computes every column's stats (the per-column fan-out happens in
  // the aggregate list, not as repeated scans), then one explode
  // unpivots the single stats row into the per-column relation. At
  // 100 TB: one scan per table with map-side partial aggregation;
  // the multi-count-distinct expands rows k× map-side (k = audited
  // columns) but never rescans, and the unpivot runs on ONE row.
  // Min/max canonicalization: native-type min/max first, string
  // conversion after (lexicographic min over strings would disagree
  // with numeric order); doubles go through DECIMAL(18,2) so both
  // engines print identical text for cent-exact data.
  // ---------------------------------------------------------------
  private final case class StatCol(table: String, name: String, dec: Boolean)

  private val statCatalog: Seq[StatCol] = Seq(
    StatCol("customer", "c_custkey", dec = false),
    StatCol("customer", "c_mktsegment", dec = false),
    StatCol("customer", "c_acctbal", dec = true),
    StatCol("orders", "o_orderkey", dec = false),
    StatCol("orders", "o_orderstatus", dec = false),
    StatCol("orders", "o_totalprice", dec = true),
    StatCol("lineitem", "l_returnflag", dec = false),
    StatCol("lineitem", "l_quantity", dec = true),
    StatCol("lineitem", "l_extendedprice", dec = true))

  private def canonStr(c: StatCol, e: Column): Column =
    if (c.dec) e.cast("decimal(18,2)").cast("string") else e.cast("string")

  private def tableStats(s: SparkSession, dir: String): DataFrame =
    statCatalog.groupBy(_.table).toSeq.sortBy(_._1).map { case (table, cols0) =>
      val cols = cols0.sortBy(_.name)
      val aggs: Seq[Column] =
        count(lit(1)).as("n_rows") +:
          cols.flatMap { c =>
            Seq(
              count(col(c.name)).as(s"nn_${c.name}"),
              countDistinct(col(c.name)).as(s"nd_${c.name}"),
              canonStr(c, min(col(c.name))).as(s"mn_${c.name}"),
              canonStr(c, max(col(c.name))).as(s"mx_${c.name}"))
          }
      val one = Tables.load(s, dir, table).agg(aggs.head, aggs.tail: _*)
      val entries = cols.map { c =>
        struct(
          lit(c.name).as("column_name"),
          col(s"nn_${c.name}").as("n_nonnull"),
          col(s"nd_${c.name}").as("n_distinct"),
          col(s"mn_${c.name}").as("min_val"),
          col(s"mx_${c.name}").as("max_val"))
      }
      one.select(lit(table).as("table_name"), col("n_rows"),
          explode(array(entries: _*)).as("e"))
        .select(col("table_name"), col("e.column_name"), col("n_rows"),
          col("e.n_nonnull"), col("e.n_distinct"), col("e.min_val"), col("e.max_val"))
    }.reduce(_ unionByName _).orderBy("table_name", "column_name")

  private val tableStatsSql: String =
    statCatalog.sortBy(c => (c.table, c.name)).map { c =>
      val mn =
        if (c.dec) s"CAST(CAST(min(${c.name}) AS DECIMAL(18,2)) AS VARCHAR)"
        else s"CAST(min(${c.name}) AS VARCHAR)"
      val mx =
        if (c.dec) s"CAST(CAST(max(${c.name}) AS DECIMAL(18,2)) AS VARCHAR)"
        else s"CAST(max(${c.name}) AS VARCHAR)"
      s"""SELECT '${c.table}' AS table_name, '${c.name}' AS column_name,
        |  count(*) AS n_rows, count(${c.name}) AS n_nonnull,
        |  count(DISTINCT ${c.name}) AS n_distinct,
        |  $mn AS min_val, $mx AS max_val
        |FROM ${c.table}""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name, column_name")

  // ---------------------------------------------------------------
  // etl_surrogate_key — surrogate-key management for a dimension:
  // mint dense 1..N keys over the customer business keys (the
  // Kimball pattern the reference's natural-key MERGE model skips,
  // and the first thing a real DW adds on top of it), then enrich
  // the orders fact through the key map. The mint is a row_number
  // over the DISTINCT business-key relation — a total-order shuffle
  // of the skinny dimension only, never the fact; the fact then
  // joins the (dimension-sized, broadcastable) key map. At 100 TB
  // the fact-side cost is one broadcast-hash probe per row; the only
  // global sort touches |dimension| rows. The unpartitioned window
  // sits above a distinct Aggregate, which is exactly the shape
  // PlanGuardSpec admits.
  // ---------------------------------------------------------------
  private def surrogateKey(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("c_custkey")
    val skMap = Tables.load(s, dir, "customer")
      .select(col("c_custkey")).distinct()
      .withColumn("cust_sk", row_number().over(w).cast("long"))
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(broadcast(skMap), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("cust_sk"))
      .orderBy("o_orderkey")
  }

  private val surrogateKeySql =
    """WITH sk AS (
      |  SELECT c_custkey, CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT) AS cust_sk
      |  FROM (SELECT DISTINCT c_custkey FROM customer) d)
      |SELECT o.o_orderkey, o.o_custkey, sk.cust_sk
      |FROM orders o JOIN sk ON o.o_custkey = sk.c_custkey
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------
  // etl_data_vault — Data Vault 2.0 raw-vault derivation from the
  // staged relations: hubs (one row per business key, md5 hash key),
  // the customer↔order link (md5 over the concatenated key pair),
  // and the customer satellite (descriptive attributes with an md5
  // HASHDIFF for change detection — the vault's CDC primitive).
  // Published as ONE uniform relation (vault_table, hk, bk,
  // hashdiff) so the gate hashes all four tables at once.
  //
  // Why hash keys at 100 TB: every vault table is keyed by
  // md5(business key) — loads are embarrassingly parallel (no
  // surrogate sequence coordination, unlike etl_surrogate_key, which
  // is the contrast this pair of ops documents), and every join is
  // an equality join on a 32-char key with uniform distribution —
  // skew-free by construction. Attribute canonicalization through
  // DECIMAL(18,2) keeps the hashdiff engine-stable on cent-exact
  // doubles.
  // ---------------------------------------------------------------
  private def dataVault(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
    val ords = Tables.load(s, dir, "orders")
    val hubCust = cust.select(
      lit("hub_customer").as("vault_table"),
      md5(col("c_custkey").cast("string")).as("hk"),
      col("c_custkey").cast("string").as("bk"),
      lit("").as("hashdiff"))
    val hubOrder = ords.select(
      lit("hub_order").as("vault_table"),
      md5(col("o_orderkey").cast("string")).as("hk"),
      col("o_orderkey").cast("string").as("bk"),
      lit("").as("hashdiff"))
    val link = ords.select(
      lit("link_customer_order").as("vault_table"),
      md5(concat_ws("|", col("o_custkey").cast("string"),
        col("o_orderkey").cast("string"))).as("hk"),
      concat_ws("|", col("o_custkey").cast("string"),
        col("o_orderkey").cast("string")).as("bk"),
      lit("").as("hashdiff"))
    val satCust = cust.select(
      lit("sat_customer").as("vault_table"),
      md5(col("c_custkey").cast("string")).as("hk"),
      col("c_custkey").cast("string").as("bk"),
      md5(concat_ws("|", col("c_name"), col("c_nationkey").cast("string"),
        col("c_acctbal").cast("decimal(18,2)").cast("string"),
        col("c_mktsegment"))).as("hashdiff"))
    hubCust.unionByName(hubOrder).unionByName(link).unionByName(satCust)
      .orderBy("vault_table", "bk")
  }

  private val dataVaultSql =
    """SELECT * FROM (
      |  SELECT 'hub_customer' AS vault_table, md5(CAST(c_custkey AS VARCHAR)) AS hk,
      |    CAST(c_custkey AS VARCHAR) AS bk, '' AS hashdiff
      |  FROM customer
      |  UNION ALL
      |  SELECT 'hub_order', md5(CAST(o_orderkey AS VARCHAR)),
      |    CAST(o_orderkey AS VARCHAR), ''
      |  FROM orders
      |  UNION ALL
      |  SELECT 'link_customer_order',
      |    md5(CAST(o_custkey AS VARCHAR) || '|' || CAST(o_orderkey AS VARCHAR)),
      |    CAST(o_custkey AS VARCHAR) || '|' || CAST(o_orderkey AS VARCHAR), ''
      |  FROM orders
      |  UNION ALL
      |  SELECT 'sat_customer', md5(CAST(c_custkey AS VARCHAR)),
      |    CAST(c_custkey AS VARCHAR),
      |    md5(c_name || '|' || CAST(c_nationkey AS VARCHAR) || '|' ||
      |        CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) || '|' || c_mktsegment)
      |  FROM customer) v
      |ORDER BY vault_table, bk""".stripMargin

  // ---------------------------------------------------------------
  // etl_wap — Write-Audit-Publish (the Iceberg/Netflix staging
  // pattern, and the missing classic next to MERGE / SCD / dynamic
  // partition refresh): a corrected orders batch is (1) WRITTEN to a
  // staging zone, (2) AUDITED from the staged files — null merge
  // keys, duplicate keys — and (3) PUBLISHED with violating keys
  // quarantined; the published zone is read BACK for the row count,
  // so the gate proves the real write→audit→publish→read cycle, not
  // an in-plan simulation. The batch injects deterministic
  // violations (every 200th key's custkey nulled, every 120th key
  // duplicated) so the audit provably rejects something. Output is
  // the one-relation audit summary a WAP orchestrator logs.
  //
  // Scale shape: audits are map-side-combined aggregates over the
  // staged batch (batch-sized, not warehouse-sized); publish is one
  // filtered write. At 100 TB the pattern is per-partition (audit
  // and swap one partition's staging dir), composing with
  // etl_partition_refresh's overwrite mechanics.
  // ---------------------------------------------------------------
  private def wap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.load(s, dir, "orders")
      .filter(col("o_orderkey") % 40 === 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 200 === 0, lit(null))
          .otherwise(col("o_custkey")).as("o_custkey"),
        col("o_totalprice"))
    val batch = base.unionByName(base.filter(col("o_orderkey") % 120 === 0))
    // WRITE
    val stage = graft.sources.SourceOps.tmpDir("graft_wap_stage")
    batch.write.mode("overwrite").parquet(stage)
    // AUDIT (from the staged files, as WAP requires)
    val staged = s.read.parquet(stage)
    val keyCounts = staged.groupBy("o_orderkey").agg(count(lit(1)).as("n"))
    val dupExtra = keyCounts.filter(col("n") > 1)
      .agg(coalesce(sum(col("n") - 1), lit(0L))).head().getLong(0)
    val flagged = staged.join(
      keyCounts.filter(col("n") > 1).select(col("o_orderkey"), lit(1).as("dup")),
      Seq("o_orderkey"), "left")
    val audit = flagged.agg(
      count(lit(1)).as("staged_rows"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_key_rows"),
      sum(when(col("o_custkey").isNull || col("dup").isNotNull, 1L)
        .otherwise(0L)).as("quarantined_rows")).head()
    // PUBLISH (violating keys quarantined) + read back
    val publish = graft.sources.SourceOps.tmpDir("graft_wap_publish")
    flagged.filter(col("o_custkey").isNotNull && col("dup").isNull)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(publish)
    val published = s.read.parquet(publish).count()
    Seq(
      ("dup_key_rows", dupExtra),
      ("null_key_rows", audit.getLong(1)),
      ("published_rows", published),
      ("quarantined_rows", audit.getLong(2)),
      ("staged_rows", audit.getLong(0)))
      .toDF("metric", "value")
      .orderBy("metric")
  }

  // the oracle recomputes the same algebra from the source relation:
  // every %40 key contributes 1 + (%120) copies; %200 keys are
  // null-injected; a key is quarantined (all copies) when nulled or
  // duplicated; dup_key_rows counts the EXTRA copies (sum over dup
  // keys of n−1)
  private val wapSql =
    """WITH k AS (
      |  SELECT o_orderkey,
      |    CAST(1 + CASE WHEN o_orderkey % 120 = 0 THEN 1 ELSE 0 END AS BIGINT) AS copies,
      |    CASE WHEN o_orderkey % 200 = 0 THEN 1 ELSE 0 END AS nulled
      |  FROM orders WHERE o_orderkey % 40 = 0),
      |agg AS (
      |  SELECT
      |    CAST(sum(copies) AS BIGINT) AS staged_rows,
      |    CAST(sum(nulled * copies) AS BIGINT) AS null_key_rows,
      |    CAST(sum(copies - 1) AS BIGINT) AS dup_key_rows,
      |    CAST(sum(CASE WHEN nulled = 1 OR copies > 1 THEN copies ELSE 0 END) AS BIGINT) AS quarantined_rows
      |  FROM k)
      |SELECT metric, value FROM (
      |  SELECT 'staged_rows' AS metric, staged_rows AS value FROM agg
      |  UNION ALL SELECT 'null_key_rows', null_key_rows FROM agg
      |  UNION ALL SELECT 'dup_key_rows', dup_key_rows FROM agg
      |  UNION ALL SELECT 'quarantined_rows', quarantined_rows FROM agg
      |  UNION ALL SELECT 'published_rows', staged_rows - quarantined_rows FROM agg
      |) z ORDER BY metric""".stripMargin

  // ---------------------------------------------------------------
  // etl_calendar_dim — generated calendar (date-spine) dimension,
  // the Kimball artifact every warehouse keeps beside its facts: one
  // row per day covering the event corpus's span, with integer
  // day-of-week (epoch-anchored: day 0 = Thursday), week number, and
  // Gregorian year/month/day from the DATE type (both engines agree
  // on the proleptic Gregorian calendar), LEFT-joined to daily
  // activity so quiet days appear with zero counts — the join that
  // makes "days with no sales" queryable at all. The spine is
  // explode(sequence(min_day, max_day)) INSIDE the plan (no driver
  // action); min/max ride a 1-row aggregate. At 100 TB the spine is
  // |days|-sized — the fact aggregate is the only corpus-shaped
  // input, map-side combined.
  // ---------------------------------------------------------------
  private def calendarDim(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(expr("(ts DIV 1000000000) DIV 86400").as("day_num"))
      .groupBy("day_num").agg(count(lit(1)).as("n_events"))
    val spine = daily.agg(min("day_num").as("d0"), max("day_num").as("d1"))
      .select(explode(expr("sequence(d0, d1)")).as("day_num"))
      .withColumn("cal_date", expr("date_add(DATE '1970-01-01', CAST(day_num AS INT))"))
    spine.join(daily, Seq("day_num"), "left")
      .select(col("day_num"),
        col("cal_date").cast("string").as("cal_date"),
        expr("CAST(year(cal_date) AS BIGINT)").as("yr"),
        expr("CAST(month(cal_date) AS BIGINT)").as("mo"),
        expr("CAST((day_num + 4) % 7 AS BIGINT)").as("dow"),
        expr("CAST((day_num + 3) DIV 7 AS BIGINT)").as("week_num"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy("day_num")
  }

  private val calendarDimSql =
    """WITH daily AS (
      |  SELECT epoch_ns(ts)//1000000000 // 86400 AS day_num, count(*) AS n_events
      |  FROM events GROUP BY 1),
      |bounds AS (SELECT min(day_num) AS d0, max(day_num) AS d1 FROM daily),
      |spine AS (SELECT unnest(range(d0, d1 + 1)) AS day_num FROM bounds),
      |cal AS (SELECT day_num,
      |          DATE '1970-01-01' + CAST(day_num AS INT) AS cal_date
      |        FROM spine)
      |SELECT c.day_num,
      |  CAST(c.cal_date AS VARCHAR) AS cal_date,
      |  CAST(year(c.cal_date) AS BIGINT) AS yr,
      |  CAST(month(c.cal_date) AS BIGINT) AS mo,
      |  CAST((c.day_num + 4) % 7 AS BIGINT) AS dow,
      |  CAST((c.day_num + 3) // 7 AS BIGINT) AS week_num,
      |  CAST(coalesce(d.n_events, 0) AS BIGINT) AS n_events
      |FROM cal c LEFT JOIN daily d ON c.day_num = d.day_num
      |ORDER BY c.day_num""".stripMargin

  // ---------------------------------------------------------------
  // etl_conn_preflight — the config smoke test + source connection
  // probe as a gated relation (see graft.etl.Preflight for the
  // reference mapping): zone-config presence checks plus a per-
  // configured-table probe (footer schema read + stats-only count,
  // no column scan) with configured-vs-observed column validation.
  // The oracle hard-codes the EXPECTED verdicts — preflight IS the
  // comparison of observed state against expectation, so gate
  // failure on source drift is the feature.
  // ---------------------------------------------------------------
  private def connPreflight(s: SparkSession, dir: String): DataFrame =
    graft.etl.Preflight.report(s, dir, graft.meta.SampleCatalog.all,
      graft.meta.MetaStore.sampleZones, Some(graft.meta.MetaStore.sampleTunnel))

  private val connPreflightSql =
    """SELECT CAST(1 AS INT) AS check_id, 'config' AS check_type, 'raw_zone' AS name,
      |  'OK' AS status, CAST(-1 AS INT) AS n_cols, CAST(-1 AS INT) AS n_missing,
      |  CAST(-1 AS BIGINT) AS n_rows
      |UNION ALL SELECT 2, 'config', 'staging_zone', 'OK', -1, -1, -1
      |UNION ALL SELECT 3, 'config', 'curated_zone', 'OK', -1, -1, -1
      |UNION ALL SELECT 4, 'config', 'logs_path', 'OK', -1, -1, -1
      |UNION ALL SELECT 5, 'source_probe', 'lineitem', 'REACHABLE', 11, 0, (SELECT count(*) FROM lineitem)
      |UNION ALL SELECT 6, 'source_probe', 'orders', 'REACHABLE', 6, 0, (SELECT count(*) FROM orders)
      |UNION ALL SELECT 7, 'source_probe', 'customer', 'REACHABLE', 5, 0, (SELECT count(*) FROM customer)
      |UNION ALL SELECT 8, 'source_probe', 'part', 'REACHABLE', 6, 0, (SELECT count(*) FROM part)
      |UNION ALL SELECT 9, 'tunnel_config', 'DEV', 'OK', -1, 0, -1
      |ORDER BY check_id""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("etl_conn_preflight", connPreflight, Some(connPreflightSql)),
    Op("etl_calendar_dim", calendarDim, Some(calendarDimSql)),
    Op("meta_table_stats", tableStats, Some(tableStatsSql)),
    Op("etl_surrogate_key", surrogateKey, Some(surrogateKeySql)),
    Op("etl_data_vault", dataVault, Some(dataVaultSql)),
    Op("etl_wap", wap, Some(wapSql)))
}
