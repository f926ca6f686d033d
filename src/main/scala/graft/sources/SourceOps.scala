package graft.sources

import graft.{Op, Tables}
import graft.etl.ExtractionPlanner
import graft.meta.SampleCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Path}
import java.util.Comparator

/** Source/sink capabilities surfaced through the driver contract
  * (ref: /root/reference/source_code/python/airflow_utility/
  * staging_data_extraction.py writes a single staging format; the
  * zone paths in config.yaml imply the multi-format lake this layer
  * generalizes to) — each op exercises a real write→read round trip
  * through a non-parquet format (or a partitioned parquet layout) and
  * then proves content fidelity against the DuckDB oracle reading the
  * ORIGINAL table. The round-trip file layout lives in a per-invocation temp
  * dir (no cross-run interference between Bench warmup/timed runs).
  *
  * Scale notes: csv/json readers take explicit schemas (inference is
  * a full extra pass at 100 TB); the partitioned writer demonstrates
  * the hive-layout + partition-pruned-scan path (the pruned read
  * touches ONE partition's files, verified in SourcesSpec via the
  * explain plan).
  */
object SourceOps {

  // Round-trip dirs are per-invocation (no cross-run interference)
  // and reaped at JVM exit — Bench runs each op twice and Verify once
  // more, so without the hook repeated runs would leak a full table
  // copy per invocation.
  private val tmpDirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      tmpDirs.forEach { d =>
        try
          Files.walk(d).sorted(Comparator.reverseOrder[Path]())
            .forEach(p => { Files.deleteIfExists(p); () })
        catch { case _: Exception => () } // best-effort reaper
      }))
  }

  private[graft] def tmpDir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    tmpDirs.add(d)
    d.toString
  }

  // ---------------------------------------------------------------
  // src_csv_roundtrip — csv sink + schema'd csv source: the customer
  // dimension written to csv and read back must carry identical
  // content (ints, strings — csv is not a float-safe format, so money
  // columns stay out by design).
  // ---------------------------------------------------------------
  private val customerCsvSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_mktsegment", StringType)))

  private def csvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("graft_csv")
    val cols = customerCsvSchema.fieldNames.map(col)
    Sources.writeCsv(Tables.load(s, dir, "customer").select(cols.toSeq: _*), out)
    Sources.csv(s, out, customerCsvSchema).orderBy("c_custkey")
  }

  private val csvRoundtripSql =
    """SELECT c_custkey, c_name, c_nationkey, c_mktsegment
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------
  // src_xml_roundtrip — XML sink + schema'd XML source (the
  // interchange format B2B/legacy feeds still arrive in; Spark 4
  // ships the former spark-xml as a built-in datasource): the part
  // dimension written as <part> row elements and read back must carry
  // identical content. Ints and strings only — XML is no more
  // float-safe than csv, so the money column stays out by design; the
  // oracle reads the ORIGINAL table (content fidelity, not file
  // comparison).
  // ---------------------------------------------------------------
  private val partXmlSchema = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType)))

  private def xmlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("graft_xml")
    val cols = partXmlSchema.fieldNames.map(col)
    Sources.writeXml(Tables.load(s, dir, "part").select(cols.toSeq: _*), out, rowTag = "part")
    Sources.xml(s, out, partXmlSchema, rowTag = "part")
      .select(cols.toSeq: _*)
      .orderBy("p_partkey")
  }

  private val xmlRoundtripSql =
    """SELECT p_partkey, p_name, p_brand, p_type, p_size
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------
  // src_json_roundtrip — json-lines sink + schema'd source with a
  // NESTED payload: orders serialized as {key, detail: {status,
  // priority}, day}; read back, flattened, content-compared. Dates
  // travel as ISO strings (json has no date type).
  // ---------------------------------------------------------------
  private val ordersJsonSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("detail", StructType(Seq(
      StructField("status", StringType),
      StructField("priority", StringType)))),
    StructField("order_day", StringType)))

  private def jsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("graft_json")
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"),
        struct(col("o_orderstatus").as("status"), col("o_orderpriority").as("priority"))
          .as("detail"),
        to_date(col("o_orderdate")).cast("string").as("order_day"))
      .write.mode("overwrite").json(out)
    Sources.jsonLines(s, out, ordersJsonSchema)
      .select(col("o_orderkey"), col("detail.status").as("order_status"),
        col("detail.priority").as("order_priority"),
        col("order_day").cast("date").as("order_day"))
      .orderBy("o_orderkey")
  }

  private val jsonRoundtripSql =
    """SELECT o_orderkey, o_orderstatus AS order_status, o_orderpriority AS order_priority,
      | CAST(o_orderdate AS DATE) AS order_day
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------
  // src_partitioned_prune — hive-partitioned parquet sink + a pruned
  // read: lineitem written partitionBy(l_returnflag), then ONE
  // partition read back through the partition filter (the scan lists
  // only returnflag=R files — directory pruning, no data skipped at
  // row level). Content equality against the unpartitioned original.
  // ---------------------------------------------------------------
  private def partitionedPrune(s: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("graft_part")
    Sources.writeParquet(
      Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"),
      out, partitionBy = Seq("l_returnflag"))
    Sources.parquet(s, out)
      .filter(col("l_returnflag") === "R") // directory-level prune
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(28,4)").cast("double")
          .as("sum_qty"))
  }

  private val partitionedPruneSql =
    """SELECT count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_orders,
      | CAST(CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 4) AS DECIMAL(28,4)) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |WHERE l_returnflag = 'R'""".stripMargin

  // ---------------------------------------------------------------
  // src_orc_roundtrip — ORC sink + source (Spark's second native
  // columnar format; types survive exactly, unlike csv/json): the
  // supplier dim with its DOUBLE balance round-trips bit-exactly and
  // is re-aggregated to prove content fidelity including the decimal
  // money path.
  // ---------------------------------------------------------------
  private def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("graft_orc")
    Tables.load(s, dir, "supplier").write.mode("overwrite").orc(out)
    s.read.orc(out)
      .groupBy("s_nationkey")
      .agg(
        count(lit(1)).as("n_suppliers"),
        sum(col("s_acctbal").cast("decimal(18,2)")).cast("decimal(28,4)").cast("double")
          .as("sum_bal"))
      .orderBy("s_nationkey")
  }

  private val orcRoundtripSql =
    """SELECT s_nationkey, count(*) AS n_suppliers,
      | CAST(CAST(round(sum(CAST(s_acctbal AS DECIMAL(18,2))), 4) AS DECIMAL(28,4)) AS DOUBLE) AS sum_bal
      |FROM supplier
      |GROUP BY s_nationkey
      |ORDER BY s_nationkey""".stripMargin

  // ---------------------------------------------------------------
  // src_schema_evolution — mergeSchema read over snapshots written
  // with DIFFERENT schemas (a later extract adds a column, as the
  // reference's mutable column config implies): the union schema
  // surfaces, old rows carry NULL in the new column, and nothing is
  // dropped. Old/new snapshots split the orders table by key parity.
  // ---------------------------------------------------------------
  private def schemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("graft_evo")
    val o = Tables.load(s, dir, "orders")
    o.filter(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$out/snap=1")
    o.filter(col("o_orderkey") % 2 === 1)
      .select("o_orderkey", "o_orderstatus", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$out/snap=2")
    s.read.option("mergeSchema", "true").parquet(out)
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("o_orderpriority")).as("n_with_new_col"),
        sum(when(col("o_orderpriority").isNull, 1).otherwise(0)).cast("bigint")
          .as("n_old_schema_rows"))
  }

  private val schemaEvolutionSql =
    """SELECT count(*) AS n_rows,
      | count(CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END) AS n_with_new_col,
      | CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_old_schema_rows
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------
  // src_jdbc — the reference's real ingest path (pd.read_sql over a
  // MySQL engine with chunksize; staging_data_extraction.py:84-106),
  // re-expressed as a partitioned spark.read.jdbc: the orders table
  // is seeded into an embedded Derby DB (the sandbox's MySQL
  // stand-in), then extracted back through N parallel bounded range
  // scans on o_orderkey, partition count derived from the config's
  // BatchSize, with the config's INCREMENTAL filter applied so the
  // JDBC-compilable part ships to the remote WHERE clause. Content
  // fidelity is proven against the oracle reading the ORIGINAL
  // parquet — the full DB round trip must be value-exact.
  // ---------------------------------------------------------------
  private val jdbcSeeded = new java.util.concurrent.ConcurrentHashMap[String, Jdbc.JdbcSourceSpec]()

  private def seededOrdersSpec(s: SparkSession, dir: String): Jdbc.JdbcSourceSpec =
    jdbcSeeded.computeIfAbsent(dir, { d =>
      // one in-memory DB per SF dir per JVM; in-JVM ⇒ reachable from
      // local-mode executor threads (a cluster points url at a server)
      val db = "graft_" + Integer.toHexString(d.hashCode).takeRight(8)
      val spec = Jdbc.JdbcSourceSpec(
        url = s"jdbc:derby:memory:$db;create=true",
        table = "ORDERS",
        partitionColumn = Some("o_orderkey"))
      Jdbc.write(
        Tables.load(s, d, "orders").coalesce(4), // bound seed connections
        spec,
        stringColumnTypes = Map("o_orderstatus" -> 8, "o_orderpriority" -> 32))
      // the key index every real source table has — without it each
      // partitioned range scan is a full table scan (N scans of the
      // whole table for an N-partition read)
      Jdbc.indexColumn(spec, "o_orderkey")
      spec
    })

  private def jdbcExtract(s: SparkSession, dir: String): DataFrame = {
    val spec = seededOrdersSpec(s, dir)
    // BatchSize 2000 over sf0.01's ~15k keys → ~8 parallel range scans
    val cfg = SampleCatalog.orders.table.copy(batchSize = 2000)
    val base = Jdbc.readConfigured(s, spec, cfg)
    ExtractionPlanner.extractFrom(base, SampleCatalog.orders.copy(table = cfg))
      .orderBy("Order_Key")
  }

  private val jdbcExtractSql =
    """SELECT o_orderkey AS Order_Key, o_custkey AS Customer_Key, o_orderstatus AS Order_Status,
      | o_totalprice AS Total_Price, CAST(o_orderdate AS DATE) AS Order_Date,
      | o_orderpriority AS Order_Priority
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      |ORDER BY Order_Key""".stripMargin

  // ---------------------------------------------------------------
  // src_binaryfile — the media-lake landing pattern: one standalone
  // binary file per asset on shared storage, ingested with Spark's
  // binaryFile source (path + modificationTime + length + content).
  // Each task writes its own partition's payloads (no driver
  // funneling; on a cluster the destination is shared storage), the
  // read-back extracts the asset key from the path and fingerprints
  // the bytes — exactly how image/audio corpora enter a lakehouse
  // before mm_* ops take over. Content fidelity is oracle-checked
  // against the source-of-truth table (same md5, same byte length).
  // ---------------------------------------------------------------
  private def binaryFileRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("graft_binfiles")
    graft.ops.Multimodal.withPayload(Tables.load(s, dir, "documents"))
      .select(col("doc_id"), col("payload"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(out, s"${r.getLong(0)}.bin"),
            r.getAs[Array[Byte]](1))
        }
      }
    s.read.format("binaryFile").load(out)
      .select(
        expr("CAST(regexp_extract(path, '([0-9]+)\\\\.bin$', 1) AS BIGINT)").as("doc_id"),
        col("length").cast("bigint").as("n_bytes"),
        md5(col("content")).as("content_md5"))
      .orderBy("doc_id")
  }

  private val binaryFileRoundtripSql =
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS content_md5
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // etl_partition_refresh — DYNAMIC partition overwrite, the load
  // strategy next to keyed MERGE (etl_merge_upsert) for warehouse
  // refreshes: a corrected batch for ONE partition replaces exactly
  // that partition in place — sibling partitions' files are never
  // touched (no read-modify-write of the whole table, no global
  // shuffle; at 100 TB a daily refresh rewrites one day's directory,
  // not the lake). The op writes orders hive-partitioned by
  // priority, overwrites the 1-URGENT partition with a corrected
  // HALF-SIZED batch (+10.00 price adjustment, even orderkeys only),
  // and re-aggregates the whole table: the refreshed partition must
  // show exactly the batch (replace, never append/merge) and every
  // other partition its original content.
  // ---------------------------------------------------------------
  private val RefreshPriority = "1-URGENT"

  private def partitionRefresh(s: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("graft_dynpart")
    val base = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("price"),
        col("o_orderpriority"))
    Sources.writeParquet(base, out, partitionBy = Seq("o_orderpriority"))
    val refresh = base
      .filter(col("o_orderpriority") === RefreshPriority && col("o_orderkey") % 2 === 0)
      .withColumn("price", (col("price") + lit(10.00).cast("decimal(18,2)"))
        .cast("decimal(18,2)"))
    refresh.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("o_orderpriority")
      .parquet(out)
    Sources.parquet(s, out)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("price")).cast("decimal(28,4)").cast("double").as("sum_price"))
      .orderBy("o_orderpriority")
  }

  private val partitionRefreshSql =
    s"""WITH base AS (
      |  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price, o_orderpriority
      |  FROM orders),
      |fin AS (
      |  SELECT price, o_orderpriority FROM base WHERE o_orderpriority <> '$RefreshPriority'
      |  UNION ALL
      |  SELECT CAST(price + 10.00 AS DECIMAL(18,2)), o_orderpriority FROM base
      |  WHERE o_orderpriority = '$RefreshPriority' AND o_orderkey % 2 = 0)
      |SELECT o_orderpriority, count(*) AS n_rows,
      |  CAST(CAST(round(sum(price), 4) AS DECIMAL(28,4)) AS DOUBLE) AS sum_price
      |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  // src_csv_corrupt — fault-tolerant ingest: a landing file where a
  // deterministic subset of lines is MALFORMED (unparseable key
  // column), read through Spark's PERMISSIVE CSV path with
  // `columnNameOfCorruptRecord` — corrupt lines survive as their raw
  // text instead of failing the load or silently vanishing
  // (FAILFAST/DROPMALFORMED), which is the audit trail an ingest
  // pipeline needs to route rejects to a quarantine zone. Staged as
  // raw text lines (no header) so the construction is exactly
  // reproducible in the oracle; every row of the output is either
  // the parsed key or the verbatim rejected line.
  // ---------------------------------------------------------------
  private def csvCorrupt(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val out = tmpDir("graft_csv_bad")
    val cust = Tables.load(s, dir, "customer")
    val good = cust.select(concat_ws(",",
      col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_mktsegment")).as("value"))
    val bad = cust.filter(col("c_custkey") % 50 === 0)
      .select(concat(lit("BAD_"), col("c_custkey"), lit(",junk,notint,xx")).as("value"))
    good.unionByName(bad).write.mode("overwrite").text(out)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_mktsegment", StringType),
      StructField("_corrupt_record", StringType)))
    s.read.schema(schema)
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(out)
      .select(
        when(col("_corrupt_record").isNull, "ok").otherwise("corrupt").as("status"),
        coalesce(col("c_custkey").cast("string"), col("_corrupt_record")).as("rec"),
        // PERMISSIVE still fills the fields it COULD parse on a
        // corrupt line — blank them so the audit row is key-or-reject
        when(col("_corrupt_record").isNull, coalesce(col("c_mktsegment"), lit("")))
          .otherwise(lit("")).as("segment"))
      .orderBy("status", "rec")
  }

  private val csvCorruptSql =
    """WITH ok AS (SELECT 'ok' AS status, CAST(c_custkey AS VARCHAR) AS rec,
      |             c_mktsegment AS segment FROM customer),
      |bad AS (SELECT 'corrupt' AS status,
      |          'BAD_' || CAST(c_custkey AS VARCHAR) || ',junk,notint,xx' AS rec,
      |          '' AS segment
      |        FROM customer WHERE c_custkey % 50 = 0)
      |SELECT * FROM (SELECT * FROM ok UNION ALL SELECT * FROM bad) u
      |ORDER BY status, rec""".stripMargin

  // ---------------------------------------------------------------
  // src_snapshot_asof — AS-OF snapshot reads over a dated-snapshot
  // layout (poor-man's time travel, the capability a lakehouse gets
  // from table formats and a plain-parquet warehouse gets from
  // `snapshot_date=YYYY-MM-DD/` directories): three drifting daily
  // snapshots of the customer dim are staged, the reader resolves a
  // requested AS-OF date to the LATEST snapshot ≤ it from the
  // directory listing alone (metadata-only — no data read to pick),
  // then scans exactly that partition (partition pruning does the
  // rest). Drift rule per snapshot k: customers with key ≡ 0 mod
  // (5·k) carry segment 'MOVED-k' — so reading the middle snapshot
  // proves both that later drift is invisible and earlier drift is.
  // ---------------------------------------------------------------
  private def snapshotAsof(s: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("graft_snap")
    val cust = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    for (k <- 1 to 3) {
      cust.select(col("c_custkey"),
          when(col("c_custkey") % (5 * k) === 0, concat(lit("MOVED-"), lit(k)))
            .otherwise(col("c_mktsegment")).as("segment"))
        .write.mode("overwrite").parquet(s"$out/snapshot_date=1995-0$k-01")
    }
    val asof = "1995-02-15"
    val chosen = Fs.listChildren(s, out)
      .map(_._1).filter(_.startsWith("snapshot_date="))
      .map(_.stripPrefix("snapshot_date="))
      .filter(_ <= asof).max // ISO dates: string order IS date order
    s.read.parquet(s"$out/snapshot_date=$chosen")
      .select(lit(chosen).as("snapshot_date"), col("c_custkey"), col("segment"))
      .orderBy("c_custkey")
  }

  private val snapshotAsofSql =
    """SELECT '1995-02-01' AS snapshot_date, c_custkey,
      |  CASE WHEN c_custkey % 10 = 0 THEN 'MOVED-2' ELSE c_mktsegment END AS segment
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------
  // src_manifest_isolation — SNAPSHOT ISOLATION from primitives (the
  // transactional-lake core Delta/Iceberg provide, built here from
  // exactly what they're built from): a version's MANIFEST lists the
  // data files visible at that version, readers plan scans FROM the
  // manifest — never from a directory listing — and a commit is one
  // atomic manifest write, so in-flight data files are invisible
  // until committed. The gate runs the real race: batch-1 files +
  // manifest v1 committed; batch-2 files WRITTEN TO THE SAME DATA
  // DIR but uncommitted; the v1 read must see only batch 1 even
  // though batch-2 files are on disk (the emitted
  // n_files_on_disk > n_files_visible columns prove the dirty files
  // were present and skipped — not merely absent); manifest v2
  // commits; the v2 read sees both. Oracle hardcodes the batch split
  // semantics, so a reader that fell back to directory listing
  // hash-fails on the v1 rows.
  // Scale shape: manifests are file-lists (config-sized here; at
  // 100 TB they chunk exactly like Iceberg's — the read becomes
  // manifest-scan → file-scan, both distributed); each batch writes
  // a fixed repartition(4) so file counts are deterministic data.
  // ---------------------------------------------------------------
  private def manifestIsolation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = tmpDir("graft_manifest_iso")
    val orders = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"))
    def writeBatch(name: String, df: org.apache.spark.sql.DataFrame): Seq[String] = {
      df.repartition(4).write.mode("overwrite").parquet(s"$root/data/$name")
      Fs.listChildren(s, s"$root/data/$name")
        .collect { case (n, p) if n.endsWith(".parquet") => p }.sorted
    }
    def commit(version: Int, files: Seq[String]): Unit =
      files.toDF("path").repartition(1).write.mode("overwrite")
        .parquet(s"$root/manifests/v$version")
    def filesOnDisk(): Long =
      Fs.listGrandchildren(s, s"$root/data")
        .count(_._1.endsWith(".parquet")).toLong
    def readSnapshot(version: Int): (org.apache.spark.sql.DataFrame, Long) = {
      val paths = s.read.parquet(s"$root/manifests/v$version")
        .collect().map(_.getString(0)).sorted
      (s.read.parquet(paths: _*), paths.length.toLong)
    }
    def agg(df: org.apache.spark.sql.DataFrame, snap: String,
        visible: Long, onDisk: Long): org.apache.spark.sql.DataFrame =
      df.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          expr("CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)").as("sum_cents"))
        .select(lit(snap).as("snapshot"), col("o_orderstatus"), col("n_rows"),
          col("sum_cents"), lit(visible).as("n_files_visible"),
          lit(onDisk).as("n_files_on_disk"))
    val b1 = writeBatch("b1", orders.filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp")))
    commit(1, b1)
    // batch 2 lands IN THE DATA DIR before its commit — the dirty window
    val b2 = writeBatch("b2", orders.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")))
    val (v1, vis1) = readSnapshot(1)
    val read1 = agg(v1, "v1", vis1, filesOnDisk())
    commit(2, b1 ++ b2)
    val (v2, vis2) = readSnapshot(2)
    val read2 = agg(v2, "v2", vis2, filesOnDisk())
    read1.unionByName(read2).orderBy("snapshot", "o_orderstatus")
  }

  private val manifestIsolationSql =
    """WITH v1 AS (
      |  SELECT 'v1' AS snapshot, o_orderstatus, count(*) AS n_rows,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents,
      |    CAST(4 AS BIGINT) AS n_files_visible, CAST(8 AS BIGINT) AS n_files_on_disk
      |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY o_orderstatus),
      |v2 AS (
      |  SELECT 'v2' AS snapshot, o_orderstatus, count(*) AS n_rows,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents,
      |    CAST(8 AS BIGINT) AS n_files_visible, CAST(8 AS BIGINT) AS n_files_on_disk
      |  FROM orders
      |  GROUP BY o_orderstatus)
      |SELECT * FROM v1 UNION ALL SELECT * FROM v2
      |ORDER BY snapshot, o_orderstatus""".stripMargin

  // ---------------------------------------------------------------
  // etl_vacuum_orphans — the VACUUM companion to
  // src_manifest_isolation (a manifest-versioned lake accumulates
  // orphan data files: failed writes, superseded versions,
  // abandoned commits — the maintenance job every transactional
  // format ships deletes files NOT referenced by the live manifest).
  // The gate stages the real mess: batch-1 files + committed
  // manifest v1, then batch-2 files WITH NO COMMIT (the failed
  // write). The vacuum lists the data dir, diffs against the live
  // manifest, DELETES the orphans (a real rm, not a plan), and
  // re-reads the manifest to prove the live snapshot survived intact
  // — emitted as before/after row counts the oracle pins, so a
  // vacuum that deleted a LIVE file (the catastrophic bug this job
  // can have) hash-fails on n_rows_after. File counts are
  // deterministic (repartition(4) per batch).
  // Scale shape: the diff is manifest-size × listing-size (metadata,
  // not data); the deletes are per-file. At 100 TB both sides are
  // distributed listings; an AGE guard (not modeled here — mtimes
  // aren't deterministic) additionally protects in-flight writes.
  // ---------------------------------------------------------------
  private def vacuumOrphans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = tmpDir("graft_vacuum")
    val orders = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderdate"))
    def writeBatch(name: String, df: org.apache.spark.sql.DataFrame): Seq[String] = {
      df.repartition(4).write.mode("overwrite").parquet(s"$root/data/$name")
      Fs.listChildren(s, s"$root/data/$name")
        .collect { case (n, p) if n.endsWith(".parquet") => p }.sorted
    }
    val live = writeBatch("b1",
      orders.filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp")))
    live.toDF("path").repartition(1).write.mode("overwrite")
      .parquet(s"$root/manifests/v1")
    // the failed write: data files land, the commit never happens
    writeBatch("b2",
      orders.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")))
    val manifest = s.read.parquet(s"$root/manifests/v1")
      .collect().map(_.getString(0)).toSet
    // listings and deletes go through the Hadoop FileSystem (never a
    // POSIX file handle) so the vacuum works unchanged on s3a:/hdfs:
    def onDisk(): Seq[String] =
      Fs.listGrandchildren(s, s"$root/data")
        .collect { case (n, p) if n.endsWith(".parquet") => p }
    val before = onDisk()
    val rowsBefore = s.read.parquet(manifest.toSeq.sorted: _*).count()
    val orphans = before.filterNot(manifest.contains)
    orphans.foreach(p => { Fs.delete(s, p); () }) // the actual vacuum
    val after = onDisk()
    require(after.toSet == manifest,
      "vacuum deleted a live file or missed an orphan")
    val rowsAfter = s.read.parquet(manifest.toSeq.sorted: _*).count()
    Seq((before.length.toLong, manifest.size.toLong, orphans.length.toLong,
      after.length.toLong, rowsBefore, rowsAfter,
      if (rowsBefore == rowsAfter) 1 else 0))
      .toDF("n_files_before", "n_files_live", "n_orphans_deleted",
        "n_files_after", "n_rows_before", "n_rows_after", "intact")
  }

  private val vacuumOrphansSql =
    """SELECT CAST(8 AS BIGINT) AS n_files_before, CAST(4 AS BIGINT) AS n_files_live,
      |  CAST(4 AS BIGINT) AS n_orphans_deleted, CAST(4 AS BIGINT) AS n_files_after,
      |  count(*) AS n_rows_before, count(*) AS n_rows_after, CAST(1 AS INT) AS intact
      |FROM orders
      |WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("etl_vacuum_orphans", vacuumOrphans, Some(vacuumOrphansSql)),
    Op("src_manifest_isolation", manifestIsolation, Some(manifestIsolationSql)),
    Op("src_snapshot_asof", snapshotAsof, Some(snapshotAsofSql)),
    Op("src_csv_corrupt", csvCorrupt, Some(csvCorruptSql)),
    Op("etl_partition_refresh", partitionRefresh, Some(partitionRefreshSql)),
    Op("src_binaryfile", binaryFileRoundtrip, Some(binaryFileRoundtripSql)),
    Op("src_jdbc", jdbcExtract, Some(jdbcExtractSql)),
    Op("src_xml_roundtrip", xmlRoundtrip, Some(xmlRoundtripSql)),
    Op("src_csv_roundtrip", csvRoundtrip, Some(csvRoundtripSql)),
    Op("src_schema_evolution", schemaEvolution, Some(schemaEvolutionSql)),
    Op("src_json_roundtrip", jsonRoundtrip, Some(jsonRoundtripSql)),
    Op("src_orc_roundtrip", orcRoundtrip, Some(orcRoundtripSql)),
    Op("src_partitioned_prune", partitionedPrune, Some(partitionedPruneSql)))
}
