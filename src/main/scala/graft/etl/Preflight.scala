package graft.etl

import graft.meta.{ExtractSpec, TunnelConfig, ZoneConfig}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Connection / config preflight — the reference ships a dedicated
  * config smoke-test DAG (ref: /root/reference/dag/
  * SMFG_DW_test_config_dag.py — loads config.yaml and prints the
  * ENVIRONMENT + each zone path) and a TestConnectionUAT utility that
  * opens the source connection and probes `SELECT 1` before anyone
  * schedules the real extraction (ref: /root/reference/source_code/
  * python/local_utility/"1. TestConnectionUAT.py"). Re-expressed
  * warehouse-style: one cheap pass that (a) validates the zone
  * config is present and (b) probes every configured source table —
  * reachable? expected schema? configured columns all present? any
  * rows? — so a bad config or a vanished source fails in seconds at
  * the front of the batch window, not mid-load an hour in.
  *
  * The oracle side hard-codes the EXPECTED state (schema widths,
  * zero missing columns, REACHABLE everywhere): a preflight is
  * exactly a comparison of observed state against expectation, so a
  * source schema drifting out from under the config makes the gate
  * fail loudly — which is the behavior being promised.
  *
  * Scale note: the probe reads parquet FOOTERS (schema) plus one
  * count over statistics — no column data is scanned; the whole op
  * is config-sized (one row per zone + one per configured table) and
  * runs on the driver timeline like every other metadata op.
  */
object Preflight {

  final case class Check(
      checkId: Int,
      checkType: String, // config | source_probe
      name: String,
      status: String, // OK | MISSING | REACHABLE | SCHEMA_DRIFT | UNREACHABLE
      nCols: Int, // observed schema width (-1 for config rows / unreachable)
      nMissing: Int, // configured source columns absent from the schema
      nRows: Long)

  /** Field-shape validation of an SSH tunnel config (ref:
    * "1.1 TestConnectionSSH.py" — every rule here is one its tunnel
    * open would fail on: empty bastion host/user/key, out-of-range
    * ports, local bind colliding with the ssh port). n_missing
    * carries the invalid-field count so a bad config is diagnosable
    * from the gated relation itself. No live SSH in this sandbox —
    * config validation is the portable half; see
    * [[graft.meta.TunnelConfig]].
    */
  def tunnelCheck(tunnel: TunnelConfig, checkId: Int): Check = {
    def bad(cond: Boolean) = if (cond) 1 else 0
    def badPort(p: Int) = bad(p <= 0 || p > 65535)
    def badStr(v: String) = bad(v == null || v.trim.isEmpty)
    val invalid =
      badStr(tunnel.sshHost) + badPort(tunnel.sshPort) +
        badStr(tunnel.sshUser) + badStr(tunnel.keyPath) +
        badStr(tunnel.remoteHost) + badPort(tunnel.remotePort) +
        badPort(tunnel.localPort) + bad(tunnel.localPort == tunnel.sshPort)
    Check(checkId, "tunnel_config", tunnel.env,
      if (invalid == 0) "OK" else "INVALID", -1, invalid, -1L)
  }

  def run(spark: SparkSession, dir: String, specs: Seq[ExtractSpec],
      zones: ZoneConfig, tunnel: Option[TunnelConfig] = None): Seq[Check] = {
    val zoneChecks = Seq(
      ("raw_zone", zones.rawZone),
      ("staging_zone", zones.stagingZone),
      ("curated_zone", zones.curatedZone),
      ("logs_path", zones.logsPath)).zipWithIndex.map { case ((name, path), i) =>
      Check(i + 1, "config", name,
        if (path != null && path.nonEmpty) "OK" else "MISSING", -1, -1, -1L)
    }
    val probes = specs.sortBy(_.table.tableId).zipWithIndex.map { case (spec, i) =>
      val t = spec.table.tableName
      val attempt = scala.util.Try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        val present = df.columns.toSet
        val missing = spec.columns.map(_.columnName).distinct.count(!present.contains(_))
        (df.columns.length, missing, df.count())
      }
      attempt match {
        case scala.util.Success((nCols, missing, rows)) =>
          Check(zoneChecks.size + i + 1, "source_probe", t,
            if (missing == 0) "REACHABLE" else "SCHEMA_DRIFT", nCols, missing, rows)
        case scala.util.Failure(_) =>
          Check(zoneChecks.size + i + 1, "source_probe", t, "UNREACHABLE", -1, -1, -1L)
      }
    }
    zoneChecks ++ probes ++
      tunnel.map(t => tunnelCheck(t, zoneChecks.size + probes.size + 1)).toSeq
  }

  /** The check list as a relation (the op surface). */
  def report(spark: SparkSession, dir: String, specs: Seq[ExtractSpec],
      zones: ZoneConfig, tunnel: Option[TunnelConfig] = None): DataFrame = {
    import spark.implicits._
    run(spark, dir, specs, zones, tunnel)
      .map(c => (c.checkId, c.checkType, c.name, c.status, c.nCols, c.nMissing, c.nRows))
      .toDF("check_id", "check_type", "name", "status", "n_cols", "n_missing", "n_rows")
      .orderBy("check_id")
  }
}
