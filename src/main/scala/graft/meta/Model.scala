package graft.meta

/** Metadata model — the Spark-native re-expression of the reference's
  * MySQL config schema (ref: /root/reference/source_code/sql/
  * "1. Metadata Creation.sql": DW_Table_Config, DW_Column_Config,
  * DW_Output_Table_Config, DW_Output_Column_Config,
  * DW_Process_Master, DW_Process_Stage_Detail).
  *
  * Config rows are case classes (Dataset-encodable, parquet
  * round-trippable via [[MetaStore]]); config is data-small, so it
  * lives driver-side and parameterizes Catalyst plans.
  */

/** ref: DW_Table_Config (1. Metadata Creation.sql:63-86). */
final case class TableConfig(
    tableId: Int,
    schemaName: String,
    tableName: String,
    activeFlag: Boolean = true,
    loadType: String = "FULL", // FULL | INCREMENTAL
    refreshFrequency: String = "EOD", // EOD | HOURLY | REALTIME
    incrementalFilter: Option[String] = None,
    batchSize: Int = 0,
    stagingZonePath: Option[String] = None,
    curatedZonePath: Option[String] = None
)

/** ref: DW_Column_Config (1. Metadata Creation.sql:94-107). */
final case class ColumnConfig(
    columnId: Int,
    tableId: Int,
    columnName: String,
    aliasName: Option[String] = None,
    includeFlag: Boolean = true,
    transformationLogic: Option[String] = None
)

/** ref: DW_Output_Table_Config (1. Metadata Creation.sql:113-121). */
final case class OutputTableConfig(
    outputTableId: Int,
    targetSchema: String,
    targetTable: String
)

/** ref: DW_Output_Column_Config (1. Metadata Creation.sql:127-147). */
final case class OutputColumnConfig(
    outputColumnId: Int,
    outputTableId: Int,
    sourceTableId: Int,
    targetColumnName: String,
    targetDataType: String, // e.g. BIGINT, INT, DOUBLE, DATE, VARCHAR(100), DECIMAL(18,2)
    targetPosition: Int,
    additionalTransform: Option[String] = None,
    isKey: Boolean = false
)

/** ref: DW_Process_Master (1. Metadata Creation.sql:4-17). */
final case class ProcessMaster(
    processId: Long,
    processDate: String, // ISO date; logical business date of the run
    processType: String, // EOD | HOURLY
    currentStage: String, // INIT_STAGE | STAGING_EXTRACT | DATA_TRANSFORMATION | DATA_WAREHOUSE_LOAD
    status: String, // RUNNING | SUCCESS | FAILED | PARTIAL
    remarks: Option[String] = None,
    errorMessage: Option[String] = None
)

/** ref: DW_Process_Stage_Detail (1. Metadata Creation.sql:24-44). */
final case class StageDetail(
    stageName: String, // STAGING_EXTRACT | TRANSFORMATION | DATA_WAREHOUSE_LOAD
    processId: Long,
    tableId: Option[Int],
    tableName: String,
    rowCount: Option[Long],
    status: String, // SUCCESS | FAILED
    errorMessage: Option[String] = None,
    outputPath: Option[String] = None
)

/** A full table-level extraction spec: table config + its columns. */
final case class ExtractSpec(table: TableConfig, columns: Seq[ColumnConfig])

/** Lake-zone layout for one environment — the typed form of the
  * reference's config.yaml PATHS block (RAW_ZONE / STAGING_ZONE /
  * CURATED_ZONE / LOGS_PATH, ref: /root/reference/config/config.yaml)
  * keyed by the ENVIRONMENT name the reference's DAG selects with its
  * `env` argument. Zone paths derive from here; TableConfig's
  * per-table path overrides stay possible but optional.
  */
final case class ZoneConfig(
    env: String, // DEV | PROD
    rawZone: String,
    stagingZone: String,
    curatedZone: String,
    logsPath: String
) {
  def rawPathFor(table: String): String = s"$rawZone/$table"
  def stagingPathFor(table: String): String = s"$stagingZone/$table"
  def curatedPathFor(table: String): String = s"$curatedZone/$table"
}

/** SSH-tunnel config for a firewalled source (ref: /root/reference/
  * source_code/python/local_utility/"1.1 TestConnectionSSH.py", which
  * builds its tunnel forwarder from exactly these fields: bastion
  * host/port/user/key plus the forwarded DB endpoint and the local
  * bind port). No live SSH runs in this library's posture —
  * [[graft.etl.Preflight]] validates the CONFIG SHAPE, which is the
  * half of TestConnectionSSH that fails fast before any socket opens;
  * a deployment wires the validated config into its own forwarder.
  */
final case class TunnelConfig(
    env: String,
    sshHost: String,
    sshPort: Int,
    sshUser: String,
    keyPath: String,
    remoteHost: String,
    remotePort: Int,
    localPort: Int)
