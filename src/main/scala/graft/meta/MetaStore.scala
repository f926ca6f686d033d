package graft.meta

import org.apache.spark.sql.{Dataset, SparkSession}

/** Parquet-persistable catalog — the storage role of the reference's
  * `utility_staging` MySQL schema (ref: "1. Metadata Creation.sql"),
  * re-homed to the lake: config is data-small, so it round-trips
  * through Datasets and lives next to the zones it describes.
  */
final case class Catalog(
    tables: Seq[TableConfig],
    columns: Seq[ColumnConfig],
    outputColumns: Seq[OutputColumnConfig]
) {
  def specFor(tableId: Int): ExtractSpec = {
    val t = tables.find(_.tableId == tableId)
      .getOrElse(sys.error(s"no TableConfig for tableId=$tableId"))
    ExtractSpec(t, columns.filter(_.tableId == tableId))
  }
  def activeSpecs: Seq[ExtractSpec] =
    tables.filter(_.activeFlag).map(t => specFor(t.tableId))
}

object MetaStore {

  def save(spark: SparkSession, catalog: Catalog, dir: String): Unit = {
    import spark.implicits._
    catalog.tables.toDS().write.mode("overwrite").parquet(s"$dir/table_config")
    catalog.columns.toDS().write.mode("overwrite").parquet(s"$dir/column_config")
    catalog.outputColumns.toDS().write.mode("overwrite").parquet(s"$dir/output_column_config")
  }

  def load(spark: SparkSession, dir: String): Catalog = {
    import spark.implicits._
    Catalog(
      spark.read.parquet(s"$dir/table_config").as[TableConfig].collect().toSeq.sortBy(_.tableId),
      spark.read.parquet(s"$dir/column_config").as[ColumnConfig].collect().toSeq.sortBy(_.columnId),
      spark.read.parquet(s"$dir/output_column_config").as[OutputColumnConfig].collect().toSeq
        .sortBy(_.outputColumnId))
  }

  /** The seeded sample catalog (ref: "2. SampleConfigInsert.sql"). */
  def sample: Catalog = Catalog(
    SampleCatalog.all.map(_.table),
    SampleCatalog.all.flatMap(_.columns),
    SampleCatalog.lineitemOutput)

  /** Zone config persists beside the catalog (the reference keeps it
    * in config.yaml PATHS; here it round-trips through the lake like
    * every other config table). Multiple environments live in one
    * dataset; [[loadZones]] selects by env name like the DAG's `env`
    * argument selects its ENVIRONMENT block.
    */
  def saveZones(spark: SparkSession, zones: Seq[ZoneConfig], dir: String): Unit = {
    import spark.implicits._
    zones.toDS().write.mode("overwrite").parquet(s"$dir/zone_config")
  }

  def loadZones(spark: SparkSession, dir: String, env: String): ZoneConfig = {
    import spark.implicits._
    spark.read.parquet(s"$dir/zone_config").as[ZoneConfig]
      .collect().find(_.env == env)
      .getOrElse(sys.error(s"no ZoneConfig for env=$env"))
  }

  /** Deterministic sample zones (logical roots; deployments point
    * these at real lake URIs).
    */
  def sampleZones: ZoneConfig =
    ZoneConfig("DEV", "raw_zone", "staging_zone", "curated_zone", "logs")

  /** Fictional sample tunnel config (placeholder endpoints, like the
    * sample zones — deployments substitute real bastion/DB hosts).
    */
  def sampleTunnel: TunnelConfig =
    TunnelConfig("DEV", "bastion.example.internal", 22, "etl_svc",
      "/keys/etl_svc_ed25519", "db.example.internal", 3306, 13306)
}
