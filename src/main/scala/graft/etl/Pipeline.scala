package graft.etl

import graft.meta.{ExtractSpec, ProcessMaster, StageDetail, ZoneConfig}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference DAG's stage flow as a pure Scala orchestration:
  * INIT → STAGING_EXTRACT (per-table) → audit rows (ref:
  * /root/reference/dag/SMFG_DW_ETL_DAG.py — init_stage,
  * extraction_stage_*; process_logger.py create_process_master /
  * log_process_stage_detail).
  *
  * Per-table parallelism is Spark's job scheduling; the audit log is
  * a Dataset (parquet-appendable) instead of MySQL rows — there is no
  * transactional RDBMS on a 1000-executor batch path.
  */
object Pipeline {

  final case class Result(
      master: ProcessMaster,
      stages: Seq[StageDetail],
      extracts: Map[String, DataFrame]
  )

  /** Run STAGING_EXTRACT for every active spec; count rows per table
    * (the reference logs RowCount per stage row).
    */
  def runStagingExtract(
      spark: SparkSession,
      dir: String,
      specs: Seq[ExtractSpec],
      processId: Long = 1L,
      processDate: String = "1970-01-01",
      zones: Option[ZoneConfig] = None
  ): Result = {
    val active = specs.filter(_.table.activeFlag)
    val results = active.map { spec =>
      // plan construction can itself fail analysis (bad config
      // expressions / columns) — it must land in the same FAILED
      // stage row as an execution failure
      val attempt = scala.util.Try {
        val df = ExtractionPlanner.extract(spark, dir, spec)
        df -> df.count()
      }
      val detail = StageDetail(
        stageName = "STAGING_EXTRACT",
        processId = processId,
        tableId = Some(spec.table.tableId),
        tableName = spec.table.tableName,
        rowCount = attempt.toOption.map(_._2),
        status = if (attempt.isSuccess) "SUCCESS" else "FAILED",
        errorMessage = attempt.failed.toOption.map(_.getMessage),
        // per-table override wins; otherwise the zone layout decides
        // (the reference concatenates STAGING_ZONE + table the same way)
        outputPath = spec.table.stagingZonePath
          .orElse(zones.map(_.stagingPathFor(spec.table.tableName)))
      )
      detail -> attempt.toOption.map(spec.table.tableName -> _._1)
    }
    val stages = results.map(_._1)
    val overall = if (stages.forall(_.status == "SUCCESS")) "SUCCESS"
      else if (stages.exists(_.status == "SUCCESS")) "PARTIAL" else "FAILED"
    Result(
      ProcessMaster(processId, processDate, "EOD", "STAGING_EXTRACT", overall,
        remarks = Some(s"Extraction summary -> Success: ${stages.count(_.status == "SUCCESS")}, " +
          s"Failed: ${stages.count(_.status != "SUCCESS")}")),
      stages,
      results.flatMap(_._2).toMap
    )
  }

  /** Failed-stage resume: re-extract ONLY the tables whose stage rows
    * FAILED in a previous run, then merge update-if-exists style —
    * each retried table's old FAILED row is replaced by its new row,
    * successful rows carry over untouched, and the master status is
    * recomputed over the merged log (ref: process_logger.py
    * update_process_stage_detail updates the same stage record after
    * completion instead of appending a duplicate).
    *
    * `specs` is the CURRENT catalog — a rerun naturally follows a
    * config fix, so retried tables extract under the corrected spec.
    * Tables that failed before but are absent/inactive in the current
    * catalog keep their FAILED row (nothing to retry with).
    */
  def rerunFailed(
      spark: SparkSession,
      dir: String,
      specs: Seq[ExtractSpec],
      previous: Result,
      zones: Option[ZoneConfig] = None
  ): Result = {
    val failedIds = previous.stages.filter(_.status == "FAILED").flatMap(_.tableId).toSet
    val retrySpecs = specs.filter(s => failedIds.contains(s.table.tableId))
    val retried = runStagingExtract(spark, dir, retrySpecs,
      previous.master.processId, previous.master.processDate, zones)
    val retriedIds = retried.stages.flatMap(_.tableId).toSet
    val mergedStages = previous.stages.filterNot(s =>
      s.tableId.exists(retriedIds.contains)) ++ retried.stages
    val overall = if (mergedStages.forall(_.status == "SUCCESS")) "SUCCESS"
      else if (mergedStages.exists(_.status == "SUCCESS")) "PARTIAL" else "FAILED"
    Result(
      previous.master.copy(status = overall,
        remarks = Some(s"Rerun of ${retried.stages.size} FAILED table(s) -> " +
          s"Success: ${mergedStages.count(_.status == "SUCCESS")}, " +
          s"Failed: ${mergedStages.count(_.status != "SUCCESS")}")),
      mergedStages,
      previous.extracts ++ retried.extracts
    )
  }

  /** Automatic retry policy — the typed counterpart of the reference
    * DAG's `retries` / `retry_delay` / `email_on_failure` default
    * args (ref: /root/reference/dag/SMFG_DW_ETL_DAG.py:38-44,
    * retries=0, retry_delay=5min, email_on_failure=False). Spark
    * already retries TASKS; this is the STAGE-level re-entry the DAG
    * scheduler would drive, wrapped around [[rerunFailed]].
    *
    * `onFailure` is the alerting hook: invoked ONCE, after the final
    * attempt, with the stage rows still FAILED — the seam where a
    * deployment plugs its pager/mail sink. The pipeline also emits an
    * ALERT audit row itself (see [[runWithRetries]]), so the alert is
    * part of the queryable process log even when the hook is a no-op,
    * and a THROWING hook is contained to an ALERT_FAILED row — a
    * broken mail relay must not take down the batch that wanted to
    * report a partial failure.
    */
  final case class RetryPolicy(retries: Int = 0,
      delay: scala.concurrent.duration.FiniteDuration =
        scala.concurrent.duration.Duration(5, "min"),
      onFailure: Seq[StageDetail] => Unit = _ => ())

  /** Run STAGING_EXTRACT, then retry ONLY the failed tables up to
    * `policy.retries` times with `policy.delay` between attempts
    * (update-if-exists merge per attempt, exactly [[rerunFailed]]).
    * `catalog` is re-read before every attempt — the scheduler
    * re-reads config when it re-runs a task, so a fix landed between
    * attempts is picked up (that's what makes a failure transient).
    * Returns the final merged result plus every attempt's own result
    * — the per-attempt stage rows are the audit trail (one row per
    * table per attempt across the sequence). Stops early once nothing
    * is FAILED.
    */
  def runWithRetries(
      spark: SparkSession,
      dir: String,
      catalog: () => Seq[ExtractSpec],
      policy: RetryPolicy,
      processId: Long = 1L,
      processDate: String = "1970-01-01",
      zones: Option[ZoneConfig] = None
  ): (Result, Seq[Result]) = {
    val first = runStagingExtract(spark, dir, catalog(), processId, processDate, zones)
    var merged = first
    val attempts = Seq.newBuilder[Result]
    attempts += first
    var attempt = 0
    while (attempt < policy.retries && merged.stages.exists(_.status == "FAILED")) {
      if (policy.delay.toMillis > 0) Thread.sleep(policy.delay.toMillis)
      val before = merged
      merged = rerunFailed(spark, dir, catalog(), before, zones)
      // the attempt's own rows = what this rerun actually re-extracted
      attempts += merged.copy(stages =
        merged.stages.diff(before.stages))
      attempt += 1
    }
    val stillFailed = merged.stages.filter(_.status == "FAILED")
    if (stillFailed.nonEmpty) {
      val hook = scala.util.Try(policy.onFailure(stillFailed))
      merged = merged.copy(stages = merged.stages :+ StageDetail(
        stageName = "ALERT",
        processId = merged.master.processId,
        tableId = None,
        tableName = stillFailed.map(_.tableName).sorted.mkString(","),
        rowCount = Some(stillFailed.size.toLong),
        status = if (hook.isSuccess) "SENT" else "ALERT_FAILED",
        errorMessage = hook.failed.toOption.map(e => s"onFailure hook threw: ${e.getMessage}")
          .orElse(Some(s"${stillFailed.size} table(s) FAILED after ${policy.retries} retr" +
            (if (policy.retries == 1) "y" else "ies")))))
    }
    (merged, attempts.result())
  }

  /** Write every successful extract to its staging-zone path (the
    * reference's extraction stage lands snappy parquet under
    * STAGING_ZONE/<table>; ref: staging_data_extraction.py
    * extract_table_data + config.yaml PATHS). Returns table → path.
    * Failed tables have no extract and are skipped — their FAILED
    * stage rows carry the error; rerunFailed retries them.
    */
  def writeStaged(result: Result, zones: ZoneConfig): Map[String, String] =
    result.extracts.map { case (table, df) =>
      val path = result.stages.find(_.tableName == table).flatMap(_.outputPath)
        .getOrElse(zones.stagingPathFor(table))
      graft.sources.Sources.writeParquet(df, path)
      table -> path
    }

  /** Persist the run's audit rows to a JDBC database — the
    * reference's process logger writes DW_Process_Master /
    * DW_Process_Stage_Detail to MySQL (ref: process_logger.py
    * create_process_master / log_process_stage_detail); this is the
    * same surface over `df.write.jdbc`, so the warehouse's audit
    * trail can live in an operational RDBMS while the data stays in
    * the lake. Overwrite by default: callers log the FINAL merged
    * result (rerunFailed already applies update-if-exists in memory).
    */
  def writeAuditLog(spark: SparkSession, result: Result, url: String): Unit = {
    import graft.sources.Jdbc
    import spark.implicits._
    // na.fill(""): absent remarks/errors travel as empty strings —
    // Spark's JDBC writer calls setNull with the dialect's DEFAULT
    // string type (CLOB on Derby) even when createTableColumnTypes
    // declared VARCHAR, and Derby refuses the CLOB/VARCHAR mix
    Jdbc.write(Seq(result.master).toDS().toDF().na.fill("").coalesce(1),
      Jdbc.JdbcSourceSpec(url, "DW_PROCESS_MASTER"),
      stringColumnTypes = Map("processDate" -> 32, "processType" -> 16,
        "currentStage" -> 64, "status" -> 16, "remarks" -> 512, "errorMessage" -> 512))
    Jdbc.write(result.stages.toDS().toDF().na.fill("").coalesce(1),
      Jdbc.JdbcSourceSpec(url, "DW_PROCESS_STAGE_DETAIL"),
      stringColumnTypes = Map("stageName" -> 64, "tableName" -> 128,
        "status" -> 16, "errorMessage" -> 512, "outputPath" -> 512))
  }

  /** Stage-detail rows as a DataFrame (deterministic projection:
    * no wall-clock columns — timings live outside the comparable
    * contract).
    */
  def stageLog(spark: SparkSession, result: Result): DataFrame = {
    import spark.implicits._
    result.stages
      .map(s => (s.stageName, s.tableId.getOrElse(-1), s.tableName,
        s.rowCount.getOrElse(-1L), s.status, s.outputPath.getOrElse("")))
      .toDF("stage_name", "table_id", "table_name", "row_count", "status", "output_path")
  }
}
