package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file consolidation — the Spark-native form of the
  * reference's chunk merge (ref: staging_data_extraction.py
  * consolidate_chunks_to_mainFile: read all `<table>_part_*.parquet`,
  * drop empty / all-NA chunks, concat, write one snappy parquet,
  * delete parts).
  *
  * Differences by design: row-level all-null filtering (a strict
  * superset of the reference's chunk-level check), and size-aware
  * output file count instead of a single file — one file is the
  * 100 TB anti-pattern; the writer targets `rowsPerFile` so
  * downstream scans parallelize.
  */
object Consolidator {

  /** Drop rows where every column is null (reference: skip chunks
    * where `df.isna().all(axis=None)`).
    */
  def dropAllNullRows(df: DataFrame): DataFrame = df.na.drop("all")

  /** Read a directory of small part files, filter degenerate rows,
    * and rewrite compacted. Returns (rowCount, fileCount).
    */
  def consolidate(
      spark: SparkSession,
      inputDir: String,
      outputPath: String,
      rowsPerFile: Long = 1000000L
  ): (Long, Int) = {
    val df = dropAllNullRows(spark.read.parquet(inputDir))
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / rowsPerFile).toInt)
    df.repartition(files).write.mode("overwrite").parquet(outputPath)
    (n, files)
  }
}
