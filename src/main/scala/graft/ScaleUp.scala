package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize an N× corpus from a testdata scale dir by unioning
  * key-shifted copies — the harness for measuring the SCALING SLOPE
  * of every registered operator (nothing else proves the "would still
  * work at 100 TB" claim by measurement rather than plan-reading).
  *
  * Construction per copy k (copy 0 is the original, untouched):
  *  - every entity key (custkey, orderkey, partkey, suppkey, doc_id,
  *    vec_id, event_id, user_id) shifts by k·10⁹ — joins stay intact
  *    WITHIN a copy and never match across copies, so join/agg
  *    selectivities are preserved at N× the rows;
  *  - region/nation stay single-copy (true dimensions: a 10× larger
  *    warehouse has 10× the facts, not 10× the countries);
  *  - document text is token-tagged per copy (`ck_<token>`): shingle
  *    sets are disjoint across copies, so the near-dup pair graph
  *    grows N× linearly. Plain duplication would instead make every
  *    doc a 10-way exact dup — a pathological corpus whose pair graph
  *    grows quadratically IN EVERY ENGINE, which would measure the
  *    workload change, not the engine's slope;
  *  - embeddings get a tiny per-copy component offset (k·10⁻⁴) for
  *    the same reason: identical vectors would turn the banded-LSH
  *    verify stage into an all-pairs-within-bucket blowup by data
  *    construction.
  *
  * Usage: runMain graft.ScaleUp <srcDir> <outDir> <copies>
  */
object ScaleUp {

  private val Off = 1000000000L

  def scaleTable(df: DataFrame, table: String, k: Int): DataFrame = {
    val off = k * Off
    table match {
      case "region" | "nation" => df
      case "customer" => df.withColumn("c_custkey", col("c_custkey") + off)
      case "supplier" => df.withColumn("s_suppkey", col("s_suppkey") + off)
      case "part" => df.withColumn("p_partkey", col("p_partkey") + off)
      case "orders" => df
        .withColumn("o_orderkey", col("o_orderkey") + off)
        .withColumn("o_custkey", col("o_custkey") + off)
      case "lineitem" => df
        .withColumn("l_orderkey", col("l_orderkey") + off)
        .withColumn("l_partkey", col("l_partkey") + off)
        .withColumn("l_suppkey", col("l_suppkey") + off)
      case "events" => df
        .withColumn("event_id", col("event_id") + off)
        .withColumn("user_id", col("user_id") + off)
      case "documents" =>
        val tagged =
          if (k == 0) df
          else df.withColumn("text",
            regexp_replace(col("text"), "(\\S+)", s"c${k}_$$1"))
        tagged
          .withColumn("doc_id", col("doc_id") + off)
          .withColumn("n_chars", length(col("text")).cast("bigint"))
      case "embeddings" =>
        // circular component rotation per copy: preserves norms and
        // the per-copy geometry exactly, while cross-copy cosines
        // drop to noise (a small additive perturbation would leave
        // copies at cosine ≈ 1 — every cross-copy pair a near-dup —
        // making the TRUE pair set quadratic in copies and the slope
        // measurement meaningless)
        val shiftN = (k * 13) % 64
        val rotated =
          if (shiftN == 0) df
          else df.withColumn("embedding", expr(
            s"concat(slice(embedding, ${shiftN + 1}, ${64 - shiftN}), slice(embedding, 1, $shiftN))"))
        rotated.withColumn("vec_id", col("vec_id") + off)
      case other => sys.error(s"unknown table $other")
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, copiesStr) = args
    val copies = copiesStr.toInt
    require(copies >= 1, "copies must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.build(appName = "graft-scaleup", master = s"local[$cpus]")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    for (t <- tables) {
      val base = spark.read.parquet(s"$srcDir/$t.parquet")
      val scaled =
        if (t == "region" || t == "nation") base
        else (0 until copies).map(k => scaleTable(base, t, k)).reduce(_ unionByName _)
      scaled.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"SCALED $t -> ${spark.read.parquet(s"$outDir/$t.parquet").count()} rows")
    }
    spark.stop()
  }
}
