package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation primitives for hot keys at 100 TB.
  *
  * AQE's skew-join handling covers joins; aggregation skew over a
  * low-cardinality hot key still funnels a whole key into one task.
  * `saltedAggregate` does the classic two-phase pattern: salt the key
  * with a deterministic shard id, pre-aggregate per (key, salt), then
  * merge shards — the heavy shuffle carries `salt`× more parallelism,
  * the second one only |keys|×salt rows.
  */
object Skew {

  /** Two-phase aggregation: `partials` are applied per (keys, salt)
    * shard; `merges` combine shard results (must be the algebraic
    * merge of the partial, e.g. sum→sum, count→sum, min→min).
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      partials: Seq[(Column, String)], // (aggregate expr, output name)
      merges: Seq[String] => Seq[Column], // given partial names, merge exprs
      saltBuckets: Int = 16
  ): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head._1.as(partials.head._2),
        partials.tail.map { case (c, n) => c.as(n) }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(merges(partials.map(_._2)).head, merges(partials.map(_._2)).tail: _*)
  }

  /** Broadcast-salt the small side of a skewed join: replicate each
    * small-side row `saltBuckets` times, salt the big side
    * deterministically, join on (key, salt). Equivalent to the plain
    * join; spreads each hot key over `saltBuckets` tasks.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltBuckets: Int = 16
  ): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltBuckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1)).cast("array<bigint>")))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
