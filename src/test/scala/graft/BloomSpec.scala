package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** etl_bloom_prefilter invariants: the defining Bloom guarantees the
  * oracle hash can't articulate — no false negatives ever, and the
  * pre-filter keeps every true member while pruning (or at worst
  * passing) non-members.
  */
class BloomSpec extends AnyFunSuite with SparkSuite {

  test("bloom pre-filter never drops a true member (zero false negatives)") {
    val df = Registry.byName("etl_bloom_prefilter").run(spark, sfDir).cache()
    assert(df.count() > 0)
    assert(df.filter(col("true_member") === 1 && col("bloom_member") === 0).count() == 0)
  }

  test("bloom pass-set is a superset of members and false-positive rate is sane") {
    val df = Registry.byName("etl_bloom_prefilter").run(spark, sfDir).cache()
    val members = df.filter(col("true_member") === 1).count()
    val passed = df.filter(col("bloom_member") === 1).count()
    val nonMembers = df.filter(col("true_member") === 0).count()
    assert(passed >= members)
    // m=64Ki, k=3 at testdata cardinalities → fp well under 10%
    val fp = df.filter(col("bloom_member") === 1 && col("true_member") === 0).count()
    assert(nonMembers == 0 || fp.toDouble / nonMembers < 0.1)
  }
}
