package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for etl_zorder_layout, samp_importance and
  * exp_curriculum.
  */
class LayoutSamplingSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("zorder: every bucket bounds BOTH dimensions (span < 128) and accounts for all rows") {
    val df = run("etl_zorder_layout").cache()
    assert(df.count() > 0)
    // bucket = zv >> 14 fixes pk bits >= 7 and sk bits >= 7, so each
    // bucket's span in EITHER dimension is under 2^7 — the property a
    // single-column sort cannot give the second column
    assert(df.filter(col("pk_span") >= 128 || col("sk_span") >= 128).count() == 0)
    val total = df.agg(sum(col("n_rows"))).head().getLong(0)
    assert(total == Tables.load(spark, sfDir, "lineitem").count())
  }

  test("importance sample accepts exactly the 2h < quality set, at most half the corpus") {
    val df = run("samp_importance").cache()
    val n = df.count()
    assert(n > 0)
    assert(df.filter(lit(2) * col("h_ppm") >= col("quality_ppm")).count() == 0)
    val corpus = Tables.load(spark, sfDir, "documents").count()
    assert(n <= corpus / 2 + 1)
  }

  test("curriculum: 4 balanced phases per source covering every doc exactly once") {
    val df = run("exp_curriculum").cache()
    assert(df.count() == Tables.load(spark, sfDir, "documents").count())
    assert(df.filter(col("phase") < 1 || col("phase") > 4).count() == 0)
    // ntile balance: within a source, phase sizes differ by at most 1
    val sizes = df.groupBy("source", "phase").agg(count(lit(1)).as("c"))
      .groupBy("source").agg((max(col("c")) - min(col("c"))).as("spread"))
    assert(sizes.filter(col("spread") > 1).count() == 0)
  }
}
