package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** curation_manifest must reconcile row-for-row with the component
  * ops whose stages it composes (beyond its own oracle hash check).
  */
class CurationSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("manifest reconciles with exact dedup, clusters and the pipeline counts") {
    val m = run("curation_manifest").cache()
    val docs = Tables.load(spark, sfDir, "documents")
    assert(m.count() == docs.count(), "one manifest row per document")
    assert(m.select("doc_id").distinct().count() == m.count())

    // exact_dup dispositions = exactly the non-canonical content-hash docs
    val exactDups = run("dedup_exact").filter(col("is_duplicate") === 1)
      .select("doc_id")
    val mExact = m.filter(col("disposition") === "exact_dup").select("doc_id")
    assert(mExact.count() == exactDups.count())
    assert(mExact.join(exactDups, Seq("doc_id"), "left_anti").count() == 0)

    // every non-canonical cluster member is claimed by a dedup stage,
    // and near_dup claims nothing outside that set
    val ndDrop = run("dedup_clusters").filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    val mNear = m.filter(col("disposition") === "near_dup").select("doc_id")
    assert(mNear.join(ndDrop, Seq("doc_id"), "left_anti").count() == 0)
    assert(ndDrop.join(
      m.filter(col("disposition").isin("exact_dup", "near_dup")).select("doc_id"),
      Seq("doc_id"), "left_anti").count() == 0)

    // pipeline count reconciliation: survivors of the dedup stages =
    // all docs minus the dedup-claimed ones
    val pipe = run("dedup_corpus_pipeline").head()
    val afterNearDup = pipe.getAs[Long]("n_after_neardup")
    assert(afterNearDup == m.count() - mExact.count() - mNear.count())

    // kept docs all clear the quality gate; low_quality all fail it
    assert(m.filter(col("disposition") === "kept" &&
      col("quality_ppm") < 550000L).count() == 0)
    assert(m.filter(col("disposition") === "low_quality" &&
      col("quality_ppm") >= 550000L).count() == 0)
    m.unpersist()
  }

  test("manifest is deterministic across runs") {
    val a = run("curation_manifest").collect().toSeq
    assert(a == run("curation_manifest").collect().toSeq && a.nonEmpty)
  }
}
