package graft

import org.scalatest.funsuite.AnyFunSuite

/** The staged near-dup pair graph must be a pure materialization: the
  * parquet round-trip may never change the pair set, and the memo may
  * never serve a stale or dangling stage (ADVICE r4).
  */
class StagedPairSpec extends AnyFunSuite with SparkSuite {
  import graft.ops.Dedup

  test("staged pair graph equals the inline (unstaged) pair plan") {
    val staged = Dedup.nearDupPairs(spark, sfDir)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val inline = Dedup.ngramJaccardPairs(
        Tables.load(spark, sfDir, "documents"), Dedup.MaxShingleDf)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(staged.nonEmpty, "pair graph unexpectedly empty at sf0.001")
    assert(staged == inline)
  }

  test("staged embedding pair set equals the inline IVF pair plan") {
    val staged = Dedup.embeddingNearDupPairs(spark, sfDir)
      .orderBy("vec_a", "vec_b").collect().toSeq
    val inline = Dedup.embeddingPairsIvf(
        Tables.load(spark, sfDir, "embeddings"), Dedup.EmbTau)
      .orderBy("vec_a", "vec_b").collect().toSeq
    assert(staged.nonEmpty, "embedding pair set unexpectedly empty")
    assert(staged == inline)
  }

  test("a reaped stage dir re-stages instead of serving a dangling path") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val first = Dedup.nearDupPairs(spark, sfDir)
    val n = first.count()
    val stageDir = Paths.get(
      new java.net.URI(first.inputFiles.head).getPath).getParent
    val walk = Files.walk(stageDir)
    try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .iterator().asScala.foreach(Files.deleteIfExists(_))
    finally walk.close()
    assert(!Files.exists(stageDir))
    val again = Dedup.nearDupPairs(spark, sfDir)
    assert(again.count() == n)
  }

  test("corpusSnapshot refuses non-local and absent paths (no constant-hash staleness)") {
    assert(Dedup.corpusSnapshot("hdfs://nn:8020/warehouse/docs").isEmpty)
    assert(Dedup.corpusSnapshot("s3a://bucket/prefix").isEmpty)
    assert(Dedup.corpusSnapshot("/no/such/dir/anywhere").isEmpty)
    assert(Dedup.corpusSnapshot(sfDir).nonEmpty)
  }

  test("resetPairStage drops staged dirs so the next consumer re-stages") {
    import java.nio.file.{Files, Paths}
    val before = Dedup.nearDupPairs(spark, sfDir)
    val n = before.count()
    val stageDir = Paths.get(
      new java.net.URI(before.inputFiles.head).getPath).getParent
    Dedup.resetPairStage()
    assert(!Files.exists(stageDir), "reset must delete the staged dir")
    val after = Dedup.nearDupPairs(spark, sfDir)
    assert(after.count() == n)
  }

  test("reset also drops the label and band stages; re-staging reproduces both") {
    import java.nio.file.{Files, Paths}
    val labels = Registry.byName("dedup_clusters").run(spark, sfDir)
    val lsh = Registry.byName("dedup_minhash_lsh").run(spark, sfDir)
    val labelRows = labels.collect().toSeq
    val lshRows = lsh.collect().toSeq
    val labelDir = Paths.get(
      new java.net.URI(labels.inputFiles.head).getPath).getParent
    Dedup.resetPairStage()
    assert(!Files.exists(labelDir), "reset must delete the staged labels dir")
    // fresh stages (pairs -> labels, bands) must reproduce the rows
    assert(Registry.byName("dedup_clusters").run(spark, sfDir)
      .collect().toSeq == labelRows)
    assert(Registry.byName("dedup_minhash_lsh").run(spark, sfDir)
      .collect().toSeq == lshRows)
  }
}
