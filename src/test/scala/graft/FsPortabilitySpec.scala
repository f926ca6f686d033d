package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Object-store portability of every DATA-PATH filesystem touch
  * (VERDICT r10 item 1): listings, existence probes and deletes go
  * through the Hadoop `FileSystem` API (graft.sources.Fs) — never
  * `java.io.File`, which on s3a:/hdfs: silently sees nothing. Two
  * layers: a functional round-trip of the Fs helpers through a real
  * manifest/vacuum-shaped layout, and a source-scan pin that
  * `java.io.File` survives ONLY in the documented local-by-
  * construction harness spots.
  */
class FsPortabilitySpec extends AnyFunSuite with SparkSuite {

  test("Fs helpers: list/exists/delete round-trip a manifest-shaped layout with read-back-able URIs") {
    import spark.implicits._
    val root = graft.sources.SourceOps.tmpDir("graft_fs_spec")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .repartition(2).write.parquet(s"$root/data/b1")
    Seq((3L, "c")).toDF("k", "v")
      .repartition(1).write.parquet(s"$root/data/b2")

    // children of a batch dir: names + FULLY-QUALIFIED paths that feed
    // straight back into spark.read.parquet
    val b1 = graft.sources.Fs.listChildren(spark, s"$root/data/b1")
      .collect { case (n, p) if n.endsWith(".parquet") => p }
    assert(b1.size == 2)
    assert(b1.forall(_.contains(":/")), s"paths must be scheme-qualified: $b1")
    assert(spark.read.parquet(b1: _*).count() == 2)

    // grandchildren = the data/<batch>/<part> lake walk
    val all = graft.sources.Fs.listGrandchildren(spark, s"$root/data")
      .collect { case (n, p) if n.endsWith(".parquet") => p }
    assert(all.size == 3)

    // delete one orphan; the listing shrinks, the survivors still read
    val orphan = all.filterNot(b1.contains).head
    assert(graft.sources.Fs.delete(spark, orphan))
    val after = graft.sources.Fs.listGrandchildren(spark, s"$root/data")
      .collect { case (n, p) if n.endsWith(".parquet") => p }
    assert(after.toSet == b1.toSet)
    assert(spark.read.parquet(after: _*).agg(sum("k")).head.getLong(0) == 3L)

    // exists: present dir, absent dir
    assert(graft.sources.Fs.exists(spark, s"$root/data/b1"))
    assert(!graft.sources.Fs.exists(spark, s"$root/data/never_written"))
    assert(graft.sources.Fs.listChildren(spark, s"$root/data/never_written").isEmpty)
  }

  test("source-scan pin: java.io.File appears ONLY in the documented local-harness spots") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    val walk = java.nio.file.Files.walk(root)
    val hits =
      try walk.iterator().asScala
        .filter(p => p.toString.endsWith(".scala"))
        .flatMap { p =>
          val src = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
          // count code references, not the Fs scaladoc explaining the rule
          val n = src.sliding("java.io.File".length).count(_ == "java.io.File")
          val doc = p.toString.endsWith("sources/Fs.scala")
          if (n > 0 && !doc) Some(p.toString -> n) else None
        }.toMap
      finally walk.close()
    // ALLOWLIST — each is local by construction, never a lake path:
    // - StreamOps.stampNewFiles: FileStreamSource mtime choreography for
    //   the staged gate inputs (setLastModified has no object-store
    //   analogue; S3A setTimes is unsupported)
    // - Verify: the driver contract writes its dump to a local out dir
    val allowed = Set(
      "src/main/scala/graft/streaming/StreamOps.scala",
      "src/main/scala/graft/Verify.scala")
    assert(hits.keySet.subsetOf(allowed),
      s"java.io.File leaked into a data path: ${hits.keySet -- allowed} — " +
        "use graft.sources.Fs (Hadoop FileSystem) instead")
  }

  test("source-scan pin: SourceOps manifest/vacuum/snapshot listings go through Fs") {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/sources/SourceOps.scala")), "UTF-8")
    assert(!src.contains("java.io.File"), "SourceOps must not touch java.io.File")
    assert(src.contains("Fs.listChildren") && src.contains("Fs.listGrandchildren")
      && src.contains("Fs.delete"), "manifest/vacuum/snapshot must use the Fs helpers")
  }
}
