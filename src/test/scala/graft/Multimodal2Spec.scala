package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the second multimodal pack. */
class Multimodal2Spec extends AnyFunSuite with SparkSuite {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("mm_aspect_buckets: assignment is the true integer argmin and waste re-derives") {
    val rows = run("mm_aspect_buckets").collect()
    assert(rows.nonEmpty && rows.length <= 5)
    // re-derive the dimension grid exactly as the op does
    val dims = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 3 === 0)
      .select(
        expr("256 + (CAST(conv(substr(md5(concat('w', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 17) * 64").as("w"),
        expr("256 + (CAST(conv(substr(md5(concat('h', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 17) * 64").as("h"))
      .collect().map(r => (r.getAs[Long]("w"), r.getAs[Long]("h")))
    val ratios = Seq(("r1x1", 1L, 1L), ("r4x3", 4L, 3L), ("r3x4", 3L, 4L),
      ("r16x9", 16L, 9L), ("r9x16", 9L, 16L))
    def bucket(w: Long, h: Long): String =
      ratios.map { case (n, rn, rd) => (math.abs(w * rd - h * rn) * (144 / rd), n) }
        .minBy(_._1)._2 // stable minBy = earliest on ties, same as the CASE chain
    val mine = dims.groupBy { case (w, h) => bucket(w, h) }
    assert(rows.map(_.getAs[String]("bucket")).toSet == mine.keySet)
    for (r <- rows) {
      val b = mine(r.getAs[String]("bucket"))
      assert(r.getAs[Long]("n_images") == b.length)
      val truePx = b.map { case (w, h) => BigInt(w) * h }.sum
      assert(BigInt(r.getAs[Long]("true_px")) == truePx)
      val canvas = BigInt(b.map(_._1).max) * b.map(_._2).max * b.length
      assert(BigInt(r.getAs[Long]("pad_waste_ppm")) == (canvas - truePx) * 1000000 / canvas)
    }
    // every image pads up, never crops: waste is non-negative and < 1
    rows.foreach(r => assert(r.getAs[Long]("pad_waste_ppm") >= 0 &&
      r.getAs[Long]("pad_waste_ppm") < 1000000L))
  }

  test("mm_modality_mix: shares normalize per modality and per corpus") {
    val rows = run("mm_modality_mix").collect()
    assert(rows.map(_.getAs[String]("media_type")).toSet == Set("image", "audio", "video"))
    val n = Tables.load(spark, sfDir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == n)
    // per-modality truncating shares sum to within |langs| ppm of 10⁶
    for ((_, g) <- rows.groupBy(_.getAs[String]("media_type"))) {
      val s = g.map(_.getAs[Long]("share_of_type_ppm")).sum
      assert(s > 1000000L - g.length && s <= 1000000L)
    }
    val sc = rows.map(_.getAs[Long]("share_of_corpus_ppm")).sum
    assert(sc > 1000000L - rows.length && sc <= 1000000L)
    // byte mass equals the ASCII text length mass (payload == text bytes)
    val bytes = Tables.load(spark, sfDir, "documents")
      .agg(sum(octet_length(col("text")).cast("long"))).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("bytes")).sum == bytes)
  }

  test("mm_interleave_pack: manifest is a lossless pack with the modality cost model") {
    val rows = run("mm_interleave_pack").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    assert(rows.length == nDocs && rows.map(_._4).distinct.length == nDocs,
      "every doc packs exactly once")
    rows.foreach { case (_, _, off, id, mt, txt, media, total) =>
      assert(mt == Seq("image", "audio", "video")((id % 3).toInt))
      assert(total == txt + media && off >= 0 && off < 512L)
      assert(media > 0, s"doc $id contributes no media patches")
    }
    // per (shard, seq): offsets are exactly the running sum of the
    // preceding docs' totals — the loader can reconstruct every
    // sequence from the manifest alone
    rows.groupBy(r => (r._1, r._2)).foreach { case ((sh, seq), g) =>
      val sorted = g.sortBy(_._3).toSeq
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        assert(b._3 == a._3 + a._8,
          s"offset gap in shard $sh seq $seq between docs ${a._4} and ${b._4}")
      }
    }
  }
}
