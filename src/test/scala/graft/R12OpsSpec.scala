package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-12 additions, each re-derived by a brute driver-side
  * implementation that shares no ENGINE with the op (plain Scala
  * collections vs the op's Spark plans; the DuckDB oracle is the
  * third derivation):
  *  - dedup_substring: cross-document keep-first substring cuts vs a
  *    brute window map + interval merge;
  *  - txt_bpe_roundtrip: trained-table inference counts vs a brute
  *    pair-list trainer + greedy per-word application;
  *  - sim_index_merge: merged/rebuilt recall rows vs a full plain-
  *    Scala re-derivation of both grids (seed → Lloyd ppm means →
  *    assign → probe → top-K → recall).
  */
class R12OpsSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  private def docs(): Seq[(Long, String)] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  // -------------------------------------------------- dedup_substring
  test("dedup_substring: spans equal a brute cross-doc window map + interval merge") {
    val K = 16
    val got = run("dedup_substring").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start_tok"),
        r.getAs[Long]("end_tok"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_windows"), r.getAs[Long]("max_partner_docs")))
      .sortBy(t => (t._1, t._2)).toSeq

    // brute: window text → (distinct docs, canonical doc)
    val wins: Seq[(Long, Long, String)] = docs().flatMap { case (d, text) =>
      val toks = text.trim.split("\\s+")
      if (toks.length < K) Seq.empty
      else (0 to toks.length - K).map(p => (d, p.toLong, toks.slice(p, p + K).mkString(" ")))
    }
    val byWin = wins.groupBy(_._3).map { case (g, occ) =>
      val ds = occ.map(_._1).distinct
      g -> (ds.size.toLong, ds.min)
    }
    // cut positions per doc (window cross-doc duplicated, doc not canonical)
    val expect = wins
      .flatMap { case (d, p, g) =>
        val (nd, canon) = byWin(g)
        if (nd >= 2 && d > canon) Some((d, p, nd)) else None
      }
      .groupBy(_._1).toSeq.flatMap { case (d, ps) =>
        // interval merge of fixed-length-K windows (islandSpans brute)
        val sorted = ps.sortBy(_._2)
        val islands = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
        for ((_, p, nd) <- sorted) {
          if (islands.nonEmpty && p - (islands.last._2 - K + 1) < K) {
            val (s0, _, n, m) = islands.last
            islands(islands.size - 1) = (s0, p + K - 1, n + 1, math.max(m, nd))
          } else islands += ((p, p + K - 1, 1L, nd))
        }
        islands.map { case (s0, e0, n, m) => (d, s0, e0, e0 - s0 + 1, n, m) }
      }.sortBy(t => (t._1, t._2))
    assert(got.nonEmpty, "fixed corpus must contain cross-doc duplicated spans")
    assert(got == expect, s"got:\n$got\nwant:\n$expect")
    // removal semantics: a span's doc is never the canonical owner of
    // its first window, and every span is at least K tokens
    assert(got.forall(_._4 >= K))
  }

  // ------------------------------------------------ txt_bpe_roundtrip
  test("txt_bpe_roundtrip: trained-table inference equals brute train + greedy apply") {
    val got = run("txt_bpe_roundtrip").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sortBy(_._1)

    // brute trainer: token vectors, all-adjacent-position counts,
    // argmax by (count DESC, left, right), non-overlapping merge
    val words: Seq[(Long, Seq[String])] = docs().map { case (d, text) =>
      d -> "[A-Za-z]+".r.findAllIn(text).map(_.toLowerCase).toSeq
    }
    var vocab = words.flatMap(_._2).groupBy(identity)
      .map { case (w, ws) => (w.map(_.toString).toVector, ws.length.toLong) }.toSeq
    val learned = scala.collection.mutable.ArrayBuffer[(String, String)]()
    for (_ <- 1 to graft.ops.TextOps2.BpeTrainRounds) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (t, f) =>
        (0 until t.length - 1).foreach { i =>
          counts((t(i), t(i + 1))) = counts.getOrElse((t(i), t(i + 1)), 0L) + f
        }
      }
      val ((a, b), _) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
      learned += ((a, b))
      vocab = vocab.map { case (t, f) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < t.length) {
          if (i + 1 < t.length && t(i) == a && t(i + 1) == b) { out += (a + b); i += 2 }
          else { out += t(i); i += 1 }
        }
        (out.result(), f)
      }
    }
    // greedy lowest-rank-first inference with the learned table
    def applyLearned(word: String): Int = {
      var t = word.map(_.toString).toVector
      var done = false
      while (!done) {
        learned.zipWithIndex
          .find { case ((a, b), _) => t.zip(t.tail).contains((a, b)) } match {
          case None => done = true
          case Some(((a, b), _)) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < t.length) {
              if (i + 1 < t.length && t(i) == a && t(i + 1) == b) { out += (a + b); i += 2 }
              else { out += t(i); i += 1 }
            }
            t = out.result()
        }
      }
      t.length
    }
    val counts = words.flatMap(_._2).distinct.map(w => w -> applyLearned(w).toLong).toMap
    val expect = words.map { case (d, ws) =>
      val nChars = ws.map(_.length.toLong).sum
      val nToks = ws.map(counts).sum
      (d, ws.length.toLong, nChars, nToks,
        if (nChars == 0) 0L else nToks * 1000000L / nChars)
    }.sortBy(_._1)
    assert(got == expect)
    // bridge sanity: a trained table compresses (strictly fewer
    // tokens than characters, at least as many as words)
    assert(got.map(_._4).sum < got.map(_._3).sum)
    assert(got.map(_._4).sum >= got.map(_._2).sum)
  }

  // ------------------------------------------------- sim_index_merge
  test("sim_index_merge: recall rows equal a plain-Scala re-derivation of both grids") {
    val K = 5; val NQ = 20L; val NProbe = 2; val BatchMod = 5L
    val got = run("sim_index_merge").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getLong(6), r.getLong(7)))
      .toSeq.sortBy(t => (t._1, t._2))

    val vecs: Seq[(Long, Array[Double])] =
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def rcos(a: Array[Double], b: Array[Double]): Double =
      java.math.BigDecimal.valueOf(dot(a, b) / math.sqrt(dot(a, a) * dot(b, b)))
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

    /** One grid: seeds from `train` (vec_id % stride == 0), one Lloyd
      * ppm-mean refinement over `train`, centroids returned (cid,
      * centv) — Similarity.refinedCentroids re-expressed over arrays.
      */
    def grid(train: Seq[(Long, Array[Double])]): Seq[(Long, Array[Double])] = {
      val stride = math.ceil(math.sqrt(train.size.toDouble)).toLong
      val seeds = train.filter(_._1 % stride == 0L)
      val assign0 = train.map { case (id, v) =>
        val best = seeds.map { case (cid, cv) => (cid, rcos(v, cv)) }
          .minBy { case (cid, s2) => (-s2, cid) }._1
        (best, v)
      }
      assign0.groupBy(_._1).toSeq.map { case (cell, members) =>
        val n = members.size
        val comp = (0 until members.head._2.length).map { d =>
          val sPpm = members.map(m => math.floor(m._2(d) * 1e6).toLong).sum
          sPpm.toDouble / 1e6 / n
        }.toArray
        (cell, comp)
      }
    }
    def gradeOn(cent: Seq[(Long, Array[Double])], method: String) = {
      val corpus = vecs.map { case (id, v) =>
        val cell = cent.map { case (cid, cv) => (cid, rcos(v, cv)) }
          .minBy { case (cid, s2) => (-s2, cid) }._1
        (id, v, cell)
      }
      val cellsOf = corpus.groupBy(_._3)
      val nCells = cellsOf.size.toLong
      val maxCellN = cellsOf.values.map(_.size).max.toLong
      val exact = vecs.filter(_._1 < NQ).map { case (q, qv) =>
        q -> vecs.filter(_._1 != q)
          .map { case (c, cv) => (c, rcos(qv, cv)) }
          .sortBy { case (c, s2) => (-s2, c) }.take(K)
      }.toMap
      val rows = vecs.filter(_._1 < NQ).sortBy(_._1).map { case (q, qv) =>
        val probed = cent.map { case (cid, cv) => (cid, rcos(qv, cv)) }
          .sortBy { case (cid, s2) => (-s2, cid) }.take(NProbe).map(_._1).toSet
        val ann = probed.toSeq.flatMap(c => cellsOf.getOrElse(c, Seq.empty))
          .filter(_._1 != q)
          .map { case (c, cv, _) => (c, rcos(qv, cv)) }
          .sortBy { case (c, s2) => (-s2, c) }.take(K).map(_._1).toSet
        val hits = exact(q).count { case (c, _) => ann.contains(c) }.toLong
        (method, q, K.toLong, hits, hits * 1000000L / K,
          exact(q).map(_._2).min, nCells, maxCellN)
      }
      rows
    }
    val standing = vecs.filter(_._1 % BatchMod != BatchMod - 1)
    val expect = (gradeOn(grid(standing), "merged") ++ gradeOn(grid(vecs), "rebuilt"))
      .sortBy(t => (t._1, t._2))
    assert(got == expect, s"got:\n${got.mkString("\n")}\nwant:\n${expect.mkString("\n")}")
    // the audit is non-vacuous: both indexes answer every query, and
    // the merged grid is the standing grid (fewer training points →
    // its cell count can only be ≤ the rebuilt grid's + batch drift)
    assert(got.count(_._1 == "merged") == NQ && got.count(_._1 == "rebuilt") == NQ)
    // at nprobe=2 a single query can legitimately miss all K true
    // neighbors; the non-vacuity bar is per-INDEX: each index must
    // recover true neighbors across the sample
    Seq("merged", "rebuilt").foreach { m =>
      assert(got.filter(_._1 == m).map(_._4).sum > 0L, s"$m index recovered nothing")
    }
  }
}
