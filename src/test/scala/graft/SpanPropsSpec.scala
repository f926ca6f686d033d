package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the dedup_spans island merge: for random
  * position sets, the one-window SQL merge must equal a brute
  * driver-side interval merge of the fixed-length-K windows. Seeded
  * (deterministic) random corpora — catches off-by-ones at the
  * overlap boundary (gap == K−1 vs K) that the fixed corpus may
  * never exercise.
  */
class SpanPropsSpec extends AnyFunSuite with SparkSuite {

  private def bruteMerge(ps: Seq[Long], k: Int): Seq[(Long, Long, Long)] = {
    // merge the fixed-length intervals [p, p+k-1] of sorted distinct
    // starts: p joins the current island iff it overlaps it
    // (p <= current end; ends are monotone since lengths are equal)
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    for (p <- ps.distinct.sorted) {
      if (out.nonEmpty && p <= out.last._2) {
        val (s, _, n) = out.last
        out(out.size - 1) = (s, p + k - 1, n + 1)
      } else out += ((p, p + k - 1, 1L))
    }
    out.toSeq
  }

  test("islandSpans equals brute interval merge on 25 random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 25) {
      val k = 2 + rnd.nextInt(7) // K in [2, 8]
      val docs = (0L until (1 + rnd.nextInt(4))).map { d =>
        d -> Seq.fill(1 + rnd.nextInt(30))(rnd.nextInt(60).toLong).distinct
      }
      val rows = docs.flatMap { case (d, ps) => ps.map(p => (d, p, 2L)) }
      val df = rows.toDF("doc_id", "pos", "occ")
      val got = graft.ops.Spans.islandSpans(df, k)
        .orderBy("doc_id", "start_tok")
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start_tok"),
          r.getAs[Long]("end_tok"), r.getAs[Long]("n_windows")))
      val want = docs.flatMap { case (d, ps) =>
        bruteMerge(ps, k).map { case (s, e, n) => (d, s, e, n) }
      }.sortBy(t => (t._1, t._2))
      assert(got.toSeq == want,
        s"trial $trial (k=$k): got ${got.toSeq}\nwant $want\npositions $docs")
    }
  }
}
