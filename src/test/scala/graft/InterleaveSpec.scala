package graft

import org.scalatest.funsuite.AnyFunSuite

/** Stride-scheduling guarantees of exp_interleave: the output is a
  * permutation of the corpus, and EVERY prefix of the global order
  * holds each source in proportion to its corpus share — the whole
  * point of interleaving a training order.
  */
class InterleaveSpec extends AnyFunSuite with SparkSuite {

  test("exp_interleave: permutation + proportional-prefix bound") {
    val rows = Registry.byName("exp_interleave").run(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("src_rank"), r.getAs[Long]("n_src"), r.getAs[Long]("vpos")))
    val n = rows.length.toLong
    val corpus = Tables.load(spark, sfDir, "documents")
    assert(n == corpus.count())
    assert(rows.map(_._1).distinct.length.toLong == n, "not a permutation")

    val share = rows.groupBy(_._2).map { case (src, xs) => src -> xs.length.toLong }
    // vpos formula + within-source ranks are dense 1..n_src
    for ((_, src, r, ns, vpos) <- rows) {
      assert(ns == share(src))
      assert(vpos == (2 * r - 1) * n / (2 * ns))
      assert(vpos >= 0 && vpos < n)
    }
    for ((src, xs) <- rows.groupBy(_._2))
      assert(xs.map(_._3).sorted.toSeq == (1L to share(src)).toSeq, s"ranks not dense for $src")

    // proportional prefixes: for every prefix length L (output order),
    // each source appears L·n_s/N ± (|sources| + 1) times. Stride
    // scheduling puts source s's r-th doc at vpos ≈ (r − ½)·N/n_s, so
    // the deviation per source is O(1); the extra |sources| slack
    // covers tie-breaking at equal vpos.
    val srcSeq = rows.map(_._2) // already in output order
    val slack = share.size + 1
    for (l <- Seq(10, 25, n.toInt / 2, n.toInt)) {
      val prefix = srcSeq.take(l)
      for ((src, ns) <- share) {
        val got = prefix.count(_ == src).toLong
        val exp = l.toLong * ns / n
        assert(math.abs(got - exp) <= slack,
          s"prefix $l source $src: got $got expected ~$exp (±$slack)")
      }
    }
  }
}
