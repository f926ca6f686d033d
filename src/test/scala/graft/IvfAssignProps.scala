package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property net for the shared IVF assignment kernel
  * (ops/Similarity.assignTo) backing sim_ivf, sim_ivf_twolevel,
  * sim_ivf_pq and the cell-bounded embedding dedup: for seeded
  * random vectors and adversarial centroid sets the kernel's
  * top-`probes` cells must equal a brute argmax under the exact
  * ranking contract — rounded-HALF_UP-4 cosine DESC, then cid ASC.
  * The corpus never produces exact cosine ties or probes > k; this
  * pins both (duplicate centroids with different cids must resolve
  * to the LOWER cid, and over-probing must cap at k cells, not
  * fabricate rows). The brute re-derivation mirrors the kernel's FP
  * order bit-for-bit: left-to-right dot accumulation (ArrayDot's
  * documented fold order) and java BigDecimal.valueOf HALF_UP
  * rounding (Round's implementation).
  */
class IvfAssignProps extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(4242)
  private val Dim = 6

  private def vec(): Seq[Double] = {
    val v = Seq.fill(Dim)((rnd.nextInt(2001) - 1000) / 1000.0)
    if (v.forall(_ == 0.0)) vec() else v // zero vectors are out of contract
  }

  private val corpus: Seq[(Long, Seq[Double])] =
    (0L until 40L).map(i => i -> vec())

  // adversarial centroid set: cids 0..6 — 0..2 random, 3 and 4 are
  // IDENTICAL vectors (exact cosine tie → cid tiebreak), 5 equals
  // corpus vector 0 (cosine exactly 1.0 there), 6 random.
  private val centroids: Seq[(Long, Seq[Double])] = {
    val dup = vec()
    Seq(0L -> vec(), 1L -> vec(), 2L -> vec(),
      3L -> dup, 4L -> dup, 5L -> corpus.head._2, 6L -> vec())
  }

  private def dot(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }

  /** Spark Round's arithmetic, literally: valueOf → setScale HALF_UP. */
  private def roundedCos(a: Seq[Double], b: Seq[Double]): Double =
    java.math.BigDecimal.valueOf(dot(a, b) / math.sqrt(dot(a, a) * dot(b, b)))
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  private def bruteCells(v: Seq[Double], probes: Int): Seq[Long] =
    centroids.map { case (cid, cv) => (cid, roundedCos(v, cv)) }
      .sortBy { case (cid, sim) => (-sim, cid) }
      .take(probes).map(_._1)

  private def kernelCells(probes: Int): Map[Long, Set[Long]] = {
    val df = corpus.toDF("vec_id", "v")
      .withColumn("nrm", expr("graft_array_dot(v, v)"))
    val cent = centroids.toDF("cid", "centv")
      .withColumn("centn", expr("graft_array_dot(centv, centv)"))
    Similarity.assignTo(df, cent, "vec_id", probes)
      .select("vec_id", "cell").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  for (probes <- Seq(1, 2, 7, 10)) {
    test(s"assignTo probes=$probes equals brute rounded-cosine/cid top-$probes") {
      val got = kernelCells(probes)
      assert(got.keySet == corpus.map(_._1).toSet, "every vector assigned")
      corpus.foreach { case (id, v) =>
        val want = bruteCells(v, probes)
        assert(got(id) == want.toSet, s"vec $id: got ${got(id)} want $want")
        assert(got(id).size == math.min(probes, centroids.size),
          s"vec $id must land in exactly min(probes, k) cells")
      }
    }
  }

  test("exact-tie centroids (identical vectors) resolve to the lower cid at probes=1") {
    // any vector whose nearest centroid is the duplicated one must
    // pick cid 3, never 4 — the cid tiebreak is what keeps the
    // assignment deterministic across engines and shuffles
    val got = kernelCells(1)
    val affected = corpus.filter { case (_, v) => bruteCells(v, 1).head == 3L }
    assert(affected.nonEmpty, "seed must produce at least one duplicate-centroid winner")
    affected.foreach { case (id, _) => assert(got(id) == Set(3L), s"vec $id") }
    assert(corpus.forall { case (id, _) => got(id) != Set(4L) })
  }

  test("a vector identical to a centroid assigns to it with cosine 1.0") {
    val got = kernelCells(1)
    assert(roundedCos(corpus.head._2, centroids(5)._2) == 1.0)
    assert(got(0L) == Set(bruteCells(corpus.head._2, 1).head))
  }
}
