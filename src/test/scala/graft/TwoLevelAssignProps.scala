package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property net for the two-level assignment kernel
  * (ops/Similarity.assignTwoLevel) backing the staged IVF grid after
  * the r12 sf10 probe caught the flat assignment's N·k quadratic:
  * for seeded random vectors, fine-centroid and coarse-seed sets,
  * the kernel's output must equal a brute plain-Scala two-level
  * re-derivation under the exact ranking contract — route to the
  * `coarseProbes` nearest coarse seeds (rounded-HALF_UP-4 cosine
  * DESC, ccid ASC), collect THOSE cells' fine centroids (each fine
  * centroid pre-routed to its single nearest coarse seed), rank them
  * (rounded cosine DESC, cid ASC), keep `probes`. Also pins the
  * flat-equivalence property the gated corpora rely on: when
  * coarseProbes ≥ #coarse cells, two-level ≡ flat assignTo.
  */
class TwoLevelAssignProps extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(1212)
  private val Dim = 6

  private def vec(): Seq[Double] = {
    val v = Seq.fill(Dim)((rnd.nextInt(2001) - 1000) / 1000.0)
    if (v.forall(_ == 0.0)) vec() else v
  }

  private def dot(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }

  private def roundedCos(a: Seq[Double], b: Seq[Double]): Double =
    java.math.BigDecimal.valueOf(dot(a, b) / math.sqrt(dot(a, a) * dot(b, b)))
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  private val corpus: Seq[(Long, Seq[Double])] = (0L until 60L).map(i => i -> vec())
  private val fines: Seq[(Long, Seq[Double])] = (0L until 12L).map(i => i -> vec())
  private val coarses: Seq[(Long, Seq[Double])] = (0L until 4L).map(i => i * 100L -> vec())

  /** brute two-level: (vector, coarseProbes, probes) → ranked cells.
    * Routing ranks LIVE coarse cells only (cells holding ≥ 1 fine
    * centroid under the top-1 f2c map) — the r13 coverage contract:
    * a dead coarse cell never consumes a probe slot, so every vector
    * always reaches ≥ 1 fine candidate.
    */
  private def brute(v: Seq[Double], cp: Int, probes: Int): Seq[Long] = {
    val f2c = fines.map { case (fid, fv) =>
      fid -> coarses.map { case (cc, cv) => (cc, roundedCos(fv, cv)) }
        .minBy { case (cc, s) => (-s, cc) }._1
    }.toMap
    val live = f2c.values.toSet
    val routed = coarses.filter { case (cc, _) => live.contains(cc) }
      .map { case (cc, cv) => (cc, roundedCos(v, cv)) }
      .sortBy { case (cc, s) => (-s, cc) }.take(cp).map(_._1).toSet
    fines.filter { case (fid, _) => routed.contains(f2c(fid)) }
      .map { case (fid, fv) => (fid, roundedCos(v, fv)) }
      .sortBy { case (fid, s) => (-s, fid) }.take(probes).map(_._1)
  }

  private def kernel(cp: Int, probes: Int): Map[Long, Seq[(Long, Int)]] = {
    val df = corpus.toDF("vec_id", "v").withColumn("nrm", expr("graft_array_dot(v, v)"))
    val cent = fines.toDF("cid", "centv").withColumn("centn", expr("graft_array_dot(centv, centv)"))
    val coarse = coarses.toDF("ccid", "cv0").withColumn("cn0", expr("graft_array_dot(cv0, cv0)"))
    Similarity.assignTwoLevel(df, cent, coarse, "vec_id", cp, probes, keepRank = true)
      .select("vec_id", "cell", "crank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(t => (t._2, t._3)).toSeq).toMap
  }

  for ((cp, probes) <- Seq((1, 1), (2, 3), (3, 8), (4, 8))) {
    test(s"assignTwoLevel cp=$cp probes=$probes equals brute two-level routing") {
      val got = kernel(cp, probes)
      corpus.foreach { case (id, v) =>
        val want = brute(v, cp, probes)
        val gotCells = got.getOrElse(id, Seq.empty).map(_._1)
        assert(gotCells == want, s"vec $id: got $gotCells want $want")
        // crank is dense 1..n in ranked order
        assert(got.getOrElse(id, Seq.empty).map(_._2) == (1 to gotCells.size))
      }
    }
  }

  test("coverage: every input id is assigned even when coarse cells are empty") {
    // deterministic dead cell: coarse = {+e1, -e1}; every fine
    // centroid has first coord >= 0.5 so all route to +e1 and the
    // -e1 cell is EMPTY; corpus vectors with first coord <= -0.5
    // have -e1 as their nearest coarse cell.
    val cs = Seq(0L -> (1.0 +: Seq.fill(Dim - 1)(0.0)),
      1L -> (-1.0 +: Seq.fill(Dim - 1)(0.0)))
    val fs = (0L until 8L).map(i => i -> (0.5 +: vec().tail))
    val vs = (0L until 40L).map { i =>
      val base = vec().tail
      i -> ((if (i % 2 == 0) -0.7 else 0.7) +: base)
    }
    val df = vs.toDF("vec_id", "v").withColumn("nrm", expr("graft_array_dot(v, v)"))
    val cent = fs.toDF("cid", "centv").withColumn("centn", expr("graft_array_dot(centv, centv)"))
    val coarse = cs.toDF("ccid", "cv0").withColumn("cn0", expr("graft_array_dot(cv0, cv0)"))
    // cp = 1: pre-r13 a vector whose nearest coarse cell was dead got
    // ZERO cells and vanished from the grid (the r12 ADVICE drop case)
    val assigned = Similarity.assignTwoLevel(df, cent, coarse, "vec_id", 1, 1)
      .select("vec_id").as[Long].collect().toSet
    assert(assigned == vs.map(_._1).toSet,
      s"dropped ids: ${vs.map(_._1).toSet -- assigned}")
  }

  test("coarseProbes >= #coarse cells makes two-level identical to flat assignTo") {
    val df = corpus.toDF("vec_id", "v").withColumn("nrm", expr("graft_array_dot(v, v)"))
    val cent = fines.toDF("cid", "centv").withColumn("centn", expr("graft_array_dot(centv, centv)"))
    val coarse = coarses.toDF("ccid", "cv0").withColumn("cn0", expr("graft_array_dot(cv0, cv0)"))
    val twoLevel = Similarity.assignTwoLevel(df, cent, coarse, "vec_id", coarses.size, 5,
        keepRank = true)
      .select("vec_id", "cell", "crank").as[(Long, Long, Int)].collect().toSet
    val flat = Similarity.assignTo(df, cent, "vec_id", 5, keepRank = true)
      .select("vec_id", "cell", "crank").as[(Long, Long, Int)].collect().toSet
    assert(twoLevel == flat,
      "full-coverage two-level must reproduce the flat assignment exactly " +
        "(this is what keeps the gated corpora's grid bit-identical: k' <= 5 there)")
  }
}
