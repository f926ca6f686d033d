package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for graph_triangles and emb_quantize beyond
  * the oracle hash: the oriented-wedge triangle count must equal a
  * driver-side brute force over the very same gated kNN edge set,
  * and the int8 reconstruction error must respect the affine
  * quantization bound range/255 (+1 ppm for the two truncating
  * divisions).
  */
class TriangleQuantizeSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("graph_triangles equals a brute-force count over the gated kNN edges") {
    // ground truth from the op's own input relation (the staged kNN
    // graph IS what sim_knn_graph publishes), symmetrized identically
    val edges = run("sim_knn_graph")
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) => Seq(math.min(a, b) -> math.max(a, b)) }
      .distinct
    val nbrs = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (v, es) => v -> es.map(_._2).toSet }
    val expTri = nbrs.map { case (v, nv) =>
      val s = nv.toSeq.sorted
      v -> s.indices.map { i =>
        s.drop(i + 1).count(w => nbrs(s(i)).contains(w)).toLong
      }.sum
    }

    val got = run("graph_triangles").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        (r.getAs[Long]("degree"), r.getAs[Long]("n_tri"), r.getAs[Long]("cc_ppm"))))
      .toMap
    assert(got.keySet == nbrs.keySet)
    for ((v, (deg, tri, cc)) <- got) {
      assert(deg == nbrs(v).size, s"degree mismatch at $v")
      assert(tri == expTri(v), s"triangle count mismatch at $v: got $tri want ${expTri(v)}")
      val expCc = if (deg >= 2) 2L * 1000000L * tri / (deg * (deg - 1)) else 0L
      assert(cc == expCc, s"cc_ppm mismatch at $v")
      assert(cc >= 0 && cc <= 1000000)
      assert(tri <= deg * (deg - 1) / 2)
    }
    // the symmetrized kNN graph always has triangles on clustered
    // corpora; a zero total would mean the wedge join went dark
    assert(expTri.values.sum > 0)
  }

  test("emb_quantize: int8 affine bound holds and errors are consistent") {
    val out = run("emb_quantize").cache()
    val nCells = Tables.load(spark, sfDir, "embeddings")
      .select(posexplode(col("embedding"))).count()
    val dims = out.count()
    assert(dims > 0 && nCells == dims * out.head.getAs[Long]("n"))
    for (r <- out.collect()) {
      val range = r.getAs[Long]("max_ppm") - r.getAs[Long]("min_ppm")
      val maxErr = r.getAs[Long]("max_err_ppm")
      val meanErr = r.getAs[Long]("mean_err_ppm")
      // code = ((v-min)*255) DIV range, recon = min + (code*range) DIV 255:
      // each truncating DIV contributes < range/255 resp. < 1 ppm
      assert(maxErr <= range / 255 + 1, s"dim ${r.getAs[Int]("dim")}: err $maxErr > bound ${range / 255 + 1}")
      assert(meanErr <= maxErr)
      assert(meanErr * r.getAs[Long]("n") <= r.getAs[Long]("sum_err_ppm"))
      if (range == 0) assert(maxErr == 0)
    }
  }
}
