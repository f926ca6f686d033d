package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the SHARED pointer-jumping CC kernel
  * (ops/Cc.scala) now backing dedup_clusters, dedup_semantic's label
  * stage and graph_connected_components: for seeded random graphs —
  * and adversarial shapes the corpora never produce — the kernel's
  * min-label census must equal a brute union-find. Shapes covered:
  * sparse random (forests + small cycles), a LONG PATH (pointer
  * jumping's O(log d) claim is only exercised by high diameter — the
  * gate corpora top out at diameter ~5), a star (max fan-in), and
  * the empty edge set (the null-safe base case).
  */
class CcProps extends AnyFunSuite with SparkSuite {

  private def bruteComponents(vs: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(vs.map(v => v -> v): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    vs.map(v => v -> find(v)).toMap
  }

  private def kernelLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val e = edges.toDF("src", "dst")
    val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    graft.ops.Cc.minLabelComponents(sym, maxRounds = 20, opName = "cc-props")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("random sparse graphs: kernel census equals union-find") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 12) {
      val n = 4 + rnd.nextInt(40)
      val m = rnd.nextInt(n + n / 2)
      val edges = Seq.fill(m) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val brute = bruteComponents(vs, edges)
        assert(kernelLabels(edges) == brute, s"trial $trial: n=$n m=${edges.size}")
      }
    }
  }

  test("long path (diameter 63): pointer jumping converges within the log bound") {
    val edges = (0L until 63L).map(i => (i, i + 1))
    val labels = kernelLabels(edges)
    assert(labels.size == 64 && labels.values.forall(_ == 0L))
  }

  test("star graph: max fan-in resolves in one round of propagation") {
    val edges = (1L to 30L).map(i => (0L, i))
    val labels = kernelLabels(edges)
    assert(labels.size == 31 && labels.values.forall(_ == 0L))
  }

  test("empty edge set returns an empty labeling (null-safe base case)") {
    assert(kernelLabels(Seq.empty[(Long, Long)]) == Map.empty)
  }
}
