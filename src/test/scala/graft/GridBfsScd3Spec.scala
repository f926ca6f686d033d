package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side recomputations for the batch-3 round-6 ops:
  * geo_grid_density's convolution against a direct kernel sum,
  * graph_bfs against a textbook BFS, etl_scd3 against its own
  * construction rule.
  */
class GridBfsScd3Spec extends AnyFunSuite with SparkSuite {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("geo_grid_density equals a driver-side 3x3 binomial convolution") {
    val cells = Tables.load(spark, sfDir, "customer")
      .select(
        expr("CAST(conv(substr(md5(concat('lat', c_custkey)), 1, 8), 16, 10) AS BIGINT) % 10000000 DIV 1000000").as("cla"),
        expr("CAST(conv(substr(md5(concat('lon', c_custkey)), 1, 8), 16, 10) AS BIGINT) % 10000000 DIV 1000000").as("clo"))
      .groupBy("cla", "clo").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def w(di: Int, dj: Int) = Seq(di, dj).count(_ == 0) match {
      case 2 => 4L; case 1 => 2L; case _ => 1L
    }
    val exp = cells.map { case ((i, j), n) =>
      val sm = (for (di <- -1 to 1; dj <- -1 to 1)
        yield cells.getOrElse((i - di, j - dj), 0L) * w(di, dj)).sum
      (i, j) -> (n, sm, n * 16L * 1000000L / sm)
    }
    val got = run("geo_grid_density").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == exp)
    // kernel mass conservation over the full (unclipped) spread:
    // every point contributes weight 16 somewhere
    val totalMass = cells.map { case ((i, j), n) => n * 16L }.sum
    val spreadMass = cells.map { case (_, n) =>
      (for (di <- -1 to 1; dj <- -1 to 1) yield n * w(di, dj)).sum }.sum
    assert(totalMass == spreadMass)
  }

  test("graph_bfs equals a textbook BFS over the symmetrized kNN edges") {
    val edges = run("sim_knn_graph").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id")))
    val adj = (edges ++ edges.map(_.swap)).distinct.groupBy(_._1)
      .map { case (v, es) => v -> es.map(_._2).toSet }
    val seeds = adj.keySet.filter(_ < 5L)
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (k <- 1 to 3) {
      val next = frontier.flatMap(adj(_)).diff(dist.keySet)
      dist = dist ++ next.map(_ -> k.toLong)
      frontier = next
    }
    val got = run("graph_bfs").collect()
      .map(r => r.getAs[Long]("v") -> r.getAs[Long]("dist")).toMap
    assert(got == dist)
    assert(got.values.exists(_ == 3L), "BFS never reached hop 3 — rounds are vacuous")
  }

  test("etl_scd3 matches its change-stream construction per key") {
    val segs = Tables.load(spark, sfDir, "customer").collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[String]("c_mktsegment")).toMap
    val got = run("etl_scd3").collect()
    assert(got.length == segs.size)
    for (r <- got) {
      val k = r.getAs[Long]("key")
      if (k % 7 == 0) {
        assert(r.getAs[String]("curr_segment") == s"SEG_${k % 3}")
        assert(r.getAs[String]("prev_segment") == segs(k))
        assert(r.getAs[Long]("n_versions") == 2L)
      } else {
        assert(r.getAs[String]("curr_segment") == segs(k))
        assert(r.getAs[String]("prev_segment") == "(none)")
        assert(r.getAs[Long]("n_versions") == 1L)
      }
    }
  }
}
