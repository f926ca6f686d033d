package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants for the round-6 audit operators:
  * sim_recall_eval (the evaluation harness must agree with a direct
  * join of its two gated inputs), graph_link_predict (predictions are
  * non-edges with brute-verifiable co-citation counts), and
  * txt_source_divergence (TVD recomputed driver-side from raw token
  * counts with the exact ppm algebra).
  */
class AuditOpsSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("sim_recall_eval agrees with a direct overlap of brute and multiprobe top-k") {
    val exact = run("sim_knn_brute").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ann = run("sim_knn_multiprobe").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val got = run("sim_recall_eval").collect()
      .filter(_.getAs[String]("method") == "multiprobe")
    assert(got.nonEmpty)
    for (r <- got) {
      val q = r.getAs[Long]("query_id")
      val k = r.getAs[Long]("k")
      val hits = r.getAs[Long]("n_hits")
      assert(k == exact.count(_._1 == q))
      assert(hits == exact.count { case (qq, nn) => qq == q && ann((qq, nn)) })
      assert(r.getAs[Long]("recall_ppm") == hits * 1000000L / k)
      assert(hits >= 0 && hits <= k)
    }
    // scale-free quality floor (an absolute recall threshold would be
    // a statement about corpus size — at sf0.001 the 256-bucket index
    // holds ~100 vectors, so buckets are near-empty and recall is
    // legitimately low): multiprobe must dominate single-bucket LSH,
    // and must find something
    val lsh = run("sim_knn_lsh").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val total = got.map(_.getAs[Long]("n_hits")).sum
    val lshHits = exact.count(lsh).toLong
    assert(total >= lshHits, s"multiprobe hits $total < single-bucket hits $lshHits")
    assert(total > 0)
  }

  test("sim_knn_beam: k ranked per query, walk-reachable, recall row agrees with direct overlap") {
    val beam = run("sim_knn_beam").collect()
    assert(beam.nonEmpty)
    // exactly K ranked rows per query, never the query itself, sims in range
    val perQuery = beam.groupBy(_.getAs[Long]("query_id"))
    for ((q, rows) <- perQuery) {
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rows.length),
        s"ranks not contiguous for query $q")
      assert(rows.forall(_.getAs[Long]("neighbor_id") != q))
      // ranked by (sim desc, id)
      val keys = rows.sortBy(_.getAs[Int]("rank"))
        .map(r => (-r.getAs[Double]("sim"), r.getAs[Long]("neighbor_id"))).toSeq
      assert(keys == keys.sorted, s"beam ranking broken for query $q")
    }
    // the gated recall row must equal a direct overlap recompute
    val exact = run("sim_knn_brute").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val beamSet = beam.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val rec = run("sim_recall_eval").collect()
      .filter(_.getAs[String]("method") == "beam")
    assert(rec.nonEmpty)
    for (r <- rec) {
      val q = r.getAs[Long]("query_id")
      val hits = exact.count { case (qq, nn) => qq == q && beamSet((qq, nn)) }
      assert(r.getAs[Long]("n_hits") == hits, s"beam recall row drift at query $q")
      assert(r.getAs[Long]("recall_ppm") == hits * 1000000L / r.getAs[Long]("k"))
    }
    // the walk must do better than its own entry seed alone: some
    // true neighbor is found somewhere (scale-free floor, same
    // convention as the multiprobe test above)
    assert(rec.map(_.getAs[Long]("n_hits")).sum > 0)
  }

  test("graph_link_predict: non-edges only, brute co-citation counts, jaccard algebra") {
    val edges = run("sim_knn_graph").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id")))
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val inNbrs = edges.groupBy(_._2).map { case (v, es) => v -> es.map(_._1).toSet }
    // brute co-citation: count common in-neighbors for every candidate pair
    val expCommon = edges.groupBy(_._1).values.flatMap { out =>
      val ds = out.map(_._2).sorted
      for (i <- ds.indices; j <- i + 1 until ds.length) yield (ds(i), ds(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }

    val got = run("graph_link_predict").collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val a = r.getAs[Long]("a"); val b = r.getAs[Long]("b")
      val common = r.getAs[Long]("n_common")
      assert(!und((a, b)), s"predicted pair ($a,$b) is an existing edge")
      assert(common == expCommon((a, b)), s"co-citation count at ($a,$b)")
      val ina = r.getAs[Long]("ina"); val inb = r.getAs[Long]("inb")
      assert(ina == inNbrs(a).size && inb == inNbrs(b).size)
      assert(r.getAs[Long]("jaccard_ppm") == common * 1000000L / (ina + inb - common))
      // a common in-neighbor exists by construction
      assert((inNbrs(a) & inNbrs(b)).size >= common)
    }
    // ranking is by (n_common desc, jaccard desc, a, b)
    val keys = got.map(r => (-r.getAs[Long]("n_common"), -r.getAs[Long]("jaccard_ppm"),
      r.getAs[Long]("a"), r.getAs[Long]("b"))).toSeq
    assert(keys == keys.sorted)
  }

  test("txt_source_divergence: TVD recomputed driver-side with the exact ppm algebra") {
    val toks = Tables.load(spark, sfDir, "documents")
      .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("term"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val corpusCnt = toks.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
    val top = corpusCnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(200).map(_._1).toSet
    def bucket(t: String) = if (top(t)) t else "other"
    val srcBucket = toks.groupBy { case (s0, t) => (s0, bucket(t)) }
      .map { case (k, xs) => k -> xs.size.toLong }
    val corpBucket = srcBucket.groupBy(_._1._2).map { case (b, xs) => b -> xs.values.sum }
    val corpTot = corpBucket.values.sum
    val srcTot = srcBucket.groupBy(_._1._1).map { case (s0, xs) => s0 -> xs.values.sum }

    val exp = srcTot.map { case (s0, tot) =>
      val absSum = corpBucket.map { case (b, cn) =>
        val p = srcBucket.getOrElse((s0, b), 0L) * 1000000L / tot
        val q = cn * 1000000L / corpTot
        math.abs(p - q)
      }.sum
      s0 -> (tot, absSum / 2)
    }

    val got = run("txt_source_divergence").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("tvd_ppm"))).toMap
    assert(got == exp)
    assert(got.values.forall { case (_, tvd) => tvd >= 0 && tvd <= 1000000L })
  }
}
