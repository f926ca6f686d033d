package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 additions, re-derived by a brute driver-side
  * implementation sharing no engine with the op (plain Scala arrays
  * vs the op's Spark plans; the DuckDB oracle is the third
  * derivation):
  *  - sim_index_drift: the cumulative-merge drift curve vs a full
  *    plain-Scala re-derivation — slice-0 grid trained once, then
  *    each step's corpus assigned to the FROZEN centroids (merged)
  *    and to a per-step re-trained grid (rebuilt), aggregate
  *    recall@5 per (step, method).
  *
  * The brute grids assign FLAT (rank all centroids): at the test SF
  * the op's two-level routing satisfies coarseProbes >= #live coarse
  * cells, where two-level == flat exactly (the TwoLevelAssignProps
  * flat-equivalence property) — so flat is the correct model here,
  * and any routing bug that breaks the equivalence fails this test.
  */
class R13OpsSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("sim_index_drift: drift curve equals a plain-Scala cumulative re-derivation") {
    val K = 5; val NQ = 20L; val NProbe = 2; val Mod = 4L; val Steps = 3
    val got = run("sim_index_drift").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
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

    def grid(train: Seq[(Long, Array[Double])]): Seq[(Long, Array[Double])] = {
      val stride = math.ceil(math.sqrt(train.size.toDouble)).toLong
      val seeds = train.filter(_._1 % stride == 0L)
      val assign0 = train.map { case (_, v) =>
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

    def stepRow(t: Int, cent: Seq[(Long, Array[Double])], method: String) = {
      val ct = vecs.filter(_._1 % Mod <= t)
      val corpus = ct.map { case (id, v) =>
        val cell = cent.map { case (cid, cv) => (cid, rcos(v, cv)) }
          .minBy { case (cid, s2) => (-s2, cid) }._1
        (id, v, cell)
      }
      val cellsOf = corpus.groupBy(_._3)
      val nCells = cellsOf.size.toLong
      val maxCellN = cellsOf.values.map(_.size).max.toLong
      val queries = ct.filter(_._1 < NQ)
      var nExact = 0L; var nHits = 0L
      queries.foreach { case (q, qv) =>
        val exact = ct.filter(_._1 != q)
          .map { case (c, cv) => (c, rcos(qv, cv)) }
          .sortBy { case (c, s2) => (-s2, c) }.take(K).map(_._1)
        val probed = cent.map { case (cid, cv) => (cid, rcos(qv, cv)) }
          .sortBy { case (cid, s2) => (-s2, cid) }.take(NProbe).map(_._1).toSet
        val ann = probed.toSeq.flatMap(c => cellsOf.getOrElse(c, Seq.empty))
          .filter(_._1 != q)
          .map { case (c, cv, _) => (c, rcos(qv, cv)) }
          .sortBy { case (c, s2) => (-s2, c) }.take(K).map(_._1).toSet
        nExact += exact.size
        nHits += exact.count(ann.contains)
      }
      (t.toLong, method, queries.size.toLong, nExact, nHits,
        nHits * 1000000L / nExact, nCells, maxCellN)
    }

    val cent0 = grid(vecs.filter(_._1 % Mod == 0L))
    val expect = (1 to Steps).flatMap { t =>
      Seq(stepRow(t, cent0, "merged"),
        stepRow(t, grid(vecs.filter(_._1 % Mod <= t)), "rebuilt"))
    }.sortBy(r => (r._1, r._2))
    assert(got == expect, s"got:\n${got.mkString("\n")}\nwant:\n${expect.mkString("\n")}")

    // curve shape invariants: the merged grid's CELL SET is frozen
    // (n_cells constant across steps) while its hottest cell can only
    // grow as batches pile in — the structural drift signal
    val merged = got.filter(_._2 == "merged").sortBy(_._1)
    assert(merged.map(_._7).distinct.size == 1, "merged n_cells must be frozen")
    assert(merged.map(_._8) == merged.map(_._8).sorted, "merged max_cell_n must not shrink")
    // both indexes recover something across the sample at every step
    got.groupBy(_._1).foreach { case (t, rows) =>
      rows.foreach(r => assert(r._5 > 0L, s"step $t ${r._2} recovered nothing"))
    }
  }

  test("etl_scd6: hybrid rows equal a brute per-key re-derivation") {
    val got = run("etl_scd6").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getString(4), r.getLong(5), r.getLong(6)))
      .toSeq.sortBy(t => (t._1, t._2))
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val expect = cust.flatMap { case (k, seg) =>
      val versions =
        if (k % 7 == 0) Seq((1L, seg), (2L, s"SEG_${k % 3}")) else Seq((1L, seg))
      val (_, curr) = versions.last
      val n = versions.size.toLong
      versions.zipWithIndex.map { case ((v, s0), i) =>
        val prev = if (i == 0) "(none)" else versions(i - 1)._2
        (k, v, s0, curr, prev, if (v == n) 1L else 0L, n)
      }
    }.sortBy(t => (t._1, t._2))
    assert(got == expect)
    // type-1 invariant: every historical row carries the SAME current
    // value as the key's latest version
    got.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._4).distinct.size == 1)
    }
  }

  test("sim_hnsw_descent: sims exact, ranks dense, and the descent beats the fixed entry") {
    val K = 5
    val got = run("sim_hnsw_descent").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    def rcos(a: Array[Double], b: Array[Double]): Double =
      java.math.BigDecimal.valueOf(dot(a, b) / math.sqrt(dot(a, a) * dot(b, b)))
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    // every emitted sim is the exact rounded cosine; no self-results
    got.foreach { case (q, _, _, nb, sim) =>
      assert(nb != q)
      assert(sim == rcos(vecs(q), vecs(nb)), s"query $q neighbor $nb")
    }
    // ranks dense 1..k per query, ordered by (sim DESC, neighbor)
    got.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3) == (1 to sorted.size), "ranks must be dense")
      assert(sorted.size <= K)
      assert(sorted.map(r => (-r._5, r._4)) == sorted.map(r => (-r._5, r._4)).sorted)
    }
    // the pinned structural claim is SCALE-dependent (at sf0.001 the
    // fixed smallest-id entry's 3-hop ball covers much of the 200-
    // vector corpus and can beat the descent), so measure it where
    // it's pinned: at sf0.1 the descended entry must recall at least
    // as much brute truth as the fixed entry at the identical walk
    // budget. The margin is data-dependent (measured 5x on the
    // checked-in sf0.1 capture: 5 vs 1 hits), so the strict-win part
    // only binds on THAT dataset; a regenerated corpus still must not
    // lose to the fixed entry (>=), and the test skips cleanly when
    // the directory is absent (r13 ADVICE).
    val big = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$big/embeddings.parquet").exists,
      s"$big not present; descent-vs-fixed comparison skipped")
    def hits(name: String): Int = {
      val brute = Registry.byName("sim_knn_brute").run(spark, big).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      Registry.byName(name).run(spark, big).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
        .count(brute.contains)
    }
    val (descent, fixed) = (hits("sim_hnsw_descent"), hits("sim_knn_beam"))
    assert(descent >= fixed,
      s"descent ($descent) must never recall less than the fixed entry ($fixed)")
    // recorded margin on the checked-in sf0.1 capture: 5 vs 1 at
    // (B=8, H=3) — pin the STRICT win there, so a regression that
    // collapses the descended entry to exactly tie the fixed entry
    // fails (ADVICE r14; the >= above stays the floor for regenerated
    // corpora, where only the non-loss property is structural).
    // Environments without sf0.1 skip at the assume() above and keep
    // only the exactness/density checks — documented reduced coverage.
    assert(descent > fixed,
      s"checked-in-corpus strict win lost: descent $descent vs fixed $fixed " +
        "(recorded 5 vs 1; regenerate-corpus note in the comment above)")
  }

  test("stream_two_phase_agg: chained roll-up reconciles with event totals") {
    val got = run("stream_two_phase_agg").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    val ev = Tables.events(spark, sfDir)
      .selectExpr("ts DIV 1000000000 AS es", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    // the hourly roll-up must conserve the event count exactly
    assert(got.map(_._3).sum == ev.size.toLong)
    // a 1-hour window holds at most four 15-minute sub-windows
    assert(got.forall(r => r._4 >= 1L && r._4 <= 4L))
    // per-hour counts equal a direct (unchained) hourly re-derivation
    val direct = ev.groupBy { case (es, et, _) => (es - es % 3600, et) }
      .map { case (k, rows) => (k._1, k._2, rows.size.toLong) }
    got.foreach { case (h, et, n, _, _) =>
      assert(direct.exists(d => d._1 == h && d._2 == et && d._3 == n),
        s"hour $h $et count $n diverges from the direct aggregate")
    }
  }
}
