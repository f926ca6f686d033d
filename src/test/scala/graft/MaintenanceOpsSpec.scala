package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants for the round-7 maintenance / monitoring
  * operators: conservation laws and self-consistency checks that the
  * oracle hash alone can't distinguish from a lucky constant.
  */
class MaintenanceOpsSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("ev_markov_transitions: rows normalize and transitions conserve") {
    val rows = run("ev_markov_transitions").collect()
    assert(rows.nonEmpty)
    // row-stochastic up to truncation: sum of p_ppm per prev_type in
    // (10^6 - n_cur_types, 10^6]
    rows.groupBy(_.getAs[String]("prev_type")).foreach { case (_, rs) =>
      val s = rs.map(_.getAs[Long]("p_ppm")).sum
      assert(s <= 1000000L && s > 1000000L - rs.length,
        s"p_ppm row sum $s over ${rs.length} targets")
    }
    // conservation: total transitions = total events - users with >=1 event
    val ev = Tables.events(spark, sfDir)
    val total = ev.count()
    val users = ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == total - users)
  }

  test("ev_changepoint: deviations sum to zero and exactly one change-point") {
    val rows = run("ev_changepoint").collect()
    assert(rows.map(_.getAs[Long]("dev")).sum == 0L,
      "dev = cnt*D - T must telescope to zero over all days")
    assert(rows.last.getAs[Long]("cusum") == 0L)
    assert(rows.count(_.getAs[Int]("is_changepoint") == 1) == 1)
    // the flagged day holds the max |cusum|
    val flagged = rows.find(_.getAs[Int]("is_changepoint") == 1).get
    assert(math.abs(flagged.getAs[Long]("cusum")) ==
      rows.map(r => math.abs(r.getAs[Long]("cusum"))).max)
  }

  test("etl_entity_resolution: every dirty record resolves, self-distance = vowel count") {
    val part = Tables.load(spark, sfDir, "part")
    val nDirty = part.filter(col("p_partkey") % 10 === 0).count()
    val rows = run("etl_entity_resolution").collect()
    assert(rows.length == nDirty, "one best match per dirty record")
    val names = part.collect().map(r => r.getAs[Long]("p_partkey") -> r.getAs[String]("p_name")).toMap
    for (r <- rows) {
      assert(r.getAs[Long]("n_candidates") >= 1L)
      if (r.getAs[Int]("is_correct") == 1) {
        // corruption only rewrites a/e/o, so the edit distance back to
        // the true source is exactly its vowel-class count
        val orig = names(r.getAs[Long]("dirty_key"))
        assert(r.getAs[Int]("dist") == orig.count(c => c == 'a' || c == 'e' || c == 'o'))
      }
    }
  }

  test("etl_compaction: planned groups conserve bytes and bins are contiguous") {
    val rows = run("etl_compaction").collect()
    val totalBytes = rows.map(_.getAs[Long]("total_bytes")).sum
    assert(totalBytes == Tables.load(spark, sfDir, "lineitem").count() * 128L)
    rows.groupBy(_.getAs[Int]("ym")).foreach { case (ym, rs) =>
      val bins = rs.map(_.getAs[Long]("bin")).sorted.toSeq
      assert(bins == (0L until bins.length.toLong),
        s"ym $ym bins not contiguous from 0: $bins")
    }
  }

  test("etl_retention_policy: partitions conserve orders and verdicts follow age") {
    val rows = run("etl_retention_policy").collect()
    assert(rows.map(_.getAs[Long]("n_orders")).sum ==
      Tables.load(spark, sfDir, "orders").count())
    for (r <- rows) {
      val age = r.getAs[Int]("age_months")
      val expect = if (age <= 12) "KEEP" else if (age <= 36) "ARCHIVE" else "PURGE"
      assert(r.getAs[String]("verdict") == expect)
    }
    assert(rows.exists(_.getAs[Int]("age_months") == 0), "newest partition present")
  }

  test("txt_collocations: ranked list is dense, floored, and lift-verified") {
    val rows = run("txt_collocations").collect()
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
    assert(rows.forall(_.getAs[Long]("n_ab") >= 5L))
    assert(rows.forall(_.getAs[Long]("lift_ppm") > 0L))
    // spot-verify the top collocation's lift from its own evidence columns
    val docs = Tables.load(spark, sfDir, "documents")
      .select(split(trim(col("text")), "\\s+").as("toks"))
    val tUni = docs.select(explode(col("toks")).as("w")).count()
    val tBi = docs.select((size(col("toks")) - 1).as("nb"))
      .filter(col("nb") >= 1).agg(sum("nb")).head().getLong(0)
    val top = rows.head
    val expected = (BigInt(top.getAs[Long]("n_ab")) * BigInt(tUni) * BigInt(tUni) * 1000000) /
      (BigInt(tBi) * BigInt(top.getAs[Long]("n_a")) * BigInt(top.getAs[Long]("n_b")))
    assert(BigInt(top.getAs[Long]("lift_ppm")) == expected)
  }

  test("graph_kcore: survivors are a subset with non-increasing degrees") {
    val rows = run("graph_kcore").collect()
    assert(rows.nonEmpty)
    val core = rows.map(_.getAs[Long]("v")).toSet
    // recompute original degrees from the purchase graph definition
    val co = Tables.load(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.load(spark, sfDir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sp")).distinct()
    val deg0 = co.select((col("c") * 2).as("v")).union(co.select((col("sp") * 2 + 1).as("v")))
      .groupBy("v").agg(count(lit(1)).as("d")).collect()
      .map(r => r.getAs[Long]("v") -> r.getAs[Long]("d")).toMap
    for (r <- rows) {
      val v = r.getAs[Long]("v")
      assert(deg0.contains(v))
      assert(r.getAs[Long]("deg") <= deg0(v), "peeling can only shrink degree")
      assert((r.getAs[Int]("is_stable") == 1) == (r.getAs[Long]("deg") >= 4L))
    }
  }

  test("ev_inter_event_time: gap counts conserve and quantiles are ordered") {
    val rows = run("ev_inter_event_time").collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sfDir)
    for (r <- rows) {
      val t = r.getAs[String]("event_type")
      val nEvents = ev.filter(col("event_type") === t).count()
      val nUsers = ev.filter(col("event_type") === t).select("user_id").distinct().count()
      assert(r.getAs[Long]("n_gaps") == nEvents - nUsers,
        s"$t: each user's first event of the type has no gap")
      assert(r.getAs[Double]("p50_gap_s") <= r.getAs[Double]("p90_gap_s"))
      assert(r.getAs[Double]("p90_gap_s") <= r.getAs[Long]("max_gap_s").toDouble)
    }
  }

  test("txt_vocab_growth: curve telescopes to the exact corpus totals") {
    val rows = run("txt_vocab_growth").collect()
    val docs = Tables.load(spark, sfDir, "documents")
      .select(split(trim(col("text")), "\\s+").as("toks"))
    val vocab = docs.select(explode(col("toks")).as("w")).distinct().count()
    val tokens = docs.select(explode(col("toks")).as("w")).count()
    assert(rows.map(_.getAs[Long]("new_types")).sum == vocab)
    assert(rows.last.getAs[Long]("vocab_cum") == vocab)
    assert(rows.last.getAs[Long]("tokens_cum") == tokens)
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.load(spark, sfDir, "documents").count())
    // cumulative columns are the prefix sums of the per-decile columns
    assert(rows.map(_.getAs[Long]("vocab_cum")).toSeq ==
      rows.map(_.getAs[Long]("new_types")).scanLeft(0L)(_ + _).tail.toSeq)
  }

  test("q_market_basket: rules are floored and the top lift recomputes") {
    val rows = run("q_market_basket").collect()
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
    assert(rows.forall(_.getAs[Long]("n_ab") >= 3L))
    val items = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nOrders = items.select("l_orderkey").distinct().count()
    val top = rows.head
    val na = items.filter(col("l_partkey") === top.getAs[Long]("part_a")).count()
    val nb = items.filter(col("l_partkey") === top.getAs[Long]("part_b")).count()
    val expected = (BigInt(top.getAs[Long]("n_ab")) * nOrders * 1000000) / (BigInt(na) * nb)
    assert(BigInt(top.getAs[Long]("lift_ppm")) == expected)
    assert(top.getAs[Long]("support_ppm") == top.getAs[Long]("n_ab") * 1000000L / nOrders)
  }

  test("graph_degree_dist: buckets conserve vertices and mass within bit ranges") {
    val rows = run("graph_degree_dist").collect()
    val co = Tables.load(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.load(spark, sfDir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sp")).distinct()
    assert(rows.map(_.getAs[Long]("degree_mass")).sum == co.count() * 2,
      "sum of degrees = 2|E| on the symmetrized graph")
    val nVerts = co.select("c").distinct().count() + co.select("sp").distinct().count()
    assert(rows.map(_.getAs[Long]("n_vertices")).sum == nVerts)
    for (r <- rows) {
      val bits = r.getAs[Int]("bits")
      assert(r.getAs[Long]("min_deg") >= (1L << (bits - 1)))
      assert(r.getAs[Long]("max_deg") < (1L << bits))
      assert(r.getAs[Long]("n_customers") + r.getAs[Long]("n_suppliers") ==
        r.getAs[Long]("n_vertices"))
    }
  }

  test("emb_drift: cohorts partition the corpus and exactly 3 dims are flagged") {
    val rows = run("emb_drift").collect()
    val n = Tables.load(spark, sfDir, "embeddings").count()
    for (r <- rows)
      assert(r.getAs[Long]("n_ref") + r.getAs[Long]("n_cand") == n)
    assert(rows.count(_.getAs[Int]("is_top_drift") == 1) == 3)
    // flagged set == top-3 by |shift_num| with dim tiebreak
    val byShift = rows.sortBy(r => (-math.abs(r.getAs[Long]("shift_num")), r.getAs[Int]("dim")))
    assert(byShift.take(3).forall(_.getAs[Int]("is_top_drift") == 1))
  }
}
