package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants for the round-7 additions (beyond each op's
  * DuckDB oracle gate): exact-cardinality selection, the pairless
  * diversity identity against a direct pairwise reference, survival
  * algebra, and the audit histograms.
  */
class R7OpsSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("q_benford: digit domain, exact share algebra, and the constant table") {
    val rows = run("q_benford").collect()
    val digits = rows.map(_.getAs[Int]("digit"))
    assert(digits.forall(d => d >= 1 && d <= 9))
    val totalN = rows.map(_.getAs[Long]("n")).sum
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    assert(totalN == li, "every line item is counted under exactly one digit")
    rows.foreach { r =>
      val obs = r.getAs[Long]("obs_ppm")
      assert(obs == r.getAs[Long]("n") * 1000000L / totalN)
      assert(r.getAs[Long]("dev_ppm") == obs - r.getAs[Long]("exp_ppm"))
    }
    val exp1 = rows.find(_.getAs[Int]("digit") == 1).map(_.getAs[Long]("exp_ppm"))
    assert(exp1.contains(301029L), "Benford expectation for digit 1 is log10(2) in floor-ppm")
  }

  test("samp_bottomk: exactly min(k, n) rows and they are THE k smallest draws") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(md5(col("o_orderkey").cast("string")).as("draw"))
    val n = orders.count()
    val got = run("samp_bottomk").select("draw").collect().map(_.getString(0))
    assert(got.length == math.min(2000L, n))
    assert(got.distinct.length == got.length, "md5 draws are collision-free on the key set")
    // nothing outside the sample draws below the sample's max draw
    val cut = got.max
    assert(orders.filter(col("draw") <= cut).count() == got.length)
  }

  test("exp_kfold: partition of the corpus, fold domain, share algebra") {
    val rows = run("exp_kfold").collect()
    assert(rows.map(_.getAs[Int]("fold")).forall(f => f >= 0 && f < 5))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs, "folds partition the corpus")
    rows.groupBy(_.getAs[Int]("fold")).foreach { case (_, cells) =>
      val ft = cells.head.getAs[Long]("fold_total")
      assert(cells.map(_.getAs[Long]("n_docs")).sum == ft)
      val shareSum = cells.map(_.getAs[Long]("share_ppm")).sum
      assert(shareSum <= 1000000L && shareSum > 1000000L - cells.length,
        "truncating shares sum to 1e6 within one ulp per cell")
    }
  }

  test("emb_diversity matches a direct driver-side pairwise computation") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1e6).toLong).toArray))
      .groupBy(_._1).map { case (l, rs) => l -> rs.map(_._2) }
    val got = run("emb_diversity").collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[Double]("mean_pair_sq_dist")).toMap
    vecs.filter(_._2.length >= 2).foreach { case (label, xs) =>
      val n = xs.length
      var sum = BigInt(0)
      for (i <- xs.indices; j <- xs.indices if i != j) {
        var d = BigInt(0)
        for (k <- xs(i).indices) { val t = xs(i)(k) - xs(j)(k); d += BigInt(t) * t }
        sum += d
      }
      val expect = (BigDecimal(sum) / (BigDecimal(n) * (n - 1) * BigDecimal("1e12"))).toDouble
      assert(math.abs(got(label) - expect) < 1e-5, s"label $label: ${got(label)} vs $expect")
    }
  }

  test("ev_survival_hazard: risk-set algebra over the lifetime histogram") {
    val rows = run("ev_survival_hazard").orderBy("offset_d").collect()
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(rows.head.getAs[Long]("n_at_risk") == users,
      "everyone is at risk at the smallest observed lifetime")
    assert(rows.map(_.getAs[Long]("n_churned")).sum == users, "every user churns exactly once")
    val atRisk = rows.map(_.getAs[Long]("n_at_risk"))
    assert(atRisk.zip(atRisk.tail).forall { case (a, b) => a > b }, "risk set strictly shrinks")
    assert(rows.last.getAs[Long]("hazard_ppm") == 1000000L,
      "the longest-lived cohort churns with certainty")
    rows.foreach(r => assert(r.getAs[Long]("n_churned") <= r.getAs[Long]("n_at_risk")))
  }

  test("txt_zipf_coverage: nested heads, bounded shares, exact total mass") {
    val rows = run("txt_zipf_coverage").orderBy("head_k").collect()
    assert(rows.map(_.getAs[Int]("head_k")).toSeq == Seq(10, 100, 1000))
    val masses = rows.map(_.getAs[Long]("head_mass"))
    assert(masses.zip(masses.tail).forall { case (a, b) => a <= b }, "larger head covers more mass")
    val tMass = rows.head.getAs[Long]("t_mass")
    import org.apache.spark.sql.functions.{explode => ex}
    val tokens = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(ex(split(trim(col("text")), "\\s+"))).count()
    assert(tMass == tokens, "total mass is the corpus token count")
    rows.foreach { r =>
      assert(r.getAs[Long]("share_ppm") == r.getAs[Long]("head_mass") * 1000000L / tMass)
    }
  }

  test("ev_velocity_burst: histogram partitions the user base, bursts positive") {
    val rows = run("ev_velocity_burst").collect()
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == users)
    assert(rows.map(_.getAs[Long]("peak_burst")).forall(_ >= 1),
      "every user's own event is inside its trailing window")
  }

  test("graph_assortativity: correlation bounds and symmetric-graph identities") {
    val r = run("graph_assortativity").head()
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 && a <= 1.0)
    assert(r.getAs[Long]("n_edges") % 2 == 0, "symmetrized graph has even directed-edge count")
    assert(r.getAs[Long]("sxy") <= r.getAs[Long]("sxx"),
      "Cauchy-Schwarz with equal marginals: cross-moment at most the second moment")
  }

  test("samp_poisson_bootstrap: replicate frame and unit-mean multiplicities") {
    val rows = run("samp_poisson_bootstrap").collect()
    assert(rows.map(_.getAs[Int]("replicate")).sorted.toSeq == (0 until 10))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_draws") == docs, "every doc draws in every replicate")
      val ratio = r.getAs[Long]("eff_docs").toDouble / docs
      assert(ratio > 0.8 && ratio < 1.2, s"Poisson(1) keeps expected mass: $ratio")
    }
  }

  test("etl_l_diversity: classes cover the dimension, homogeneity share is consistent") {
    val rows = run("etl_l_diversity").collect()
    val custs = spark.read.parquet(s"$sfDir/customer.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum == custs, "QI classes partition the dimension")
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val l = r.getAs[Long]("l_distinct")
      val top = r.getAs[Long]("top_share_ppm")
      assert(l >= 1 && l <= n)
      assert(top <= 1000000L && top >= 1000000L / l - 1,
        "the largest sensitive value covers at least 1/l of its class")
      assert((r.getAs[Int]("is_diverse") == 1) == (l >= 3))
    }
  }

  test("samp_neyman_alloc: apportionment is exact and weights are positive") {
    val rows = run("samp_neyman_alloc").collect()
    assert(rows.map(_.getAs[Long]("alloc")).sum == 10000L,
      "largest-remainder apportionment spends the budget exactly")
    assert(rows.map(_.getAs[Long]("w")).forall(_ > 0))
  }

  test("mm_shot_boundary agrees with mm_frame_sample's framing") {
    val shots = run("mm_shot_boundary").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_frames"), r.getAs[Long]("n_cuts"), r.getAs[Long]("cut_ratio_ppm"))).toMap
    assert(shots.nonEmpty)
    val frames = run("mm_frame_sample").groupBy("doc_id").count().collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("count")).toMap
    shots.foreach { case (doc, (nf, nc, ratio)) =>
      assert(frames(doc) == nf, s"doc $doc: shot framing matches the frame sampler")
      assert(nc <= nf - 1)
      assert(ratio == nc * 1000000L / (nf - 1))
    }
  }

  test("ev_time_to_convert: CDF over exactly the converting users") {
    val rows = run("ev_time_to_convert").orderBy("hour_bucket").collect()
    val buyers = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == buyers, "one latency per converter")
    assert(rows.last.getAs[Long]("cum_ppm") == 1000000L, "the CDF closes at 1")
    val cums = rows.map(_.getAs[Long]("cum_users"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a < b })
    assert(rows.map(_.getAs[Long]("hour_bucket")).forall(_ >= 0),
      "first purchase can never precede first activity")
  }

  test("emb_cosine_sample_hist: one pair per id-successor, bands bounded, shares exact") {
    val rows = run("emb_cosine_sample_hist").collect()
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val pairs = rows.map(_.getAs[Long]("n_pairs")).sum
    assert(pairs == n - 1, "contiguous ids give exactly N-1 successor pairs")
    assert(rows.map(_.getAs[Int]("band")).forall(b => b >= -10 && b <= 10))
    rows.foreach(r =>
      assert(r.getAs[Long]("share_ppm") == r.getAs[Long]("n_pairs") * 1000000L / pairs))
  }

  test("etl_skew_audit: partitions cover the fact table, skew algebra exact") {
    val rows = run("etl_skew_audit").collect()
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == li)
    val p = rows.length
    rows.foreach { r =>
      assert(r.getAs[Long]("skew_ppm") == r.getAs[Long]("n_rows") * p * 1000000L / li)
      assert((r.getAs[Int]("is_hot") == 1) == (r.getAs[Long]("skew_ppm") >= 2000000L))
    }
  }

  test("meta_freshness: newest table has zero lag and verdicts follow the lag") {
    val rows = run("meta_freshness").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("lag_days")).min == 0L, "the newest table defines the clock")
    rows.foreach { r =>
      assert(r.getAs[Long]("lag_days") >= 0)
      assert((r.getAs[Int]("is_fresh") == 1) == (r.getAs[Long]("lag_days") <= 7))
    }
  }

  test("stream_velocity reconciles with the batch velocity histogram") {
    val streamed = run("stream_velocity")
      .groupBy("peak_burst").agg(count(lit(1)).as("n_users"))
      .orderBy("peak_burst").collect()
      .map(r => r.getAs[Long]("peak_burst") -> r.getAs[Long]("n_users"))
    val batch = run("ev_velocity_burst").orderBy("peak_burst").collect()
      .map(r => r.getAs[Long]("peak_burst") -> r.getAs[Long]("n_users"))
    assert(streamed.toSeq == batch.toSeq,
      "the streaming deque state computes the same peaks as the batch RANGE frame")
  }

  test("txt_dup_coverage: decile histogram covers exactly the in-scope docs") {
    val rows = run("txt_dup_coverage").collect()
    assert(rows.map(_.getAs[Int]("decile")).forall(d => d >= 0 && d <= 9))
    val inScope = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(size(split(trim(col("text")), "\\s+")) >= 3).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == inScope)
    rows.foreach(r =>
      assert(r.getAs[Long]("dup_shingles_total") <= r.getAs[Long]("shingles_total")))
  }
}
