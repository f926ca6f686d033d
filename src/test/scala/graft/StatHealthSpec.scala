package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side recomputation invariants for the statistical-test pack
  * (StatOps) and the pipeline-health pack (PipelineHealth): each
  * op's integer-exact statistic is re-derived from the raw sf0.001
  * tables with independent Scala arithmetic and compared cell for
  * cell — the same algebra the DuckDB gate proves at sf0.01, proven
  * here a second way at a scale where hand-checking is feasible.
  */
class StatHealthSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("q_chi_square: expected and contribution re-derive from the observed cells") {
    val rows = run("q_chi_square").collect()
    assert(rows.length == 25) // 5 segments × 5 priorities
    val obs = rows.map(r => (r.getAs[String]("seg"), r.getAs[String]("pri")) ->
      r.getAs[Long]("observed")).toMap
    val n = obs.values.sum
    val rt = obs.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ct = obs.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    for (r <- rows) {
      val (seg, pri) = (r.getAs[String]("seg"), r.getAs[String]("pri"))
      val em = BigInt(rt(seg)) * ct(pri) * 1000 / n
      assert(BigInt(r.getAs[Long]("expected_milli")) == em)
      val d = BigInt(1000) * obs((seg, pri)) - em
      assert(BigInt(r.getAs[Long]("contrib_milli")) == d * d / em.max(1))
    }
  }

  test("q_gini: one nation re-derives from raw orders; bounds hold everywhere") {
    val rows = run("q_gini").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val g = r.getAs[Long]("gini_ppm")
      assert(g >= 0 && g < 1000000, s"gini out of [0,1): $g")
    }
    // independent recompute for the first nation present
    val nk = rows.head.getAs[Int]("nationkey")
    val spend = Tables.load(spark, sfDir, "orders")
      .groupBy("o_custkey")
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("c"))
      .join(Tables.load(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .filter(col("c_nationkey") === nk)
      .select("c").collect().map(_.getLong(0)).sorted
    val nn = spend.length
    val s = spend.map(BigInt(_)).sum
    val w = spend.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val expected = (BigInt(2) * w - BigInt(nn + 1) * s) * 1000000 / (BigInt(nn) * s)
    assert(BigInt(rows.head.getAs[Long]("gini_ppm")) == expected)
    assert(rows.head.getAs[Long]("n_customers") == nn)
  }

  test("q_ks_test: the statistic equals a brute-force sup over the pooled sample") {
    val row = run("q_ks_test").collect()
    assert(row.length == 1)
    val fact = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v"),
        col("c_mktsegment").as("seg"))
      .collect().map(r => (r.getAs[Long]("v"), r.getAs[String]("seg")))
    val a = fact.filter(_._2 == "BUILDING").map(_._1).sorted
    val b = fact.filter(_._2 == "MACHINERY").map(_._1).sorted
    val (n1, n2) = (a.length.toLong, b.length.toLong)
    val sup = fact.map(_._1).distinct.map { v =>
      val c1 = a.count(_ <= v).toLong
      val c2 = b.count(_ <= v).toLong
      (BigInt(c1) * n2 - BigInt(c2) * n1).abs * 1000000 / (BigInt(n1) * n2)
    }.max
    assert(row.head.getAs[Long]("n1") == n1 && row.head.getAs[Long]("n2") == n2)
    assert(BigInt(row.head.getAs[Long]("ks_ppm")) == sup)
  }

  test("q_pearson_corr: r re-derives from exact moments and sits in [-1, 1]") {
    val rows = run("q_pearson_corr").collect()
    assert(rows.nonEmpty)
    val perCust = Tables.load(spark, sfDir, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("x"),
        sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("y"))
      .join(Tables.load(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .select("c_nationkey", "x", "y").collect()
      .map(r => (r.getAs[Int]("c_nationkey"), r.getAs[Long]("x"), r.getAs[Long]("y")))
    for (r <- rows) {
      val nk = r.getAs[Int]("nationkey")
      val xs = perCust.filter(_._1 == nk)
      val n = BigInt(xs.length)
      val sx = xs.map(t => BigInt(t._2)).sum
      val sy = xs.map(t => BigInt(t._3)).sum
      val sxy = xs.map(t => BigInt(t._2) * t._3).sum
      val sxx = xs.map(t => BigInt(t._2) * t._2).sum
      val syy = xs.map(t => BigInt(t._3) * t._3).sum
      val d1 = n * sxx - sx * sx
      val d2 = n * syy - sy * sy
      if (d1 == 0 || d2 == 0) assert(r.isNullAt(r.fieldIndex("r")))
      else {
        val want = BigDecimal((n * sxy - sx * sy).toDouble /
          math.sqrt(d1.toDouble * d2.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val got = r.getAs[Double]("r")
        assert(math.abs(got - want) <= 1e-6, s"nation $nk: $got vs $want")
        assert(got >= -1.0 && got <= 1.0)
      }
    }
  }

  test("etl_dist_drift: shares are exact truncating ppm and deltas cross-multiply") {
    val rows = run("etl_dist_drift").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val na = rows.map(_.getAs[Long]("n_a")).sum
    val nb = rows.map(_.getAs[Long]("n_b")).sum
    assert(na > 0 && nb > 0)
    for (r <- rows) {
      assert(r.getAs[Long]("share_a_ppm") == r.getAs[Long]("n_a") * 1000000L / na)
      assert(r.getAs[Long]("share_b_ppm") == r.getAs[Long]("n_b") * 1000000L / nb)
      val want = (BigInt(r.getAs[Long]("n_a")) * nb - BigInt(r.getAs[Long]("n_b")) * na).abs *
        1000000 / (BigInt(na) * nb)
      assert(BigInt(r.getAs[Long]("delta_ppm")) == want)
    }
    // truncating shares each lose < 1 ppm: totals land in (10⁶ − #bands, 10⁶]
    assert(rows.map(_.getAs[Long]("share_a_ppm")).sum > 1000000L - rows.length)
  }

  test("exp_length_buckets: caps are the tight next power of two and waste re-derives") {
    val rows = run("exp_length_buckets").collect()
    assert(rows.nonEmpty)
    val toks = Tables.load(spark, sfDir, "documents")
      .select(expr("size(split(trim(text), '\\\\s+'))").as("t")).collect()
      .map(_.getAs[Int]("t"))
    def cap(t: Int): Long = if (t <= 1) 1L else {
      var c = 1L; while (c < t) c <<= 1; c
    }
    val byCap = toks.groupBy(cap)
    assert(rows.length == byCap.size)
    for (r <- rows) {
      val c = r.getAs[Long]("bucket_cap")
      assert((c & (c - 1)) == 0, s"cap $c not a power of two")
      val mine = byCap(c)
      assert(r.getAs[Long]("n_docs") == mine.length)
      val tot = mine.map(_.toLong).sum
      assert(r.getAs[Long]("sum_tokens") == tot)
      assert(r.getAs[Long]("waste_ppm") ==
        (c * mine.length - tot) * 1000000L / (c * mine.length))
      // tightness: every doc fits, and at least one doc needs this cap
      assert(mine.forall(_ <= c) && (c == 1L || mine.exists(_ > c / 2)))
    }
  }

  test("ev_bot_detect: ranks are dense, flags re-derive from the emitted signals") {
    val rows = run("ev_bot_detect").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Int]("rk")).toSeq == (1 to rows.length))
    // rank order is (rate DESC, cv2 ASC, user ASC)
    val key = rows.map(r => (-r.getAs[Long]("rate_per_hr_milli"),
      r.getAs[Long]("cv2_ppm"), r.getAs[Long]("user_id"))).toSeq
    assert(key == key.sorted)
    for (r <- rows) {
      assert(r.getAs[Long]("n") >= 30)
      assert(r.getAs[Long]("cv2_ppm") >= 0) // Cauchy–Schwarz
      val bot = r.getAs[Long]("rate_per_hr_milli") >= 100000L ||
        r.getAs[Long]("cv2_ppm") <= 250000L
      assert(r.getAs[Int]("is_bot") == (if (bot) 1 else 0))
    }
    // recompute one user's signals from the raw stream
    val u = rows.head.getAs[Long]("user_id")
    val es = Tables.events(spark, sfDir)
      .filter(col("user_id") === u)
      .select(expr("ts DIV 1000000000").as("es"), col("event_id"))
      .collect().map(r => (r.getAs[Long]("es"), r.getAs[Long]("event_id")))
      .sortBy(t => (t._1, t._2)).map(_._1)
    val n = es.length.toLong
    val span = es.max - es.min
    val gaps = es.sliding(2).map(p => p(1) - p(0)).toArray
    val sg = gaps.map(BigInt(_)).sum
    val sgg = gaps.map(g => BigInt(g) * g).sum
    assert(rows.head.getAs[Long]("n") == n)
    assert(rows.head.getAs[Long]("span_s") == span)
    assert(BigInt(rows.head.getAs[Long]("rate_per_hr_milli")) ==
      BigInt(n) * 3600000 / BigInt(span).max(1))
    assert(BigInt(rows.head.getAs[Long]("cv2_ppm")) ==
      (BigInt(gaps.length) * sgg - sg * sg) * 1000000 / (sg * sg).max(1))
  }
}
