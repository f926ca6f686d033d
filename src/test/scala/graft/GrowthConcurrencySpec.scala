package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for ev_growth_accounting and ev_concurrency
  * beyond the oracle hash: the growth flows must obey their
  * conservation law against a driver-side recomputation from raw
  * user-weeks, and the per-day concurrency peak must equal a brute
  * boundary sweep over the (already-gated) session intervals.
  */
class GrowthConcurrencySpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("ev_growth_accounting: conservation + brute recomputation from user-weeks") {
    val uw = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("(ts DIV 1000000000) DIV 604800").as("wk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byUser = uw.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).toSet }
    val weeks = uw.map(_._2).distinct.sorted
    val activeByWk = weeks.map(w => w -> byUser.count(_._2.contains(w))).toMap

    val got = run("ev_growth_accounting").collect()
      .map(r => r.getAs[Long]("wk") ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("n_new"),
          r.getAs[Long]("n_retained"), r.getAs[Long]("n_resurrected"),
          r.getAs[Long]("n_churned"))).toMap
    assert(got.keySet == weeks.toSet)

    for (w <- weeks) {
      val (act, nw, ret, res, chu) = got(w)
      // conservation: every active user is exactly one of new/retained/resurrected
      assert(act == nw + ret + res, s"week $w: $act != $nw+$ret+$res")
      assert(act == activeByWk(w))
      val expNew = byUser.count { case (_, ws) => ws.contains(w) && ws.min == w }
      val expRet = byUser.count { case (_, ws) => ws.contains(w) && ws.contains(w - 1) }
      val expRes = byUser.count { case (_, ws) =>
        ws.contains(w) && !ws.contains(w - 1) && ws.exists(_ < w - 1) }
      assert((nw, ret, res) == ((expNew, expRet, expRes)), s"week $w flows")
      // churn identity: lost users = last week's active minus survivors
      val expChu = activeByWk.getOrElse(w - 1, 0).toLong - ret
      if (activeByWk.contains(w - 1)) assert(chu == expChu, s"week $w churn")
      else assert(chu == 0)
    }
    // every user is new exactly once
    assert(got.values.map(_._2).sum == byUser.size)
  }

  test("ev_concurrency: peak equals a brute boundary sweep over gated sessions") {
    // ground truth intervals from ev_sessionize (itself hash-gated)
    val sessions = run("ev_sessionize").collect()
      .map(r => (r.getAs[Long]("session_start"), r.getAs[Long]("session_end")))
    val byDay = sessions.flatMap { case (s0, s1) =>
      (s0 / 86400 to s1 / 86400).map { d =>
        d -> (math.max(s0, d * 86400), math.min(s1, d * 86400 + 86399))
      }
    }.groupBy(_._1)
    val expPeak = byDay.map { case (d, xs) =>
      val bounds = xs.flatMap { case (_, (a, b)) => Seq((a, 1), (b, -1)) }
        .sortBy { case (t, delta) => (t, -delta) }
      var cur = 0; var peak = 0
      bounds.foreach { case (_, delta) => cur += delta; peak = math.max(peak, cur) }
      d -> (peak.toLong, xs.length.toLong)
    }

    val got = run("ev_concurrency").collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("peak_concurrency"), r.getAs[Long]("n_sessions"))).toMap
    assert(got == expPeak)
    // sanity: some day genuinely overlaps (peak > 1) or the op is vacuous
    assert(got.values.exists(_._1 > 1))
  }
}
