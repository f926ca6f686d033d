package graft

import graft.streaming.StreamOps2
import graft.streaming.StreamOps2.HourRow
import org.scalatest.funsuite.AnyFunSuite

/** SpaceSaving sketch invariants for stream_heavy_hitters — in
  * particular the EVICTION path the exact gate corpus never takes
  * (gate capacity > gate cardinality): over-capacity streams must
  * still surface a dominant key, flag themselves inexact, and only
  * ever OVER-estimate (the SpaceSaving guarantee).
  */
class HeavyHittersSpec extends AnyFunSuite with SparkSuite {

  private def sketch(rows: Seq[HourRow], capacity: Int = StreamOps2.Capacity) = {
    import spark.implicits._
    StreamOps2.heavyHitters(rows.toDS(), capacity).collect()
      .sortBy(r => (r.hour_epoch, r.rk))
  }

  test("below capacity the sketch is exact and flags it") {
    val rows = (1 to 5).flatMap(u => Seq.fill(u * 2)(HourRow(7L, u.toLong))) :+
      HourRow(7L, -1L)
    val got = sketch(rows)
    assert(got.map(_.user_id).toSeq == Seq(5L, 4L, 3L)) // top-3 by count desc
    assert(got.map(_.n_events).toSeq == Seq(10L, 8L, 6L))
    assert(got.forall(_.is_exact == 1))
    assert(got.map(_.rk).toSeq == Seq(1, 2, 3))
    assert(got.forall(_.hour_epoch == 7L * 3600))
  }

  test("over capacity the sketch evicts, over-estimates only, and keeps the dominant key on top") {
    // 300 distinct one-hit users (> capacity 256) + one user with 500 hits
    val heavy = Seq.fill(500)(HourRow(2L, 999999L))
    val noise = (1 to 300).map(u => HourRow(2L, u.toLong))
    val got = sketch(new scala.util.Random(42).shuffle(noise).toList ++ heavy :+ HourRow(2L, -1L),
      capacity = 256)
    assert(got.forall(_.is_exact == 0), "eviction must clear the exact flag")
    assert(got.head.user_id == 999999L, "dominant key must survive eviction")
    assert(got.head.n_events >= 500L, "SpaceSaving counts are upper bounds")
    // every count is bounded by true_count + ε·N with ε = 1/capacity:
    // N = 800 events, capacity 256 ⇒ error ≤ 3 per counter
    assert(got.forall(_.n_events <= 500L + 800L / 256 + 1))
  }

  test("total mass is conserved exactly across eviction (full counter table)") {
    // SpaceSaving never loses mass — an eviction reassigns the min
    // slot's count, so sum(counts) over the FULL table equals the
    // ingested event count on both the exact and the eviction path.
    val empty = StreamOps2.HHState(Array.empty, Array.empty, evicted = false)
    val exact = StreamOps2.sketchIngest(empty,
      (1 to 100).iterator.map(i => (i % 7).toLong), capacity = 16)
    assert(!exact.evicted && exact.counts.sum == 100L)
    val evicting = StreamOps2.sketchIngest(empty,
      (1 to 1000).iterator.map(i => (i % 37).toLong), capacity = 8)
    assert(evicting.evicted, "37 distinct keys must overflow capacity 8")
    assert(evicting.counts.length == 8)
    assert(evicting.counts.sum == 1000L, "eviction must reassign, never drop, mass")
    // incremental ingest across state round-trips conserves too
    val resumed = StreamOps2.sketchIngest(evicting,
      (1 to 250).iterator.map(i => (i % 41).toLong), capacity = 8)
    assert(resumed.counts.sum == 1250L)
  }

  test("the gate op fails loudly (never an opaque hash mismatch) when capacity is below gate cardinality") {
    // same staging + streaming pipeline as the registered op, at
    // capacity 2 — sf0.001's busiest hour has 6 distinct users, so
    // this drives the ε=1/C degradation path end to end
    val res = StreamOps2.streamHeavyHittersAt(spark, sfDir, capacity = 2).collect()
    assert(res.nonEmpty)
    assert(res.exists(_.getAs[Int]("is_exact") == 0),
      "sf0.001's busiest hour carries 6 distinct users; capacity 2 must evict")
    // and the registered gate (guardedHeavyHitters IS the op body,
    // parameterized) throws instead of letting the hardcoded
    // is_exact=1 oracle surface as an opaque hash mismatch
    val e = intercept[IllegalArgumentException] {
      StreamOps2.guardedHeavyHitters(spark, sfDir, capacity = 2)
    }
    assert(e.getMessage.contains("is_exact=0"))
  }

  test("ties break to the smaller user id at equal counts") {
    val rows = Seq(HourRow(0L, 30L), HourRow(0L, 10L), HourRow(0L, 20L), HourRow(0L, -1L))
    assert(sketch(rows).map(_.user_id).toSeq == Seq(10L, 20L, 30L))
  }

  test("a window with no close sentinel emits nothing") {
    import spark.implicits._
    val rows = Seq(HourRow(1L, 5L), HourRow(1L, 5L))
    assert(StreamOps2.heavyHitters(rows.toDS()).collect().isEmpty)
  }

  test("gate path reconciles against the batch leaderboard at sf0.001") {
    import org.apache.spark.sql.functions._
    val got = Registry.byName("stream_heavy_hitters").run(spark, sfDir).collect()
    val batch = Tables.events(spark, sfDir)
      .select(expr("ts DIV 1000000000 DIV 3600").as("hr"), col("user_id"))
      .groupBy("hr", "user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Long]("hr"), r.getAs[Long]("user_id"), r.getAs[Long]("n")))
    val top = batch.groupBy(_._1).toSeq.flatMap { case (hr, g) =>
      g.sortBy(t => (-t._3, t._2)).take(3).zipWithIndex.map { case ((_, u, n), i) =>
        (hr * 3600, i + 1, u, n)
      }.toSeq
    }.toSet
    assert(got.map(r => (r.getAs[Long]("hour_epoch"), r.getAs[Int]("rk"),
      r.getAs[Long]("user_id"), r.getAs[Long]("n_events"))).toSet == top)
    assert(got.forall(_.getAs[Int]("is_exact") == 1))
  }
}
