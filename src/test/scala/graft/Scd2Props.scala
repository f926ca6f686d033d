package graft

import graft.etl.Merger
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property net for the SCD2 historization kernel (etl/Merger.scala)
  * backing etl_scd2 and etl_scd2_pointintime: for seeded random
  * multi-key version histories — far denser than the two-version dim
  * the gate op constructs — the emitted [valid_from, valid_to)
  * ranges must satisfy the point-in-time contract a warehouse user
  * relies on: per key the intervals tile [first_effective, sentinel)
  * contiguously and disjointly, exactly the max-version row is
  * current, and a point-in-time probe at ANY date returns exactly
  * the latest version effective on or before it (and nothing before
  * the first version). The gate corpus exercises 1–2 versions per
  * key; this pins the arithmetic for deep histories, single-version
  * keys, and same-key dense (consecutive-day) version runs.
  */
class Scd2Props extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260815)
  private val base = java.time.LocalDate.of(1992, 1, 1)

  // keys 1..30: 1..6 versions each at strictly increasing effective
  // dates (the kernel's documented precondition); key 31 is an
  // adversarial dense run — 5 versions on 5 CONSECUTIVE days (each
  // interval exactly one day wide); key 32 is single-version.
  private val hist: Seq[(Long, Int, String)] =
    (1L to 30L).flatMap { k =>
      val offs = Seq.fill(1 + rnd.nextInt(6))(rnd.nextInt(3000)).distinct.sorted
      offs.zipWithIndex.map { case (off, i) =>
        (k, i + 1, base.plusDays(off.toLong).toString)
      }
    } ++
      (1 to 5).map(i => (31L, i, base.plusDays(99L + i).toString)) ++
      Seq((32L, 1, base.toString))

  private lazy val out: Seq[(Long, Int, java.sql.Date, java.sql.Date, Int)] =
    Merger.scd2(
        hist.toDF("k", "version", "eff").withColumn("eff", col("eff").cast("date")),
        Seq("k"), Seq(col("version")), col("eff"))
      .select("k", "version", "valid_from", "valid_to", "is_current")
      .as[(Long, Int, java.sql.Date, java.sql.Date, Int)].collect().toSeq

  private lazy val byKey: Map[Long, Seq[(Long, Int, java.sql.Date, java.sql.Date, Int)]] =
    out.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

  test("scd2 conserves rows: one output interval per input version") {
    assert(out.map(r => (r._1, r._2)).sorted == hist.map(h => (h._1, h._2)).sorted)
  }

  test("scd2 intervals tile [first_effective, sentinel) per key") {
    byKey.foreach { case (k, rows) =>
      val in = hist.filter(_._1 == k).sortBy(_._2)
      assert(rows.map(_._3.toString) == in.map(_._3), s"valid_from != effective at key $k")
      rows.zip(rows.drop(1)).foreach { case (a, b) =>
        assert(a._4 == b._3, s"gap/overlap between v${a._2} and v${b._2} at key $k")
      }
      assert(rows.last._4.toString == Merger.OpenEnd, s"open end at key $k")
      assert(rows.map(_._5) == Seq.fill(rows.size - 1)(0) :+ 1,
        s"is_current must flag exactly the max version at key $k")
    }
  }

  test("point-in-time probe returns exactly the latest version effective <= d") {
    val probes = Seq.fill(300)(base.plusDays((rnd.nextInt(3300) - 100).toLong))
    byKey.foreach { case (k, rows) =>
      val in = hist.filter(_._1 == k)
      probes.foreach { d =>
        val hits = rows.filter(r =>
          !d.isBefore(r._3.toLocalDate) && d.isBefore(r._4.toLocalDate))
        val want = in.filter(h => !d.isBefore(java.time.LocalDate.parse(h._3)))
          .sortBy(_._2).lastOption.map(_._2).toList
        assert(hits.map(_._2).toList == want, s"probe $d at key $k")
      }
    }
  }
}
