package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.queries.Analytics4

/** Properties of the density-adaptive geo grid ladder. The ladder is
  * a CASE expression evaluated FIRST-TRUE-BRANCH-WINS by both
  * engines, so beyond cover-correctness (cell ≥ radius — which ANY
  * big-enough cell satisfies) the suite pins MINIMALITY: the chosen
  * cell is the smallest power of two that covers the radius. A
  * mis-ordered ladder keeps correctness and silently degrades the
  * cell join to a single-cell quadratic — exactly the bug class this
  * file exists to catch (it happened: loosest-first ordering made
  * every corpus pick 2^23 and sent the sf1 join to 337 s).
  */
object GeoLadderProps extends Properties("graft.geoladder") {

  private val B = BigInt(Analytics4.GeoPairBudget)
  // ladder range: 2^6 (N ~9e10, the 100 TB point count) .. 2^24
  // (N < 6 — one cell already spans the whole 10^7-microdegree region)
  private val cellMin = BigInt(1) << 6
  private val cellMax = BigInt(1) << 24

  // the top band MUST exceed the smallest cells' thresholds (2^7
  // needs n >= 2.29e10, 2^6 needs n >= 9.16e10) or the bottom rungs
  // of the ladder — exactly the 100 TB cells — go untested
  private val nGen: Gen[Long] = Gen.oneOf(
    Gen.choose(1L, 100L),
    Gen.choose(1L, 10000000L),
    Gen.choose(1L, 200000000000L))

  property("cover: cell^2 * n >= budget (cell >= adaptive radius)") =
    Prop.forAll(nGen) { n =>
      val c = BigInt(Analytics4.geoCellFor(n))
      // cell >= r where r^2 = B/n  ⟺  cell^2 * n >= B (exact rational),
      // except at the top of the ladder where the cell is capped
      c * c * n >= B || c == cellMax
    }

  property("minimal: the next-smaller power of two does NOT cover") =
    Prop.forAll(nGen) { n =>
      val c = BigInt(Analytics4.geoCellFor(n))
      c == cellMin || (c / 2) * (c / 2) * n < B
    }

  property("cell is a power of two within the ladder range") =
    Prop.forAll(nGen) { n =>
      val c = Analytics4.geoCellFor(n)
      java.lang.Long.bitCount(c) == 1 &&
        BigInt(c) >= cellMin && BigInt(c) <= cellMax
    }

  property("branch thresholds strictly DECREASE in CASE order") =
    Prop {
      val ts = Analytics4.geoLadderBranches.map(_._1)
      ts.zip(ts.tail).forall { case (a, b) => a > b }
    }

  property("occupancy bound: cell^2 * n <= 4 * budget (load per cell is constant)") =
    Prop.forAll(nGen) { n =>
      val c = BigInt(Analytics4.geoCellFor(n))
      // the minimal covering power of two overshoots r by < 2x, so
      // expected points per cell = n * cell^2 / area <= 4B / area
      c * c * n <= 4 * B || c == cellMax
    }
}
