package graft

import graft.streaming.StreamOps2
import graft.streaming.StreamOps2.HHState
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based net for the SpaceSaving sketch (stream_heavy_hitters
  * state): the Metwally/Agrawal/El Abbadi guarantees, checked over
  * arbitrary streams and capacities rather than the fixed corpus —
  * these are the invariants the streaming gate's exactness assertion
  * and the ε=1/C degradation story both rest on.
  */
object HeavyHitterProps extends Properties("graft.spacesaving") {

  private val empty = HHState(Array.empty, Array.empty, evicted = false)

  private val streamGen: Gen[List[Long]] =
    Gen.listOf(Gen.choose(0L, 40L))

  private val capacityGen: Gen[Int] = Gen.choose(1, 24)

  property("total mass is conserved exactly on every path") =
    Prop.forAll(streamGen, capacityGen) { (ids, cap) =>
      StreamOps2.sketchIngest(empty, ids.iterator, cap).counts.sum == ids.length.toLong
    }

  property("counts only ever over-estimate keys present in the table") =
    Prop.forAll(streamGen, capacityGen) { (ids, cap) =>
      val st = StreamOps2.sketchIngest(empty, ids.iterator, cap)
      val truth = ids.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      st.users.zip(st.counts).forall { case (u, c) => c >= truth.getOrElse(u, 0L) }
    }

  property("per-counter error is bounded by ε·N with ε = 1/capacity") =
    Prop.forAll(streamGen, capacityGen) { (ids, cap) =>
      val st = StreamOps2.sketchIngest(empty, ids.iterator, cap)
      val truth = ids.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      val bound = ids.length.toLong / cap + 1
      st.users.zip(st.counts).forall { case (u, c) =>
        c - truth.getOrElse(u, 0L) <= bound
      }
    }

  property("the evicted flag is exact evidence: set iff some arrival found a full table without its key") =
    Prop.forAll(streamGen, capacityGen) { (ids, cap) =>
      val st = StreamOps2.sketchIngest(empty, ids.iterator, cap)
      // replay: eviction happens iff at some prefix the table is full
      // and the next id is absent — recompute independently
      val (_, evictedNaive) = ids.foldLeft((Set.empty[Long], false)) {
        case ((seen, ev), id) =>
          if (seen.contains(id)) (seen, ev)
          else if (seen.size < cap) (seen + id, ev)
          else (seen, true) // key set approximation: once full, any new key evicts
      }
      // the naive key-set model diverges after the first eviction
      // (evicted keys can re-arrive as "new"), but the FLAG direction
      // it proves is exact: a stream whose distinct-prefix never
      // overflows capacity must not evict, and one that does must
      if (!evictedNaive) !st.evicted else st.evicted
    }

  property("no eviction ⇒ the sketch IS the exact multiset (count per key, all keys present)") =
    Prop.forAll(streamGen, Gen.choose(41, 64)) { (ids, cap) =>
      val st = StreamOps2.sketchIngest(empty, ids.iterator, cap)
      val truth = ids.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      !st.evicted &&
        st.users.length == truth.size &&
        st.users.zip(st.counts).forall { case (u, c) => truth.get(u).contains(c) }
    }

  property("ingest is state-resumable: split streams equal one-shot streams when no eviction intervenes") =
    Prop.forAll(streamGen, streamGen) { (a, b) =>
      val cap = 128 // > key domain ⇒ no eviction anywhere
      val oneShot = StreamOps2.sketchIngest(empty, (a ++ b).iterator, cap)
      val resumed = StreamOps2.sketchIngest(
        StreamOps2.sketchIngest(empty, a.iterator, cap), b.iterator, cap)
      oneShot.users.zip(oneShot.counts).toMap ==
        resumed.users.zip(resumed.counts).toMap
    }
}
