package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Property net for exp_pack_sequences' packing arithmetic
  * (ops/Sampling.scala): the running-sum chop must tile the shard's
  * token stream exactly for ARBITRARY token-count lists — every doc's
  * interval [tokens_before, tokens_before + n) contiguous, disjoint,
  * offsets in [0, budget), seq_id = floor(start / budget). The spec
  * gates the corpus; this pins the arithmetic for inputs the corpus
  * never produces (empty docs, budget-sized docs, budget-straddlers).
  */
object PackProps extends Properties("graft.pack") {

  private val Budget = 256L

  private val tokenCounts: Gen[List[Long]] =
    Gen.listOf(Gen.frequency(
      5 -> Gen.choose(1L, 40L),          // typical short docs
      2 -> Gen.choose(200L, 300L),       // budget-straddlers
      1 -> Gen.const(Budget),            // exactly one sequence
      1 -> Gen.const(1L)))               // minimal

  private case class Packed(start: Long, n: Long, seqId: Long, off: Long)

  /** The op's arithmetic, literally: running sum minus self, DIV/mod. */
  private def pack(ns: List[Long]): List[Packed] = {
    val starts = ns.scanLeft(0L)(_ + _).init
    starts.zip(ns).map { case (s, n) => Packed(s, n, s / Budget, s % Budget) }
  }

  property("intervals tile [0, total) contiguously and disjointly") =
    Prop.forAll(tokenCounts) { ns =>
      val p = pack(ns)
      val total = ns.sum
      p.zip(p.drop(1)).forall { case (a, b) => a.start + a.n == b.start } &&
        (p.isEmpty || (p.head.start == 0L && p.last.start + p.last.n == total))
    }

  property("seq_offset ∈ [0, budget) and seq_id = floor(start/budget)") =
    Prop.forAll(tokenCounts) { ns =>
      pack(ns).forall(d =>
        d.off >= 0 && d.off < Budget &&
          d.seqId == d.start / Budget && d.start == d.seqId * Budget + d.off)
    }

  property("seq_id advances by exactly the sequences the previous doc spans") =
    Prop.forAll(tokenCounts) { ns =>
      val p = pack(ns)
      p.zip(p.drop(1)).forall { case (a, b) =>
        b.seqId == a.seqId + (a.off + a.n) / Budget
      }
    }

  property("token mass per sequence never exceeds budget for non-straddlers") =
    Prop.forAll(tokenCounts) { ns =>
      // docs fully inside one sequence (off + n <= budget) sum to
      // <= budget within that sequence — the loader-side guarantee
      pack(ns).filter(d => d.off + d.n <= Budget)
        .groupBy(_.seqId).values
        .forall(_.map(_.n).sum <= Budget)
    }
}
