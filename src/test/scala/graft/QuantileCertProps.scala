package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Property net for ev_quantile_certified's certified rank bound
  * (queries/EventOps3.scala): the op claims |exact_rank(sample_j) −
  * j·s| ≤ 65·s for the strided per-chunk sample of ANY corpus — the
  * gate corpora only exercise two (N, s) points, this pins the
  * derivation itself (per chunk the strided subset's below-x count
  * is within s of the truth; ≤ 64 chunks + read-out quantization
  * telescopes to (chunks+1)·s). Small hash domains force heavy
  * chunk collisions and duplicate values — the tie regime the
  * corpus's 60-bit hashes never produce.
  */
object QuantileCertProps extends Properties("graft.quantcert") {

  private val Chunks = 8 // small chunk count: the bound must hold with (#chunks+1)·s

  private val corpus: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 400)
    vs <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 50L), Gen.choose(0L, 1000L)))
  } yield vs.distinct // (value, hash) pairs; lexicographic rank needs distinct pairs

  private def sample(vs: Seq[(Long, Long)], s: Long): Seq[(Long, Long)] =
    vs.groupBy(_._2 % Chunks).values.toSeq.flatMap { chunk =>
      chunk.sortBy(identity).zipWithIndex
        .filter { case (_, i) => i % s == 0 }.map(_._1)
    }.sorted

  property("every sample's global-position rank estimate is within (chunks+1)*s") =
    Prop.forAll(corpus, Gen.choose(1L, 7L)) { (vs0, s) =>
      val vs = vs0.toSeq
      val samp = sample(vs, s)
      samp.zipWithIndex.forall { case (x, i0) =>
        val j = i0 + 1L
        val exact = vs.count(v => v._1 < x._1 || (v._1 == x._1 && v._2 < x._2))
        math.abs(exact - j * s) <= (Chunks + 1) * s
      }
    }

  property("s = 1 degrades to exact: sample rank == position - 1") =
    Prop.forAll(corpus) { vs0 =>
      val vs = vs0.toSeq
      sample(vs, 1L).zipWithIndex.forall { case (x, i0) =>
        vs.count(v => v._1 < x._1 || (v._1 == x._1 && v._2 < x._2)) == i0
      }
    }

  property("the sample is capped: |sample| <= chunks + N/s") =
    Prop.forAll(corpus, Gen.choose(1L, 7L)) { (vs0, s) =>
      sample(vs0.toSeq, s).size <= Chunks + vs0.size / s
    }

  // r10: the chunk count is now DATA-ADAPTIVE (derived from the
  // corpus count) — the telescoping argument must hold for ANY chunk
  // count, not just the floor of 64 the gate corpora exercise.
  private def sampleK(vs: Seq[(Long, Long)], s: Long, k: Long): Seq[(Long, Long)] =
    vs.groupBy(_._2 % k).values.toSeq.flatMap { chunk =>
      chunk.sortBy(identity).zipWithIndex
        .filter { case (_, i) => i % s == 0 }.map(_._1)
    }.sorted

  property("the rank bound holds for ANY chunk count (adaptive-chunks derivation)") =
    Prop.forAll(corpus, Gen.choose(1L, 7L), Gen.choose(1L, 25L)) { (vs0, s, k) =>
      val vs = vs0.toSeq
      sampleK(vs, s, k).zipWithIndex.forall { case (x, i0) =>
        val exact = vs.count(v => v._1 < x._1 || (v._1 == x._1 && v._2 < x._2))
        math.abs(exact - (i0 + 1L) * s) <= (k + 1) * s
      }
    }

  // the op's derived constants, pinned as arithmetic over any corpus
  // size: chunks = max(64, ceil(n/T)) keeps the average per-chunk
  // slab ≤ T rows, and cap = 64·chunks keeps the certified bound
  // (chunks+1)·ceil(n/cap) a ~constant FRACTION of n (≤ n/32 plus
  // the small-corpus additive floor) — i.e. growing the chunk count
  // with the data does NOT let the bound outgrow the corpus.
  property("derived chunks bound the slab and keep the bound fractional") =
    Prop.forAll(Gen.choose(1L, 1L << 50)) { n =>
      val T = 1L << 22
      val chunks = math.max(64L, (n + T - 1) / T)
      val cap = chunks * 64L
      val stride = math.max(1L, (n + cap - 1) / cap)
      val bound = (chunks + 1) * stride
      n <= chunks * T && bound <= n / 32 + 2 * (chunks + 1)
    }

  // the pick rule's clamp: for every target in [0, N] the picked
  // index is a valid sample position
  property("jstar clamp always lands inside the sample") =
    Prop.forAll(corpus, Gen.choose(1L, 7L)) { (vs0, s) =>
      val m = sample(vs0.toSeq, s).size.toLong
      m == 0 || (0L to vs0.size.toLong).forall { target =>
        val j = math.max(1L, math.min(m, target / s))
        j >= 1 && j <= m
      }
    }
}
