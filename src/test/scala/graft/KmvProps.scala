package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Property net for the KMV/theta bottom-k ALGEBRA ev_kmv_set_ops is
  * built on (queries/EventOps3.scala). The op's plan rewrites and
  * estimator conventions must hold for ARBITRARY hash sets, not just
  * the gate corpus — each property re-derives the contract naively.
  */
object KmvProps extends Properties("graft.kmv") {

  private val K = 8
  private val D = 4503599627370496L // 2^52, the op's hash domain

  private val hashSet: Gen[Set[Long]] =
    Gen.listOf(Gen.choose(0L, D - 1)).map(_.toSet)

  private def bottomK(s: Iterable[Long]): Seq[Long] =
    s.toSeq.distinct.sorted.take(K)

  // The op's phase-1 salt pre-pass: rank within (salt = h mod m)
  // groups, keep K per group, THEN rank across the survivors. The
  // whole point is bounding window-partition size at 100 TB — but it
  // is only legal because the global bottom-K always survives the
  // per-salt cut. Prove the rewrite for arbitrary sets and salt
  // counts (including m = 1, the degenerate no-salt case).
  property("salted two-phase bottom-k == direct bottom-k") =
    Prop.forAll(hashSet, Gen.choose(1, 64)) { (s, m) =>
      val phase1 = s.groupBy(h => ((h % m) + m) % m).values.flatMap(bottomK)
      bottomK(phase1) == bottomK(s)
    }

  // Mergeability (the union-estimate path): the bottom-K of a union
  // is the bottom-K of the merged per-set bottom-Ks. This is what
  // makes a KMV sketch a SKETCH — per-partition partials combine.
  property("bottomK(A ∪ B) == bottomK(bottomK(A) ++ bottomK(B))") =
    Prop.forAll(hashSet, hashSet) { (a, b) =>
      bottomK(a ++ b) == bottomK(bottomK(a) ++ bottomK(b))
    }

  // Associativity across an arbitrary 3-way split — partial merges
  // run in whatever association the shuffle hands them.
  property("bottom-k merge is associative and commutative") =
    Prop.forAll(hashSet, hashSet, hashSet) { (a, b, c) =>
      val ab_c = bottomK(bottomK(bottomK(a) ++ bottomK(b)) ++ bottomK(c))
      val a_bc = bottomK(bottomK(a) ++ bottomK(bottomK(b) ++ bottomK(c)))
      ab_c == a_bc && bottomK(bottomK(a) ++ bottomK(b)) == bottomK(bottomK(b) ++ bottomK(a))
    }

  // The θ = D exhaustive convention: a set at or under capacity is
  // carried exactly — the estimator must DEGRADE TO EXACT, and the
  // (K−1)·D DIV h_K rule applies only above capacity.
  private def theta(s: Set[Long]): Long = if (s.size <= K) D else bottomK(s).max
  private def est(s: Set[Long]): Long =
    if (s.size <= K) s.size.toLong else (K - 1).toLong * D / bottomK(s).max

  property("exhaustive sketch (|S| <= K) estimates exactly") =
    Prop.forAll(Gen.listOfN(K, Gen.choose(0L, D - 1))) { l =>
      val s = l.toSet
      est(s) == s.size.toLong && theta(s) == D
    }

  // Intersection counting: every common-below-θ survivor is in BOTH
  // bottom-Ks, and c_below ≤ K always — the |days|·K bound the op's
  // sketch-sized downstream algebra depends on.
  property("common-below-θ count is bounded by K and by both sketch sizes") =
    Prop.forAll(hashSet, hashSet) { (a, b) =>
      val th = math.min(theta(a), theta(b))
      val c = bottomK(a).toSet.intersect(bottomK(b).toSet).count(_ < th)
      c <= K && c <= bottomK(a).size && c <= bottomK(b).size
    }

  // Every sketch hash below the pair θ that is in BOTH SETS is in
  // both sketches (no intersection undercount from the cut): h < θ_S
  // means h is within S's bottom-K by the θ definition.
  property("below-θ membership: h ∈ S with h < θ(S) implies h ∈ bottomK(S)") =
    Prop.forAll(hashSet) { s =>
      s.filter(_ < theta(s)).forall(bottomK(s).contains)
    }
}
