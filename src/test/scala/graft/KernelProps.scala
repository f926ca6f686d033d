package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String

/** Property-based regression net for the native hash kernels: each
  * expression's tight-loop eval must match a NAIVE independent
  * re-derivation built the way the DuckDB oracles are written —
  * md5 → hex string → parse a hex prefix — over arbitrary inputs,
  * not just the corpus. Catches endianness/shift/window bugs in
  * future kernel edits that the fixed testdata might not reach.
  */
object KernelProps extends Properties("graft.kernels") {

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** The oracle-side semantics, literally: ('0x' || substr(md5(x),1,15))::BIGINT */
  private def naiveHigh60(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s.getBytes("UTF-8")).substring(0, 15), 16)

  private def naiveHigh32(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s.getBytes("UTF-8")).substring(0, 8), 16)

  private val asciiString: Gen[String] =
    Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)

  private val token: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  property("md5High60 == parse(hex(md5)[0:15]) — the DuckDB contract") =
    Prop.forAll(asciiString) { s =>
      graft.functions.GraftFunctionsTestHook.high60(s.getBytes("UTF-8")) == naiveHigh60(s)
    }

  property("md5High32 == parse(hex(md5)[0:8]) — the DuckDB contract") =
    Prop.forAll(asciiString) { s =>
      graft.functions.GraftFunctionsTestHook.high32(s.getBytes("UTF-8")) == naiveHigh32(s)
    }

  property("Phash60 eval == naive per-window SimHash over byte 4-grams") =
    Prop.forAll(asciiString) { s =>
      val expr = graft.functions.Phash60(null)
      val got = expr.nullSafeEval(UTF8String.fromString(s)).asInstanceOf[Long]
      val bytes = s.getBytes("UTF-8")
      val counts = new Array[Int](60)
      (0 until bytes.length - 3).foreach { i =>
        val h = naiveHigh60(new String(bytes.slice(i, i + 4), "UTF-8"))
        (0 until 60).foreach { j =>
          if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        }
      }
      val want = (0 until 60).foldLeft(0L) { (acc, j) =>
        if (counts(j) > 0) acc | (1L << j) else acc
      }
      got == want
    }

  property("SimHash60 eval == naive weighted bit votes over token hashes") =
    Prop.forAll(Gen.listOf(token)) { toks =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(t => UTF8String.fromString(t)).toArray[Any])
      val got = graft.functions.SimHash60(null).nullSafeEval(arr).asInstanceOf[Long]
      val counts = new Array[Int](60)
      toks.foreach { t =>
        val h = naiveHigh60(t)
        (0 until 60).foreach { j =>
          if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        }
      }
      val want = (0 until 60).foldLeft(0L) { (acc, j) =>
        if (counts(j) > 0) acc | (1L << j) else acc
      }
      got == want
    }

  property("hamming distance of phashes is bounded by 60 and symmetric") =
    Prop.forAll(asciiString, asciiString) { (a, b) =>
      val e = graft.functions.Phash60(null)
      val ha = e.nullSafeEval(UTF8String.fromString(a)).asInstanceOf[Long]
      val hb = e.nullSafeEval(UTF8String.fromString(b)).asInstanceOf[Long]
      val d = java.lang.Long.bitCount(ha ^ hb)
      d >= 0 && d <= 60 && d == java.lang.Long.bitCount(hb ^ ha)
    }

  // --- bit-length (length(bin(x))) primitives: the engine-portable
  // log2 both ev_quantile_sketch and txt_surprisal are built on.
  // bitlen(c) = 64 - numberOfLeadingZeros(c) is exactly what BOTH
  // engines' length(bin(c)) computes for c > 0.
  private def bitlen(c: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(c)

  private val posLong: Gen[Long] = Gen.choose(1L, Long.MaxValue / 4)

  property("quantile-sketch bucket upper bound: 2^bitlen(c) - 1 ∈ [c, 2c)") =
    Prop.forAll(posLong) { c =>
      val ub = (1L << bitlen(c)) - 1
      ub >= c && ub < 2 * c || (bitlen(c) >= 62) // no overflow regime in ops (cents << 2^62)
    }

  property("surprisal bits = bitlen(n) - bitlen(cnt) is within 1 bit of log2(n/cnt)") =
    Prop.forAll(posLong, posLong) { (a, b) =>
      val (n, cnt) = (a max b, a min b)
      val bits = bitlen(n) - bitlen(cnt)
      val trueLog = math.log(n.toDouble / cnt) / math.log(2.0)
      math.abs(bits - trueLog) < 1.0
    }

  // --- phash 5×12-bit banding (mm_phash candidate generation): the
  // pigeonhole guarantee must hold for ARBITRARY 60-bit hashes, not
  // just the corpus — ≤ 4 flipped bits cannot touch all 5 bands, so
  // every pair within the Hamming ≤ 4 candidate radius shares at
  // least one band bucket (zero false negatives by construction).
  private val hash60: Gen[Long] = Gen.choose(0L, (1L << 60) - 1)

  private def band(h: Long, k: Int): Long = (h >> (k * 12)) & 0xFFFL

  property("phash 5x12 banding is pigeonhole-exact: hamming <= 4 => some band equal") =
    Prop.forAll(hash60, Gen.choose(0, 4), Gen.listOfN(4, Gen.choose(0, 59))) { (h, nf, posRaw) =>
      val flipped = posRaw.distinct.take(nf).foldLeft(h)((acc, p) => acc ^ (1L << p))
      java.lang.Long.bitCount(h ^ flipped) <= 4 &&
        (0 until 5).exists(k => band(h, k) == band(flipped, k))
    }

  property("all 5 bands differing implies hamming >= 5 (the contrapositive, pairwise)") =
    Prop.forAll(hash60, hash60) { (a, b) =>
      val allDiffer = (0 until 5).forall(k => band(a, k) != band(b, k))
      !allDiffer || java.lang.Long.bitCount(a ^ b) >= 5
    }

  // --- MinHashUnion (the typed mergeable-sketch Aggregator): its
  // partial merges run in arbitrary association/order across
  // partitions, so the algebra itself must be proven, not assumed.
  // reduce/merge mutate their first argument in place — clone.
  private val sig: Gen[Array[Long]] =
    Gen.listOfN(graft.functions.MinHashUnion.Slots,
      Gen.choose(0L, Long.MaxValue)).map(_.toArray)

  private def m(a: Array[Long], b: Array[Long]): Array[Long] =
    graft.functions.MinHashUnion.merge(a.clone(), b)

  property("MinHashUnion merge is associative") =
    Prop.forAll(sig, sig, sig) { (a, b, c) =>
      java.util.Arrays.equals(m(m(a, b), c), m(a, m(b, c)))
    }

  property("MinHashUnion merge is commutative, idempotent; zero is the identity") =
    Prop.forAll(sig, sig) { (a, b) =>
      java.util.Arrays.equals(m(a, b), m(b, a)) &&
        java.util.Arrays.equals(m(a, a), a) &&
        java.util.Arrays.equals(m(graft.functions.MinHashUnion.zero, a), a)
    }

  property("MinHashUnion merge == element-wise min (the union-sketch contract)") =
    Prop.forAll(sig, sig) { (a, b) =>
      m(a, b).zip(a.zip(b)).forall { case (got, (x, y)) => got == math.min(x, y) }
    }
}
