package graft.functions

/** Integer natural log via precomputed milli-ln tables — the shared
  * machinery behind txt_bm25's exact ln-idf and etl_dp_counts'
  * Laplace inverse-CDF (HLL's precomputed-constant-table pattern:
  * the tables are computed ONCE driver-side and interpolated into
  * BOTH plans as literals, so no runtime transcendental executes on
  * either engine and results hash identically).
  *
  * lnMilli(x) ≈ 1000·ln(x) for 1 ≤ x < 2^55: decompose x into
  * 2^k · m with k = length(bin(x)) − 1 (both engines' bin() drop
  * leading zeros, so k is engine-identical), quantize the mantissa
  * into 64 buckets (idx = x·64 DIV 2^k − 64 ∈ [0, 64)), and read
  * lnMilli(x) = Ln2Milli(k) + LnMantMilli(idx). The mantissa table
  * holds each bucket's MIDPOINT ln (ln(1 + (i+½)/64)), so the
  * quantization error is symmetric: |lnMilli(x)/1000 − ln(x)| ≤
  * ½·ln(65/64) + rounding ≈ ±8.3 milli (a left-edge table would be
  * one-sided ≤ ~15.6 milli) — spec-pinned against libm ln.
  *
  * Edge value: lnMilli(1) = 8, NOT 0 — x = 1 lands in mantissa
  * bucket 0, whose midpoint is ln(1 + ½/64) ≈ 0.0078. Every current
  * consumer either takes DIFFERENCES of lnMilli values (the +8
  * cancels) or tolerates the ±8.3-milli band; a consumer that needs
  * an absolute zero anchor at x = 1 must special-case it — do not
  * assume lnMilli(1) == 0.
  */
object IntLn {

  val Ln2Milli: Seq[Long] =
    (0 until 64).map(k => math.round(k * math.log(2.0) * 1000.0))
  val LnMantMilli: Seq[Long] =
    (0 until 64).map(i => math.round(math.log(1.0 + (i + 0.5) / 64.0) * 1000.0))
  val Pow2: Seq[Long] = (0 until 55).map(k => 1L << k)

  /** lnMilli as a Spark SQL expression over `x` (column or literal). */
  def spark(x: String): String = {
    val k = s"(length(bin($x)) - 1)"
    val idx = s"CAST(($x) * 64 DIV element_at(array(${Pow2.mkString(",")}), $k + 1) - 64 AS INT)"
    s"(element_at(array(${Ln2Milli.mkString(",")}), $k + 1) + " +
      s"element_at(array(${LnMantMilli.mkString(",")}), $idx + 1))"
  }

  /** The same lnMilli as a DuckDB expression (list_extract / `//`). */
  def duck(x: String): String = {
    val k = s"(length(bin($x)) - 1)"
    val idx = s"CAST(($x) * 64 // list_extract([${Pow2.mkString(",")}], $k + 1) - 64 AS INT)"
    s"(list_extract([${Ln2Milli.mkString(",")}], $k + 1) + " +
      s"list_extract([${LnMantMilli.mkString(",")}], $idx + 1))"
  }

  /** Reference lnMilli for specs: the same table arithmetic in plain
    * Scala, so brute re-derivations share no ENGINE with the ops.
    */
  def ref(x: Long): Long = {
    require(x >= 1 && x < (1L << 55), s"lnMilli domain: $x")
    val k = 63 - java.lang.Long.numberOfLeadingZeros(x)
    Ln2Milli(k) + LnMantMilli((x * 64 / Pow2(k) - 64).toInt)
  }
}
