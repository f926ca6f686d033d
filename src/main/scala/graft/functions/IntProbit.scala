package graft.functions

/** Integer probit (standard-normal inverse CDF) via a precomputed
  * milli-z table — the Gaussian-mechanism companion to [[IntLn]]
  * (same HLL-style precomputed-constant pattern: the table is built
  * ONCE driver-side and interpolated into BOTH engines' plans as
  * literals, so no runtime transcendental executes anywhere and
  * results hash identically).
  *
  * zMilli(h) ≈ 1000·Φ⁻¹(u) for a hash h uniform on [0, 2^52):
  * bucket i = h·1024 DIV 2^52 (the top 10 hash bits), table value
  * ProbitMilli(i) = round(1000·Φ⁻¹((i+½)/1024)) — mid-bucket like
  * the IntLn mantissa table. Consequences, both deliberate:
  * quantization error ≤ half a bucket of Φ⁻¹ (≈ 2 milli in the
  * bulk), and the tails clip at Φ⁻¹(1/2048) ≈ ±3.3σ — the standard
  * quantized-Gaussian truncation; |zMilli| ≤ 3300 by construction
  * and the spec pins it. Generation uses commons-math3 (on every
  * Spark classpath); the spec pins the table against the FORWARD
  * CDF and the antisymmetry z(i) = −z(1023−i).
  */
object IntProbit {

  val Buckets = 1024
  val Domain = 4503599627370496L // 2^52 — the md5-prefix hash domain

  val ProbitMilli: Seq[Long] = {
    val nd = new org.apache.commons.math3.distribution.NormalDistribution()
    (0 until Buckets).map(i =>
      math.round(nd.inverseCumulativeProbability((i + 0.5) / Buckets) * 1000.0))
  }

  /** zMilli as a Spark SQL expression over a hash column/literal `h`
    * in [0, 2^52). h·1024 < 2^62 — no overflow.
    */
  def spark(h: String): String =
    s"element_at(array(${ProbitMilli.mkString(",")}), " +
      s"CAST(($h) * ${Buckets}L DIV ${Domain}L AS INT) + 1)"

  /** The same zMilli as a DuckDB expression. */
  def duck(h: String): String =
    s"list_extract([${ProbitMilli.mkString(",")}], " +
      s"CAST(($h) * $Buckets // $Domain AS INT) + 1)"

  /** Reference zMilli for specs — same table arithmetic in plain
    * Scala, sharing no ENGINE with the ops.
    */
  def ref(h: Long): Long = {
    require(h >= 0 && h < Domain, s"zMilli domain: $h")
    ProbitMilli((h * Buckets / Domain).toInt)
  }
}
