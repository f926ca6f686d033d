package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** Typed sketch-merge aggregation: unions MinHash signatures by
  * element-wise minimum. MinHash sketches are mergeable — the
  * signature of a document UNION is the element-wise min of the
  * member signatures — so a corpus-level (or per-group) sketch
  * aggregates distributively: map-side partial merges collapse each
  * partition to one 32-slot array before the shuffle, exactly like a
  * built-in sum. This is the custom-`Aggregator` (TypedColumn) rung
  * of the extension ladder: the operation is an aggregation over
  * ARRAY state that no built-in aggregate expresses.
  *
  * The merged sketch estimates group-level distinct-shingle overlap:
  * J(A, B) ≈ matching slots / 32 between two group sketches.
  */
object MinHashUnion extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  val Slots = 32

  override def zero: Array[Long] = Array.fill(Slots)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Array[Long]): Array[Long] = {
    var i = 0
    val n = math.min(buf.length, sig.length)
    while (i < n) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = reduce(a, b)

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
