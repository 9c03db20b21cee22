package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed vector aggregation (SURVEY.md §2.10: the custom
  * `Aggregator[IN,BUF,OUT]` slot for centroid aggregation over
  * embeddings): single-pass mean of Array[Float] vectors with a
  * constant-size mutable buffer — no posexplode, no per-dimension rows,
  * shuffle carries one (sums, count) buffer per group per partition.
  *
  * Complements Similarity.centroids (the exploded, oracle-exact
  * formulation): use the Aggregator on wide pipelines where the 64x row
  * blow-up of posexplode matters; use the exploded form when bit-exact
  * cross-engine parity is required (this one accumulates left-to-right
  * per partition, so results are standard-float, not quantized).
  */
object VectorAgg {

  final case class Buf(var sums: Array[Double], var n: Long)

  val vectorAvg: Aggregator[Array[Float], Buf, Array[Double]] =
    new Aggregator[Array[Float], Buf, Array[Double]] {
      override def zero: Buf = Buf(Array.empty, 0L)

      override def reduce(b: Buf, v: Array[Float]): Buf = {
        if (v != null) {
          if (b.sums.isEmpty) b.sums = new Array[Double](v.length)
          var i = 0
          while (i < v.length && i < b.sums.length) {
            b.sums(i) += v(i); i += 1
          }
          b.n += 1
        }
        b
      }

      override def merge(a: Buf, b: Buf): Buf = {
        if (a.sums.isEmpty) b
        else if (b.sums.isEmpty) a
        else {
          var i = 0
          while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
          a.n += b.n
          a
        }
      }

      override def finish(b: Buf): Array[Double] =
        if (b.n == 0) Array.empty else b.sums.map(_ / b.n)

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Array[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    }

  /** Elementwise fold of Array[Float] vectors with a constant-size
    * buffer — the scale-right way to compute per-dimension corpus bounds
    * (posexplode would shuffle n x d rows; this shuffles one d-length
    * buffer per partition). min/max are EXACT (no rounding), so unlike
    * vectorAvg the result is order-independent and bit-identical to any
    * oracle recomputation. */
  private def elementwiseFold(f: (Float, Float) => Float): Aggregator[Array[Float], Array[Float], Array[Float]] =
    new Aggregator[Array[Float], Array[Float], Array[Float]] {
      override def zero: Array[Float] = Array.empty

      override def reduce(b: Array[Float], v: Array[Float]): Array[Float] =
        if (v == null) b
        else if (b.isEmpty) v.clone()
        else {
          var i = 0
          while (i < b.length && i < v.length) { b(i) = f(b(i), v(i)); i += 1 }
          b
        }

      override def merge(a: Array[Float], b: Array[Float]): Array[Float] =
        reduce(a, b)

      override def finish(b: Array[Float]): Array[Float] = b

      override def bufferEncoder: Encoder[Array[Float]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
      override def outputEncoder: Encoder[Array[Float]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
    }

  /** Per-dimension minimum across vectors (exact, order-independent). */
  val vectorMin: Aggregator[Array[Float], Array[Float], Array[Float]] =
    elementwiseFold(math.min)

  /** Per-dimension maximum across vectors (exact, order-independent). */
  val vectorMax: Aggregator[Array[Float], Array[Float], Array[Float]] =
    elementwiseFold(math.max)
}
