package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-memory distinct-set aggregation for document-frequency capping
  * (the shared primitive of the MinHash and prefix-filter dedup pipelines,
  * SURVEY.md §2.8): `cappedDistinct(cap)` collects the distinct values of a
  * group ONLY while the group stays at or below `cap` distinct elements;
  * one element past the cap the buffer degenerates to a constant-size
  * overflow marker and stops storing.
  *
  * Why not collect_set + size filter: collect_set materializes the FULL
  * set in the aggregation buffer before the filter runs, so one hot key
  * (a stopword-run shingle with df in the millions at 100 TB) holds its
  * whole posting list in executor memory. This buffer is bounded at
  * cap+1 longs per group at every stage — partial, shuffle, and merge —
  * so the aggregation survives arbitrarily skewed key frequencies; it
  * also replaces the two-pass plan (countDistinct + semi-join back) with
  * a single pass over the exploded rows.
  *
  * Output: the sorted distinct values for groups with <= cap distinct
  * elements, null for overflowed groups (filter with isNotNull).
  */
object CappedSetAgg {

  /** Mutable bounded buffer: `vals` holds up to cap+1 distinct elements;
    * length cap+1 means overflow (true count is > cap, content stale). */
  final case class Buf(var vals: Array[Long], var cap: Int)

  private final class CappedDistinct(cap: Int)
      extends Aggregator[java.lang.Long, Buf, Array[Long]] {
    private val limit = cap + 1

    override def zero: Buf = Buf(Array.empty, cap)

    // Boxed input: a null value must be SKIPPED (countDistinct semantics),
    // not deserialized to 0L and inserted as a phantom element.
    override def reduce(b: Buf, boxed: java.lang.Long): Buf = {
      if (boxed == null) return b
      val v = boxed.longValue()
      if (b.vals.length < limit && !b.vals.contains(v)) {
        val next = new Array[Long](b.vals.length + 1)
        System.arraycopy(b.vals, 0, next, 0, b.vals.length)
        next(b.vals.length) = v
        b.vals = next
      }
      b
    }

    override def merge(a: Buf, b: Buf): Buf = {
      if (a.vals.length >= limit) a
      else if (b.vals.length >= limit) b
      else {
        var i = 0
        while (i < b.vals.length && a.vals.length < limit) {
          reduce(a, b.vals(i)); i += 1
        }
        a
      }
    }

    override def finish(b: Buf): Array[Long] =
      if (b.vals.length >= limit) null else b.vals.sorted

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** DataFrame-side column function: distinct set of `col` if the group has
    * <= cap distinct values, else null. */
  def cappedDistinct(col: Column, cap: Int): Column =
    udaf(new CappedDistinct(cap)).apply(col)
}
