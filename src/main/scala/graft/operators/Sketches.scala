package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches for corpus-scale streams (Cormode &
  * Muthukrishnan, "An improved data stream summary: the count-min sketch
  * and its applications", J. Algorithms '05).
  *
  * The sketch table is (row j, bucket, cnt) with depth x width cells —
  * CONSTANT size regardless of corpus scale, built by one partial-agg'd
  * shuffle whose key space is the depth x width cells (map-side combine
  * does all the heavy lifting; no token string ever shuffles). Cells are
  * plain additive counts, so sketches merge by summing — per-partition,
  * per-batch, or per-day sketches union freely, which is the whole point
  * at 100 TB (build tiny per-shard summaries, merge, answer frequency
  * queries without touching the corpus again).
  *
  * Hashes are md5-band derived (TextAnalysis.md5Bucket shape), so an
  * external engine recomputes the identical sketch — estimates are
  * hash-checkable, not just bounded. CMS guarantees est >= true count
  * (over-estimation only, from collisions).
  */
object Sketches {

  /** Row-j bucket of a token: md5 two-hex-char band of "j:token", mod
    * width (width <= 256 keeps the band uniform). */
  def cmsBucket(tok: Column, j: Int, width: Int): Column = {
    require(width > 0 && width <= 256, s"width must be in [1,256], got $width")
    pmod(TextAnalysis.md5Bucket(concat(lit(s"$j:"), tok)), lit(width))
  }

  /** Build the (j, bucket, cnt) sketch over a token column. */
  def cmsSketch(toks: DataFrame, tokCol: String, depth: Int, width: Int): DataFrame =
    toks.select(posexplode(array(
        (0 until depth).map(j => cmsBucket(col(tokCol), j, width)): _*))
        .as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-query the sketch for each probe token: est = min over rows of
    * the token's cell (absent cells read 0). The sketch is depth x width
    * rows — broadcast; probes never touch the corpus. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, tokCol: String,
                  depth: Int, width: Int): DataFrame =
    probes.select(col(tokCol),
        posexplode(array((0 until depth).map(j => cmsBucket(col(tokCol), j, width)): _*))
          .as(Seq("j", "bucket")))
      .join(broadcast(sketch), Seq("j", "bucket"), "left_outer")
      .groupBy(col(tokCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
}
