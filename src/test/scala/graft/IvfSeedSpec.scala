package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Measures WHY the IVF coarse quantizer seeds by hash-rank instead of
  * lowest ids: on a corpus whose id prefix is homogeneous (ingest order =
  * crawl order — the common 100 TB case), id-ordered seeds all land in one
  * tight cluster, the coarse cells collapse, and nProbe recall degrades.
  *
  * Both measurements run the REAL ivfTopK code path. Labeling A is the
  * natural one (hash-rank seeds = a uniform sample). Labeling B applies an
  * adversarial id permutation that relabels the planted cluster with
  * exactly the 16 hash-rank-first ids — under it, hash-rank seeding
  * behaves exactly like the old id-ordered seeding did on a clustered
  * corpus (every seed is a near-identical cluster member). The geometry is
  * identical in both labelings, so the recall gap isolates the seeding
  * policy.
  */
class IvfSeedSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("hash-rank seeding: recall on a crawl-prefix-clustered corpus beats id-ordered seeding") {
    val n = 200
    val nCells = 16
    val (nProbe, k) = (2, 10)
    // original index 0..15: one tight cluster (the homogeneous crawl
    // prefix); the noise must be pseudo-random per (index, dim) — with
    // LINEAR noise the collapsed centroids differ along one direction,
    // every vector argmins to one of 2 cells, and nProbe=2 trivially
    // covers them. 16..199: deterministic spread directions.
    def noise(i: Int, d: Int): Float =
      (((i * 1000003 + d * 7919) * 2654435761L) % 997).toInt * 1e-6f
    def vec(i: Int): Array[Float] =
      if (i < 16) Array.tabulate(8)(d => (if (d == 0) 1.0f else 0.0f) + noise(i, d))
      else Array.tabulate(8)(d => math.sin(1.0 + i * (d + 1) * 0.7).toFloat)

    // labeling B's permutation: the 16 hash-rank-first ids get the cluster
    val low16 = (0 until n).map(_.toLong).sortBy(id => (md5hex(id.toString), id)).take(16)
    val rest = (0 until n).map(_.toLong).filterNot(low16.toSet)
    val permB: Map[Int, Long] =
      ((0 until 16).map(i => i -> low16(i)) ++
        (16 until n).map(i => i -> rest(i - 16))).toMap

    // recall of ivfTopK vs exact L2 top-k, computed within one labeling
    // (tie-breaks stay internally consistent)
    def recall(label: Int => Long): Double = {
      val df = (0 until n).map(i => (label(i), vec(i))).toDF("vec_id", "embedding")
      // queries: 5 spread vectors (original indices 20..24), by their labels
      val qIds = (20 until 25).map(label)
      val queries = df.filter(col("vec_id").isin(qIds: _*))
      val got = Similarity.ivfTopK(df, queries, "vec_id", "embedding", nCells, nProbe, k)
        .select(col("qid").cast("long"), col("cid").cast("long"))
        .as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      import org.apache.spark.sql.expressions.Window
      val q = queries.select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qv"))
      val c = df.select(col("vec_id").as("cid"), col("embedding").cast("array<double>").as("cv"))
      val w = Window.partitionBy("qid").orderBy(col("d2"), col("cid"))
      val exact = q.crossJoin(c).filter(col("qid") =!= col("cid"))
        .select(col("qid"), col("cid"), aggregate(
          zip_with(col("qv"), col("cv"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).as("d2"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select(col("qid").cast("long"), col("cid").cast("long"))
        .as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.keys.toSeq.map(qid =>
        (got.getOrElse(qid, Set.empty) intersect exact(qid)).size.toDouble / k)
        .sum / exact.size
    }

    val recallHash = recall(i => i.toLong)   // natural labels: uniform seeds
    val recallById = recall(permB)           // adversarial labels ≡ id-seeding
    assert(recallHash >= recallById - 1e-9,
      s"hash-rank recall $recallHash below id-seed-equivalent $recallById")
    assert(recallHash >= 0.3, s"hash-rank recall degenerate: $recallHash")
    // the planted skew must actually bite, or this spec proves nothing
    assert(recallById <= 0.9,
      s"fixture failed: collapsed seeds still reach recall $recallById")
  }
}
