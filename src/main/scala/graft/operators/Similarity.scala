package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Two paths:
  *  - bruteForceTopK: exact cosine top-k, O(|queries| x |corpus|). The
  *    baseline; right answer when |queries| is small (queries broadcast).
  *  - signLsh*: random-hyperplane LSH — deterministic md5-derived
  *    hyperplane signs, bucket vectors by an nBits-bit signature, search
  *    only within buckets. The 100 TB path: signature is a narrow per-row
  *    expression, the join keys on the bucket.
  *
  * Numerical determinism: dot products are floor-quantized to integers at
  * 1e12 and summed exactly (associative), so scores are bit-identical
  * regardless of partitioning — and to the DuckDB oracle.
  */
object Similarity {

  /** Quantization scale for vector math: 12 fractional digits (see
    * graft.functions.Fns — floor-quantized integer sums are the only
    * double-aggregation both engines compute bit-identically). */
  private val VScale = 1e12

  /** Engine-portable exact sum of a double expression at VScale. */
  private def vsum(c: Column): Column =
    sum(floor(c * lit(VScale) + lit(0.5)).cast(LongType)) / lit(VScale)

  /** (id, d, x) exploded view of a vector column, x widened to double;
    * input is spread across the cluster first (the explode fans out 64x). */
  def explodeDims(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    graft.core.Tables.ensureParallelism(df)
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("d", "x")))
      .select(col(idCol), col("d"), col("x").cast(DoubleType).as("x"))

  /** L2 norm per id, computed with exact decimal accumulation. */
  def norms(dims: DataFrame, idCol: String): DataFrame =
    dims.groupBy(idCol)
      .agg(sqrt(vsum(col("x") * col("x"))).as("norm"))

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (self-matches excluded). Query side should be small; the
    * dimension-join runs queries x corpus x dims through a partial-agg
    * friendly groupBy.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val cd = explodeDims(corpus, idCol, vecCol).toDF("cid", "d", "cx")
    val qd = explodeDims(queries, idCol, vecCol).toDF("qid", "d", "qx")
    val dots = qd.join(cd, "d")
      .filter(col("qid") =!= col("cid"))
      .groupBy("qid", "cid")
      .agg(vsum(col("qx") * col("cx")).as("dot"))
    val cn = norms(cd.toDF("cid", "d", "x"), "cid").toDF("cid", "cnorm")
    val qn = norms(qd.toDF("qid", "d", "x"), "qid").toDF("qid", "qnorm")
    val scored = dots.join(broadcast(qn), "qid").join(cn, "cid")
      .select(col("qid"), col("cid"),
        (col("dot") / (col("qnorm") * col("cnorm"))).as("cosine"))
    val w = Window.partitionBy("qid").orderBy(desc("cosine"), col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("cosine"), col("rank").cast(IntegerType).as("rank"))
  }

  /** Deterministic hyperplane sign for (hyperplane h, dimension d): the
    * high bit of md5("h:d")'s first hex char — portable across engines. */
  private def planeSign(h: Int, d: Column): Column =
    when(substring(md5(concat(lit(s"$h:"), d.cast(StringType))), 1, 1) >= "8", lit(1.0))
      .otherwise(lit(-1.0))

  /** nBits-bit sign-LSH bucket id per vector: bit h = [dot(v, plane_h) > 0].
    * Computed from the exploded dims with one groupBy (partial-agg
    * friendly); exact decimal accumulation keeps bucketing deterministic.
    */
  def signLshBuckets(df: DataFrame, idCol: String, vecCol: String, nBits: Int): DataFrame = {
    val dims = explodeDims(df, idCol, vecCol)
    val proj = (0 until nBits).map { h =>
      vsum(col("x") * planeSign(h, col("d"))).as(s"p_$h")
    }
    dims.groupBy(idCol).agg(proj.head, proj.tail: _*)
      .select(col(idCol),
        (0 until nBits).map { h =>
          when(col(s"p_$h") > 0, shiftleft(lit(1L), h)).otherwise(lit(0L))
        }.reduce(_ + _).cast(LongType).as("bucket"))
  }

  /** LSH-bucketed near-neighbor pairs: same-bucket candidate pairs with
    * exact cosine verification. At scale, the only shuffle keys on the
    * bucket id (skew-safe for nBits >= ~16 via AQE skew split).
    */
  def lshNeighborPairs(df: DataFrame, idCol: String, vecCol: String, nBits: Int,
                       minCosine: Double): DataFrame = {
    val buckets = signLshBuckets(df, idCol, vecCol, nBits).toDF("id", "bucket")
    val cands = buckets.as("a").join(buckets.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val dims = explodeDims(df, idCol, vecCol).toDF("id", "d", "x")
    val n = norms(dims, "id")
    val dots = cands.join(dims.toDF("id_a", "d", "xa"), "id_a")
      .join(dims.toDF("id_b", "d", "xb"), Seq("id_b", "d"))
      .groupBy("id_a", "id_b")
      .agg(vsum(col("xa") * col("xb")).as("dot"))
    dots
      .join(n.toDF("id_a", "na"), "id_a")
      .join(n.toDF("id_b", "nb"), "id_b")
      .select(col("id_a"), col("id_b"), (col("dot") / (col("na") * col("nb"))).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** IVF (inverted-file) ANN — the second scale path alongside sign-LSH:
    * a coarse quantizer of `nCells` cells (deterministic seed centroids =
    * the first nCells vectors by id; optional quantized-mean refinement
    * iterations), every vector assigned to its nearest cell, queries probe
    * only the `nProbe` closest cells. Metric: squared L2 with quantized
    * sums, so assignment and ranking are bit-deterministic. At scale the
    * cell assignment is one (vectors x cells) partial-agg groupBy and the
    * search touches |probed cells| of the corpus.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              nCells: Int, nProbe: Int, k: Int, refineIters: Int = 0): DataFrame = {
    val dims = explodeDims(corpus, idCol, vecCol).toDF("vid", "d", "x")
    var cent = dims.filter(col("vid") < nCells).toDF("cc", "d", "cx")
    def cellDist(v: DataFrame): DataFrame = v.join(cent, "d")
      .groupBy(col(v.columns.head), col("cc"))
      .agg(vsum((col("x") - col("cx")) * (col("x") - col("cx"))).as("d2"))
    def assign(v: DataFrame): DataFrame = {
      val w = Window.partitionBy(v.columns.head).orderBy(col("d2"), col("cc"))
      cellDist(v).withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col(v.columns.head), col("cc").as("cell"))
    }
    (0 until refineIters).foreach { _ =>
      cent = assign(dims).join(dims, "vid")
        .groupBy(col("cell").as("cc"), col("d"))
        .agg((vsum(col("x")) / count(lit(1))).as("cx"))
        .select("cc", "d", "cx")
    }
    val cells = assign(dims)
    val qd = explodeDims(queries, idCol, vecCol).toDF("qid", "d", "x")
    val wProbe = Window.partitionBy("qid").orderBy(col("d2"), col("cc"))
    val probes = cellDist(qd).withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe).select(col("qid"), col("cc").as("cell"))
    val cands = probes.join(cells.toDF("cid", "cell"), "cell")
      .filter(col("qid") =!= col("cid")).select("qid", "cid")
    val dists = cands
      .join(qd.toDF("qid", "d", "qx"), "qid")
      .join(dims.toDF("cid", "d", "cx2"), Seq("cid", "d"))
      .groupBy("qid", "cid")
      .agg(vsum((col("qx") - col("cx2")) * (col("qx") - col("cx2"))).as("dist"))
    val wK = Window.partitionBy("qid").orderBy(col("dist"), col("cid"))
    dists.withColumn("rank", row_number().over(wK)).filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("dist"), col("rank").cast(IntegerType).as("rank"))
  }

  /** Lloyd's k-means over the embedding column with the deterministic
    * quantized framework: seed centroids = first k vectors by id,
    * assignments by quantized squared-L2 argmin (ties to the lower cell
    * id), centroid updates by quantized means — every iteration is
    * bit-reproducible regardless of partitioning. Returns (id, cell)
    * assignments after `iters` update steps. Each iteration: one
    * (vectors x centroids) partial-agg groupBy + one mean groupBy.
    */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String, k: Int,
                   iters: Int): DataFrame = {
    val dims = explodeDims(df, idCol, vecCol).toDF("vid", "d", "x")
    var cent = dims.filter(col("vid") < k).toDF("cc", "d", "cx")
    def assign(): DataFrame = {
      val w = Window.partitionBy("vid").orderBy(col("d2"), col("cc"))
      dims.join(cent, "d")
        .groupBy("vid", "cc")
        .agg(vsum((col("x") - col("cx")) * (col("x") - col("cx"))).as("d2"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("vid"), col("cc").as("cell"))
    }
    (0 until iters).foreach { _ =>
      cent = assign().join(dims, "vid")
        .groupBy(col("cell").as("cc"), col("d"))
        .agg((vsum(col("x")) / count(lit(1))).as("cx"))
    }
    assign().toDF(idCol, "cell")
  }

  /** Per-group centroid of an embedding column: exact decimal mean per
    * dimension. Output: (group, d, centroid). */
  def centroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("d", "x")))
      .select(col(groupCol), col("d"), col("x").cast(DoubleType).as("x"))
      .groupBy(groupCol, "d")
      .agg((vsum(col("x")) / count(lit(1))).as("centroid"))
}
