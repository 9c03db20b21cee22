package graft.tools
import graft.operators.Similarity
import org.apache.spark.sql.functions._
/** Dev tool: recall@k of the three ANN paths (IVF exact-in-cell cap,
  * raw-code IVF-PQ, residual IVF-PQ) vs brute-force L2 — the number the
  * unit specs assert ordering on, printed for tuning.
  * Usage: runMain graft.tools.DiagIvfPq [sfDir] */
object DiagIvfPq {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.session("diag")
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // hard cap: the exact-truth pass below is a deliberate O(n^2)
    // crossJoin + driver collect — a dev diagnostic for the sf0.001/0.01
    // fixtures, never a query path. Refuse anything corpus-sized.
    val n = emb.count()
    require(n <= 10000, s"DiagIvfPq computes brute-force exact truth " +
      s"(O(n^2) crossJoin + collect) — refusing $n rows (cap 10000); " +
      "point it at the small fixtures only")
    val queries = emb.filter(col("vec_id") < 5)
    val (nCells, nProbe, m, ksub, k) = (16, 2, 8, 16, 10)
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qv"))
    val c = emb.select(col("vec_id").as("cid"), col("embedding").cast("array<double>").as("cv"))
    val w = Window.partitionBy("qid").orderBy(col("d2"), col("cid"))
    val exact = q.crossJoin(c).filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), aggregate(
        zip_with(col("qv"), col("cv"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x).as("d2"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid").cast("long"), col("cid").cast("long"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val mine = df.select(col("qid").cast("long"), col("cid").cast("long"))
        .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.keys.toSeq.map(qid => (mine.getOrElse(qid, Set.empty) intersect exact(qid)).size.toDouble / k).sum / exact.size
    }
    // IVF with exact in-cell distances = the pruning cap
    println("ivf exact-in-cell recall: " + recall(
      Similarity.ivfTopK(emb, queries, "vec_id", "embedding", nCells, nProbe, k)))
    val cb = Similarity.pqCodebook(emb, "vec_id", "embedding", m, ksub, 2)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", cb, m)
    println("raw ivfpq recall: " + recall(
      Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding", nCells, nProbe, codes, cb, m, k)))
    println("residual ivfpq recall: " + recall(
      Similarity.ivfPqResidualTopK(emb, queries, "vec_id", "embedding", nCells, nProbe, m, ksub, 2, k)))
    spark.stop()
  }
}
