package graft.tools

import graft.core.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object IsoBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Any): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"[iso] $label run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val docs = Tables.t(spark, sfDir, "documents")
    val ex = Dedup.shingleRows(docs, "doc_id", "text", 9)
    time("ex.count")(ex.count())
    time("ex groupBy(g,doc).count x")(ex.groupBy("g", "doc_id").agg(count(lit(1))).count())
    time("ex groupBy(g).count")(ex.groupBy("g").agg(count(lit(1))).count())
    time("ex groupBy(g).countDistinct(doc)")(ex.groupBy("g").agg(countDistinct("doc_id")).count())
    time("ex.distinct.count")(ex.distinct().count())
    spark.stop()
  }
}
