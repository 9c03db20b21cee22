package graft.tools

import graft.core.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: stage-by-stage timing of the q_keep_best path. */
object DiagKeepBest {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val docs = Tables.t(spark, sfDir, "documents")
      val pairs = Dedup.lshNearDups(docs, "doc_id", "text",
        k = 9, numHashes = 8, bandSize = 2, threshold = 0.5, dfCap = 20)
      val pinned = time("tower pin")(graft.core.Materialize.pin(
        pairs.select(col("doc_a"), col("doc_b"))))
      println(s"[diag] pairs = ${pinned.count()}")
      val comps = time("connectedComponents")(Dedup.connectedComponents(pinned))
      val out = time("keepBest joins")(
        Dedup.keepBestPerCluster(docs, pinned, "doc_id", col("n_chars")))
      time("final noop write")(
        out.select(col("doc_id"), col("n_chars")).orderBy(col("doc_id"))
          .write.format("noop").mode("overwrite").save())
      comps.unpersist()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    (1 to 2).foreach { round =>
      println(s"--- query-path round $round ---")
      time("q_keep_best full")(
        graft.SparkEntry.queries("q_keep_best")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      time("q_pagerank full")(
        graft.SparkEntry.queries("q_pagerank")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
