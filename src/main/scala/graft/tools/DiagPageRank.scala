package graft.tools

import graft.core.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: phase-by-phase timing of the q_pagerank path. */
object DiagPageRank {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.Fns
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { round =>
      println(s"--- query-path round $round ---")
      val q = time("queries map")(graft.SparkEntry.queries("q_pagerank"))
      val df = time("lambda (plan build + pins)")(q(spark, sfDir))
      time("q_pagerank write")(df.write.format("noop").mode("overwrite").save())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    (1 to 2).foreach { round =>
      println(s"--- lib-path round $round ---")
      val pairs = time("lshNearDups build")(
        Dedup.lshNearDups(Tables.t(spark, sfDir, "documents"), "doc_id", "text",
          k = 9, numHashes = 8, bandSize = 2, threshold = 0.5, dfCap = 20))
      val pr = time("pageRank call")(Dedup.pageRank(pairs, iters = 5, damping = 0.85))
      time("lib write")(pr.orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val docs = Tables.t(spark, sfDir, "documents")
      val pairs = Dedup.lshNearDups(docs, "doc_id", "text",
        k = 9, numHashes = 8, bandSize = 2, threshold = 0.5, dfCap = 20)
      val p = time("tower pin")(graft.core.Materialize.pin(
        pairs.select(col("doc_a"), col("doc_b"))))
      val edges = p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionAll(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      val deg = time("deg pin")(graft.core.Materialize.pin(
        edges.groupBy(col("src").as("doc_id")).agg(count(lit(1)).as("deg"))))
      val n = time("n count")(deg.count())
      val edgesWithDeg = time("edgesWithDeg pin")(graft.core.Materialize.pin(
        edges.join(deg.select(col("doc_id").as("dst"), col("deg").as("dst_deg")), Seq("dst"))))
      val teleport = (1.0 - 0.85) / n
      var pr = deg.select(col("doc_id"), lit(1.0 / n).as("pr"), col("deg"))
      (1 to 5).foreach { i =>
        val contribs = pr
          .select(col("doc_id").as("src"), (col("pr") / col("deg")).as("c"))
        pr = edgesWithDeg.join(contribs, Seq("src"))
          .groupBy(col("dst").as("doc_id"))
          .agg(Fns.dsum(col("c"), 1e12).as("s"), min("dst_deg").as("deg"))
          .select(col("doc_id"),
            (lit(teleport) + lit(0.85) * col("s")).as("pr"), col("deg"))
        if (i % 2 == 0 || i == 5)
          pr = time(s"pin round $i")(graft.core.Materialize.pin(pr))
      }
      time("final write")(pr.select(col("doc_id"), col("pr")).orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
