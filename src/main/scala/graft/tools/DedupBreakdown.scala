package graft.tools

import graft.core.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: phase-by-phase timing of the dedup pipelines at one SF dir. */
object DedupBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
        val m = i.taskMetrics
        stages.add(f"stage ${i.stageId}%4d tasks=${i.numTasks}%4d wall=${ms}ms run=${m.executorRunTime}ms cpu=${m.executorCpuTime / 1000000}ms deser=${m.executorDeserializeTime}ms ${i.name.take(40)}")
      }
    })

    def time[T](label: String)(f: => T): T = {
      stages.clear()
      val t0 = System.nanoTime(); val r = f
      println(f"[breakdown] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      stages.forEach(s => println(s"  $s"))
      r
    }

    (1 to 3).foreach { pass =>
      println(s"--- pass $pass ---")
      val docs = Tables.t(spark, sfDir, "documents")
      val ex = time("shingleRows.count") {
        val e = Dedup.shingleRows(docs, "doc_id", "text", 9); e.count(); e
      }
      val rare = time("rare agg (df<=5)") {
        val r = ex.groupBy("g").agg(countDistinct("doc_id").as("f"))
          .filter(col("f") <= 5).select("g")
        r.count(); r
      }
      val rareEx = ex.join(rare, "g").select("doc_id", "g").distinct()
      val cands = time("cands self-join + checkpoint") {
        rareEx.as("a").join(rareEx.as("b"),
            col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct().localCheckpoint(true)
      }
      time("full q_dedup_jaccard") {
        Dedup.jaccardPairsFiltered(docs, "doc_id", "text", 9, 0.5, 5)
          .write.format("noop").mode("overwrite").save()
      }
      time("full q_dedup_minhash") {
        Dedup.lshNearDups(docs, "doc_id", "text", 9, 8, 2, 0.5, 20)
          .write.format("noop").mode("overwrite").save()
      }
      cands.unpersist()
    }
    spark.stop()
  }
}
