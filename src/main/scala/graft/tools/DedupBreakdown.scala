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
      // ObjectHashAggregate falls back to SORT-based aggregation at 128
      // distinct keys per partition — for the dedup UDAF passes (millions
      // of shingle keys, buffers bounded at cap+1 longs by construction)
      // that means a full sort of the exploded rows. Raise the threshold
      // so the bounded-buffer aggregation stays hash-based; worst-case
      // memory = groups/partition x ~100B, well inside executor budgets.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
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
      val ex = Dedup.shingleRows(docs, "doc_id", "text", 9)
      time("minhash P1 df-cap agg (cap 20)") {
        ex.groupBy("g")
          .agg(graft.functions.CappedSetAgg.cappedDistinct(col("doc_id"), 20).as("__docs"))
          .filter(col("__docs").isNotNull)
          .write.format("noop").mode("overwrite").save()
      }
      time("minhash P2 signatures") {
        Dedup.minhashSignatures(ex, 8, 20)
          .write.format("noop").mode("overwrite").save()
      }
      time("minhash P3 candidates") {
        Dedup.lshCandidates(ex, 8, 2, 20)
          .write.format("noop").mode("overwrite").save()
      }
      time("full q_dedup_minhash") {
        Dedup.lshNearDups(docs, "doc_id", "text", 9, 8, 2, 0.5, 20)
          .write.format("noop").mode("overwrite").save()
      }
      time("full q_dedup_jaccard") {
        Dedup.jaccardPairsFiltered(docs, "doc_id", "text", 9, 0.5, 5)
          .write.format("noop").mode("overwrite").save()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
