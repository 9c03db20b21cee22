package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Per-run task-metric rollup: jobs/stages/tasks, summed task wall, executor
  * compute (run - shuffle fetch - ser/deser), shuffle bytes both ways.
  * Everything here is dev-only instrumentation — never on the bench path.
  */
class ProfileListener extends org.apache.spark.scheduler.SparkListener {
  private val a = new java.util.concurrent.atomic.AtomicLongArray(9)
  def reset(): Unit = (0 until 9).foreach(a.set(_, 0L))
  override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
    a.incrementAndGet(0)
  override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
    a.incrementAndGet(1)
  override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
    a.incrementAndGet(2)
    val m = t.taskMetrics
    if (m != null) {
      a.addAndGet(3, m.executorRunTime)
      a.addAndGet(4, m.executorDeserializeTime + m.resultSerializationTime)
      a.addAndGet(5, m.shuffleReadMetrics.fetchWaitTime)
      a.addAndGet(6, m.shuffleReadMetrics.totalBytesRead)
      a.addAndGet(7, m.shuffleWriteMetrics.bytesWritten)
      a.addAndGet(8, m.jvmGCTime)
    }
  }
  def summary: String = {
    f"jobs=${a.get(0)} stages=${a.get(1)} tasks=${a.get(2)} " +
      f"taskRun=${a.get(3) / 1e3}%.2fs deser=${a.get(4) / 1e3}%.2fs " +
      f"fetchWait=${a.get(5) / 1e3}%.2fs gc=${a.get(8) / 1e3}%.2fs " +
      f"shufR=${a.get(6) / 1048576.0}%.1fMiB shufW=${a.get(7) / 1048576.0}%.1fMiB"
  }
}

/** Dev profiler: time one or more named queries and print/dump the formatted
  * plan. The session is wired EXACTLY like graft.Bench's (shuffle partitions,
  * AQE coalescing mode, object-hash threshold, TopKRewrite) so a plan or a
  * timing read here transfers to the bench.
  *
  * Usage: runMain graft.tools.Profile <sfDir> <q1> [q2 ...]
  *   PROFILE_EXPLAIN=1      print each query's formatted plan to stdout
  *   PROFILE_PLAN_DIR=dir   additionally write <dir>/<query>_<tag>.txt
  *   PROFILE_PLAN_TAG=tag   filename suffix for the plan dump (default "plan")
  *   PROFILE_RUNS=n         measured runs per query (default 3)
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // A/B experiment knobs: PROFILE_CONF="spark.x=1;spark.y=2"
    val extraConf = sys.env.get("PROFILE_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val builder0 = SparkSession.builder()
      .config("spark.sql.codegen.cache.maxEntries",
        graft.core.Graft.CodegenCacheMaxEntries)
    graft.core.Graft.localScratchDir.foreach(d => builder0.config("spark.local.dir", d))
    extraConf.foreach { case (k, v) => builder0.config(k, v) }
    val spark = builder0
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "false"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.plans.TopKRewrite.install(spark)
    spark.sparkContext.setLogLevel("WARN")
    // Where a query's wall-clock goes: scheduling+driver (wall - maxConcurrentTaskTime),
    // executor compute, shuffle. Aggregated per measured run via a listener.
    val metrics = new ProfileListener
    spark.sparkContext.addSparkListener(metrics)
    val runs = sys.env.get("PROFILE_RUNS").map(_.toInt).getOrElse(3)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (sys.env.contains("PROFILE_EXPLAIN")) fn(spark, sfDir).explain("formatted")
      sys.env.get("PROFILE_PLAN_DIR").foreach { dir =>
        val tag = sys.env.getOrElse("PROFILE_PLAN_TAG", "plan")
        val p = java.nio.file.Paths.get(dir)
        java.nio.file.Files.createDirectories(p)
        val txt = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(p.resolve(s"${name}_$tag.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      (1 to runs).foreach { i =>
        metrics.reset()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let the listener bus drain before reading the rollup
        println(f"[profile] $name run$i $wall%.2f s  ${metrics.summary}")
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }
    spark.stop()
  }
}
