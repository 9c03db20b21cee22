package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end through the real file stream source: replay the events
  * parquet fixture with Trigger.AvailableNow and check the windowed result
  * equals the batch computation over the same data.
  */
class StreamingFileSpec extends SparkSpec {

  test("file-source replay of events.parquet matches the batch aggregation") {
    val dir = "/root/testdata/sf0.001"
    val batchEvents = graft.core.Tables.t(spark, dir, "events")
    val schema = batchEvents.schema

    // file stream source needs a DIRECTORY: stage the single fixture file
    val staged = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("part-0.parquet"))

    // streaming read of the same files; ts arrives as nanos long -> micros
    val stream = spark.readStream.schema(
        spark.read.parquet(s"$dir/events.parquet").schema)
      .parquet(staged.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

    val q = EventStreams.tumblingCounts(stream, "1 hour", "1 hour")
      .writeStream.format("memory").queryName("file_replay")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("file_replay")
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    val batch = batchEvents
      .groupBy(window(col("ts"), "1 hour").getField("start").as("ws"), col("event_type"))
      .agg(count(lit(1)).as("n"))

    // append mode only emits windows closed by the watermark: every
    // emitted window must match batch exactly, and some windows must close
    val joined = streamed.join(batch.withColumnRenamed("n", "n_batch"),
      Seq("ws", "event_type"), "left_outer")
    assert(streamed.count() > 0)
    assert(joined.filter(col("n") =!= col("n_batch")).count() == 0)
  }

  test("checkpointed parquet sink resumes exactly-once across restarts") {
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val root = java.nio.file.Files.createTempDirectory("stream_resume")
    val in = root.resolve("in"); val out = root.resolve("out"); val chk = root.resolve("chk")
    java.nio.file.Files.createDirectory(in)
    val n = spark.read.parquet(s"$dir/events.parquet").count()

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(in.toString)
        .select(col("event_id"), col("event_type"))
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", chk.toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    // run 1: one input file -> n rows in the sink
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      in.resolve("f1.parquet"))
    runOnce()
    assert(spark.read.parquet(out.toString).count() == n)

    // restart with NO new files: the checkpoint knows f1 is done — nothing
    // is reprocessed, the sink is unchanged
    runOnce()
    assert(spark.read.parquet(out.toString).count() == n)

    // a new file after restart is processed exactly once
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      in.resolve("f2.parquet"))
    runOnce()
    assert(spark.read.parquet(out.toString).count() == 2 * n)
  }
}
