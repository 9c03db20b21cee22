package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("tumblingCounts aggregates per event-time window with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.tumblingCounts(input.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("update").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "click", 2.0),
        Event(3, ts(12), 2, "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .select(col("event_type"), col("n"), col("sum_value")).collect()
      assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet ==
        Set(("click", 2L, 3.0), ("view", 1L, 3.0)))
    } finally q.stop()
  }

  test("sessionCounts merges events within the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionCounts(input.toDF(), "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 1.0),   // same session (gap 10 < 30)
        Event(3, ts(100), 1, "click", 1.0))  // new session
      q.processAllAvailable()
      val n = spark.table("sessions").select("n_events").as[Long].collect().sorted
      assert(n.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("dedupEvents drops replayed event ids") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.dedupEvents(input.toDF(), "1 hour")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      input.addData(Event(1, ts(0), 1, "click", 1.0), Event(1, ts(0), 1, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 2.0))
      q.processAllAvailable()
      assert(spark.table("deduped").count() == 2)
    } finally q.stop()
  }

  test("stream-stream interval join matches right events within the window") {
    implicit val sqlCtx = spark.sqlContext
    val errors = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = EventStreams.intervalJoin(errors.toDF(), clicks.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("interval_join")
      .outputMode("append").start()
    try {
      clicks.addData(
        Event(1, ts(0), 1, "click", 1.0),    // 12 min before error: outside
        Event(2, ts(5), 1, "click", 5.0),    // 7 min before: inside
        Event(3, ts(20), 1, "click", 9.0),   // after the error: outside
        Event(4, ts(8), 2, "click", 8.0))    // other user
      errors.addData(Event(10, ts(12), 1, "error", 0.0))
      q.processAllAvailable()
      // push watermarks forward so joined results emit in append mode
      clicks.addData(Event(5, ts(200), 9, "click", 0.0))
      errors.addData(Event(11, ts(200), 9, "error", 0.0))
      q.processAllAvailable()
      val got = spark.table("interval_join")
        .filter(col("l_id") === 10).select("r_id").as[Long].collect().toSet
      assert(got == Set(2L))
    } finally q.stop()
  }

  test("latestPerKeyStream keeps per-key latest across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.latestPerKeyStream(input.toDS())
      .writeStream.format("memory").queryName("latest")
      .outputMode("update").start()
    try {
      input.addData(Event(1, ts(0), 1, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(2, ts(5), 1, "click", 9.0), Event(3, ts(2), 1, "click", 4.0))
      q.processAllAvailable()
      val latest = spark.table("latest")
        .groupBy("user_id", "event_type").agg(max_by(col("event_id"), col("ts")).as("eid"))
        .select("eid").as[Long].collect()
      assert(latest.toSeq == Seq(2L))
    } finally q.stop()
  }

  test("upsertSink merges micro-batches into the versioned warehouse idempotently") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("stream_upsert")
    val table = root.resolve("t").toString

    // seed the versioned table: one existing row that a batch will update
    graft.tools.EtlCli.writeTable(
      Seq((1L, "stale", 0.0)).toDF("k", "v", "p"), table)

    def runBatch(rows: (Long, String, Double)*): Unit = {
      val input = MemoryStream[(Long, String, Double)]
      input.addData(rows: _*)
      val q = EventStreams.upsertSink(
        input.toDF().toDF("k", "v", "p"), table,
        keys = Seq("k"), mutableCols = Seq("v", "p"),
        checkpointDir = java.nio.file.Files.createTempDirectory("chk").toString)
      q.awaitTermination(120000)
    }

    // batch 1: update key 1, insert key 2
    runBatch((1L, "fresh", 1.5), (2L, "new", 2.5))
    val after1 = graft.tools.EtlCli.readTable(spark, table)
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(after1.toSeq == Seq((1L, "fresh", 1.5), (2L, "new", 2.5)))

    // REPLAY of the same data (at-least-once delivery): table unchanged —
    // the idempotent merge is what makes the sink effectively exactly-once
    runBatch((1L, "fresh", 1.5), (2L, "new", 2.5))
    val after2 = graft.tools.EtlCli.readTable(spark, table)
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(after2.toSeq == after1.toSeq)
  }
}
