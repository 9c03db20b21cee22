package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming operators over the events stream (SURVEY.md §2.9
  * extension: the reference's incremental micro-batch ingest, given real
  * event-time semantics — watermarks, windowed aggregation, session
  * windows, stateful dedup).
  *
  * All transforms take/return streaming DataFrames; batch DataFrames work
  * too (same API), which is how the EventQueries batch analogs stay in
  * lockstep.
  */
object EventStreams {

  /** Tumbling event-time window counts + sums with a watermark bounding
    * state: late events beyond `lateness` are dropped, window state is
    * evicted once the watermark passes. */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
                     lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Gap-based session windows per user (Spark's built-in session_window:
    * state merges adjacent events until a `gap` of silence). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  /** Exactly-once-per-key event dedup within the watermark horizon —
    * the streaming version of the idempotent-ingest insert-if-absent. */
  def dedupEvents(events: DataFrame, lateness: String = "1 hour"): DataFrame =
    events.withWatermark("ts", lateness).dropDuplicates("event_id")

  /** Stream-stream interval join: each left event matches right events of
    * the same user within `[left.ts - window, left.ts]`. Both sides carry
    * watermarks so join state is bounded and evicted — the streaming
    * generalization of the batch as-of/range joins. */
  def intervalJoin(left: DataFrame, right: DataFrame, window: String,
                   lateness: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("ts", lateness)
      .select(col("user_id"), col("event_id").as("l_id"), col("ts").as("l_ts"))
    val r = right.withWatermark("ts", lateness)
      .select(col("user_id").as("r_user"), col("event_id").as("r_id"),
              col("ts").as("r_ts"), col("value").as("r_value"))
    l.join(r,
      col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $window") &&
        col("r_ts") <= col("l_ts"))
      .select(col("user_id"), col("l_id"), col("l_ts"), col("r_id"), col("r_value"))
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class KeyedLatest(user_id: Long, event_type: String,
                               event_id: Long, ts: Timestamp, value: Double)

  /** Streaming CDC-style upsert sink: each micro-batch merges into a
    * versioned warehouse table via the same idempotent first-wins upsert
    * the batch ETL uses (insert-if-absent + update-mutable), committed
    * atomically (EtlCli's staged-version + marker layout). foreachBatch
    * is the standard Structured Streaming escape hatch for sinks Spark
    * cannot express declaratively; idempotence of the merge makes batch
    * REPLAYS safe (at-least-once delivery -> exactly-once table state),
    * which is the actual exactly-once contract at 100 TB.
    *
    * Returns a started DataStreamWriter-driven query; caller awaits. */
  def upsertSink(incoming: DataFrame, tablePath: String, keys: Seq[String],
                 mutableCols: Seq[String], checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val target = graft.tools.EtlCli.readTable(spark, tablePath)
        val merged = graft.operators.Relational.upsert(
          target, batch, keys, mutableCols,
          incomingOrder = keys.map(col))
        // writeTable stages the merge into a NEW version dir (reading the
        // current one), then commits atomically — no barrier needed
        graft.tools.EtlCli.writeTable(merged, tablePath)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Custom stateful operator: latest event per (user, type) maintained in
    * GroupState (flatMapGroupsWithState, Update mode) — the streaming
    * analog of EventQueries.q_events_latest and the pattern slot for any
    * reference-lacking stateful semantics (SURVEY.md §7.4).
    */
  def latestPerKeyStream(events: Dataset[Event]): Dataset[KeyedLatest] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[KeyedLatest, KeyedLatest](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case ((uid, etype), batch, state: GroupState[KeyedLatest]) =>
          val candidates = state.getOption.iterator ++ batch.map(e =>
            KeyedLatest(uid, etype, e.event_id, e.ts, e.value))
          val latest = candidates.maxBy(k => (k.ts.getTime, k.event_id))
          val changed = !state.getOption.contains(latest)
          state.update(latest)
          if (changed) Iterator(latest) else Iterator.empty
      }
  }
}
