package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch sessionization + event-stream-shaped operators over the `events`
  * table. (The reference has no streaming engine — SURVEY.md §2.9; these
  * give its incremental-ingest semantics a real event-time treatment. The
  * Structured Streaming variants live in graft.streaming.)
  *
  * Gap-based sessionization is the classic two-window pattern: lag() to
  * flag gaps, running sum to number sessions. Both windows partition by
  * user, so the whole thing is ONE shuffle on user_id — at 100 TB this
  * scales as long as a single user's history fits a partition (true for
  * event data; otherwise pre-split by (user, day)).
  */
object Sessionize {

  /** Assign a session id per (user, gap>maxGapSeconds) boundary.
    * Adds `session_seq` (1-based per user). Epoch seconds are floored,
    * which is engine-portable (micros vs nanos precision cancels out).
    */
  def assignSessions(events: DataFrame, userCol: String, tsCol: String,
                     maxGapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col("__sec"), col("event_id"))
    events
      .withColumn("__sec", unix_timestamp(col(tsCol)))
      .withColumn("__gap",
        when(col("__sec") - lag(col("__sec"), 1).over(byUser) > maxGapSeconds, lit(1))
          .otherwise(lit(0)))
      .withColumn("session_seq",
        sum(col("__gap")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)) + lit(1))
      .drop("__gap")
  }

  /** Per-user session stats: session count, events, longest session. */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   maxGapSeconds: Long): DataFrame = {
    val s = assignSessions(events, userCol, tsCol, maxGapSeconds)
    val perSession = s.groupBy(col(userCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
           (max(col("__sec")) - min(col("__sec"))).as("duration_sec"))
    perSession.groupBy(userCol)
      .agg(count(lit(1)).as("n_sessions"),
           sum(col("n_events")).as("n_events"),
           max(col("n_events")).as("max_session_events"),
           max(col("duration_sec")).as("max_session_sec"))
  }

  /** Tumbling event-time window aggregation (batch analog of
    * `groupBy(window($"ts", "1 hour"))`): bucket label is a formatted
    * string so results are engine/timezone-portable. */
  def tumblingCounts(events: DataFrame, tsCol: String, keyCol: String,
                     valueCol: Column): DataFrame =
    events.groupBy(
        date_format(date_trunc("hour", col(tsCol)), "yyyy-MM-dd HH:00").as("bucket"),
        col(keyCol))
      .agg(count(lit(1)).as("n"), valueCol.as("sum_value"))

  /** Keep only each key's latest event (stateful-dedup analog,
    * deterministic tie-break on event_id). */
  def latestPerKey(events: DataFrame, keyCols: Seq[String], tsCol: String): DataFrame =
    Relational.argmaxPerGroup(events, keyCols, Seq(desc(tsCol), desc("event_id")))
}
