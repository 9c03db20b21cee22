package graft

import graft.operators.Sessionize
import java.sql.Timestamp

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  // user 1: two sessions (gap of 60 min between minute 10 and 70);
  // user 2: one session.
  private def events = Seq(
    (1L, 100L, ts(0)), (1L, 101L, ts(10)), (1L, 102L, ts(70)), (1L, 103L, ts(75)),
    (2L, 200L, ts(0)), (2L, 201L, ts(20))
  ).toDF("user_id", "event_id", "ts")

  test("assignSessions splits on gaps > threshold") {
    val got = Sessionize.assignSessions(events, "user_id", "ts", maxGapSeconds = 1800)
      .orderBy("user_id", "event_id")
      .select("user_id", "event_id", "session_seq")
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      (1L, 100L, 1L), (1L, 101L, 1L), (1L, 102L, 2L), (1L, 103L, 2L),
      (2L, 200L, 1L), (2L, 201L, 1L)))
  }

  test("sessionStats aggregates per user") {
    val got = Sessionize.sessionStats(events, "user_id", "ts", maxGapSeconds = 1800)
      .orderBy("user_id")
      .select("user_id", "n_sessions", "n_events", "max_session_events")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L, 4L, 2L), (2L, 1L, 2L, 2L)))
  }

  test("latestPerKey keeps one row per key") {
    val df = Seq(
      (1L, "click", 10L, ts(0)), (1L, "click", 11L, ts(5)),
      (1L, "view", 12L, ts(1))
    ).toDF("user_id", "event_type", "event_id", "ts")
    val got = Sessionize.latestPerKey(df, Seq("user_id", "event_type"), "ts")
      .orderBy("event_type").select("event_id").as[Long].collect()
    assert(got.toSeq == Seq(11L, 12L))
  }
}
