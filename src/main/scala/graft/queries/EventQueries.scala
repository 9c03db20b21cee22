package graft.queries

import graft.QueryDef
import graft.core.Tables.t
import graft.functions.Fns._
import graft.operators.Sessionize
import org.apache.spark.sql.functions._

/** Event-stream-shaped surface over the `events` table: tumbling-window
  * aggregation, gap sessionization, latest-per-key stateful dedup, JSON
  * props extraction. Batch analogs of the Structured Streaming operators
  * in graft.streaming (SURVEY.md §2.9 extension).
  */
object EventQueries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_events_window",
      "tumbling 1h event-time window: count + exact sum(value) per (hour, type)",
      """SELECT strftime(ts, '%Y-%m-%d %H:00') AS bucket, event_type,
                CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0 AS sum_value
         FROM events GROUP BY bucket, event_type
         ORDER BY bucket, event_type""") { (s, dir) =>
      Sessionize.tumblingCounts(t(s, dir, "events"), "ts", "event_type",
          dsum(col("value")).as("sum_value"))
        .orderBy(col("bucket"), col("event_type"))
    },

    QueryDef(
      "q_sessionize",
      "30-min-gap sessionization: per-user session count / sizes / durations",
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) // 1000000 AS sec FROM events),
         l AS (SELECT user_id, event_id, sec,
                      LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev
               FROM e),
         g AS (SELECT user_id, event_id, sec,
                      CASE WHEN sec - prev > 1800 THEN 1 ELSE 0 END AS gap
               FROM l),
         s AS (SELECT user_id, sec,
                      SUM(gap) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                     ROWS UNBOUNDED PRECEDING) + 1 AS session_seq
               FROM g),
         ps AS (SELECT user_id, session_seq, CAST(COUNT(*) AS BIGINT) AS n_events,
                       MAX(sec) - MIN(sec) AS duration_sec
                FROM s GROUP BY user_id, session_seq)
         SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
                CAST(SUM(n_events) AS BIGINT) AS n_events,
                CAST(MAX(n_events) AS BIGINT) AS max_session_events,
                CAST(MAX(duration_sec) AS BIGINT) AS max_session_sec
         FROM ps GROUP BY user_id ORDER BY user_id""") { (s, dir) =>
      Sessionize.sessionStats(t(s, dir, "events"), "user_id", "ts", maxGapSeconds = 1800)
        .orderBy(col("user_id"))
    },

    QueryDef(
      "q_events_latest",
      "stateful-dedup analog: latest event per (user, event_type), deterministic ties",
      """SELECT user_id, event_type, event_id, value FROM (
           SELECT user_id, event_type, event_id, value,
                  ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts DESC, event_id DESC) AS rn
           FROM events WHERE user_id < 30)
         WHERE rn = 1 ORDER BY user_id, event_type""") { (s, dir) =>
      Sessionize.latestPerKey(
          t(s, dir, "events").filter(col("user_id") < 30),
          Seq("user_id", "event_type"), "ts")
        .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
        .orderBy(col("user_id"), col("event_type"))
    },

    QueryDef(
      "q_events_json",
      "JSON props extraction (get_json_object) + modular bucket aggregation",
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
                CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
         FROM events GROUP BY k_mod ORDER BY k_mod""") { (s, dir) =>
      t(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy(col("k_mod"))
    },
  )
}
