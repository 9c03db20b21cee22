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

    // As-of join (union + ignore-nulls window — SURVEY §7.3 custom-operator
    // case (a): composed from existing ops, one shuffle on the key).
    QueryDef(
      "q_asof_join",
      "as-of join: each error event gets the latest preceding click's value per user",
      """WITH clicks AS (SELECT user_id, ts, value, event_id FROM events
                         WHERE event_type = 'click' AND user_id < 50),
         errors AS (SELECT user_id, event_id, ts FROM events
                    WHERE event_type = 'error' AND user_id < 50),
         u AS (
           SELECT user_id, event_id, ts, CAST(NULL AS DOUBLE) AS payload,
                  1 AS side, CAST(9223372036854775807 AS BIGINT) AS tie FROM errors
           UNION ALL
           SELECT user_id, event_id, ts, value AS payload,
                  0 AS side, event_id AS tie FROM clicks),
         c AS (
           SELECT user_id, event_id, side,
                  LAST_VALUE(CASE WHEN side = 0 THEN payload END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY ts, side, tie
                          ROWS UNBOUNDED PRECEDING) AS asof_value
           FROM u)
         SELECT user_id, event_id, asof_value FROM c WHERE side = 1
         ORDER BY user_id, event_id""") { (s, dir) =>
      val ev = t(s, dir, "events").filter(col("user_id") < 50)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), col("ts"))
      graft.operators.Relational.asofJoin(errors, clicks, Seq("user_id"),
          leftTs = "ts", rightTs = "ts", payloadCols = Seq("value"), rightTie = "event_id")
        .select(col("user_id"), col("event_id"), col("asof_value"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // Range (interval) join: small interval table broadcast, BETWEEN
    // predicate — BroadcastNestedLoopJoin is the right plan at this shape.
    QueryDef(
      "q_range_join",
      "range join: orders bucketed into date intervals, counts + exact sums per bucket",
      """WITH ranges(start_d, end_d, label) AS (VALUES
           (TIMESTAMP '1995-01-01 00:00:00', TIMESTAMP '1996-12-31 00:00:00', 'early'),
           (TIMESTAMP '1997-01-01 00:00:00', TIMESTAMP '1998-12-31 00:00:00', 'mid'),
           (TIMESTAMP '1999-01-01 00:00:00', TIMESTAMP '2001-12-31 00:00:00', 'late'))
         SELECT label, CAST(COUNT(*) AS BIGINT) AS n_orders,
                CAST(SUM(CAST(FLOOR((o_totalprice) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0 AS sum_price
         FROM orders JOIN ranges ON o_orderdate BETWEEN start_d AND end_d
         GROUP BY label ORDER BY label""") { (s, dir) =>
      import org.apache.spark.sql.types.TimestampType
      val ranges = s.createDataFrame(Seq(
        ("1995-01-01 00:00:00", "1996-12-31 00:00:00", "early"),
        ("1997-01-01 00:00:00", "1998-12-31 00:00:00", "mid"),
        ("1999-01-01 00:00:00", "2001-12-31 00:00:00", "late")))
        .toDF("start_s", "end_s", "label")
        .select(col("start_s").cast(TimestampType).as("start_d"),
                col("end_s").cast(TimestampType).as("end_d"), col("label"))
      t(s, dir, "orders")
        .join(broadcast(ranges),
          col("o_orderdate") >= col("start_d") && col("o_orderdate") <= col("end_d"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("label"))
    },

    // The same interval bucketing as q_range_join, but through the banded
    // EQUI-join rewrite (Relational.bandedRangeJoin) — the plan that
    // survives when BOTH sides are big and BroadcastNestedLoopJoin can't
    // hold the build side. Bands are 256-day epoch windows (near the
    // interval lengths, so each interval expands into ≤ 5 band rows).
    // Same oracle as q_range_join: the rewrite must be result-invisible.
    QueryDef(
      "q_range_join_banded",
      "interval bucketing via banded equi-join rewrite (big-big capable range join)",
      """WITH ranges(start_d, end_d, label) AS (VALUES
           (TIMESTAMP '1995-01-01 00:00:00', TIMESTAMP '1996-12-31 00:00:00', 'early'),
           (TIMESTAMP '1997-01-01 00:00:00', TIMESTAMP '1998-12-31 00:00:00', 'mid'),
           (TIMESTAMP '1999-01-01 00:00:00', TIMESTAMP '2001-12-31 00:00:00', 'late'))
         SELECT label, CAST(COUNT(*) AS BIGINT) AS n_orders,
                CAST(SUM(CAST(FLOOR((o_totalprice) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0 AS sum_price
         FROM orders JOIN ranges ON o_orderdate BETWEEN start_d AND end_d
         GROUP BY label ORDER BY label""") { (s, dir) =>
      import org.apache.spark.sql.types.TimestampType
      val ranges = s.createDataFrame(Seq(
        ("1995-01-01 00:00:00", "1996-12-31 00:00:00", "early"),
        ("1997-01-01 00:00:00", "1998-12-31 00:00:00", "mid"),
        ("1999-01-01 00:00:00", "2001-12-31 00:00:00", "late")))
        .toDF("start_s", "end_s", "label")
        .select(col("start_s").cast(TimestampType).as("start_d"),
                col("end_s").cast(TimestampType).as("end_d"), col("label"))
        .withColumn("start_e", col("start_d").cast("long"))
        .withColumn("end_e", col("end_d").cast("long"))
      // o_orderdate is TIMESTAMP_NTZ: no direct long cast — go through
      // TimestampType (session TZ pinned UTC, so the mapping is identity)
      val orders = t(s, dir, "orders")
        .withColumn("o_epoch", col("o_orderdate").cast(TimestampType).cast("long"))
      graft.operators.Relational
        .bandedRangeJoin(orders, ranges, "o_epoch", "start_e", "end_e",
          bandWidth = 256L * 86400)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("label"))
    },

    // Outlier flagging: z-score per event type from quantized mean/std —
    // sqrt/div are single IEEE ops over deterministic inputs.
    QueryDef(
      "q_events_anomaly",
      "z-score anomaly counts per event type (quantized mean/stddev, |z| > 3)",
      """WITH stats AS (
           SELECT event_type,
                  (CAST(SUM(CAST(FLOOR((value) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0) / COUNT(*) AS mu,
                  (CAST(SUM(CAST(FLOOR((value * value) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0) / COUNT(*) AS m2,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY event_type)
         SELECT e.event_type,
                CAST(COUNT(*) FILTER (WHERE abs((e.value - s.mu) / sqrt(s.m2 - s.mu * s.mu)) > 3) AS BIGINT) AS n_outliers,
                s.n AS n_events
         FROM events e JOIN stats s ON e.event_type = s.event_type
         GROUP BY e.event_type, s.n ORDER BY e.event_type""") { (s, dir) =>
      val ev = t(s, dir, "events")
      val stats = ev.groupBy(col("event_type").as("et"))
        .agg(davg(col("value")).as("mu"),
             davg(col("value") * col("value")).as("m2"),
             count(lit(1)).as("n"))
      ev.join(broadcast(stats), ev("event_type") === col("et"))
        .groupBy(col("event_type"), col("n"))
        .agg(sum(when(abs((col("value") - col("mu")) /
               sqrt(col("m2") - col("mu") * col("mu"))) > 3, 1).otherwise(0))
          .cast("long").as("n_outliers"))
        .select(col("event_type"), col("n_outliers"), col("n").as("n_events"))
        .orderBy(col("event_type"))
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
