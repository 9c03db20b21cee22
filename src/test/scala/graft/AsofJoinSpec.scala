package graft

import graft.operators.Relational
import java.sql.Timestamp

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("asofJoin matches latest preceding right row; no-match yields null") {
    val errors = Seq(
      (1L, 100L, ts(10)),   // after clicks at 5 and 8 -> value of click@8
      (1L, 101L, ts(3)),    // before any click -> null
      (2L, 200L, ts(10))    // user 2 has no clicks -> null
    ).toDF("user_id", "event_id", "ts")
    val clicks = Seq(
      (1L, 1L, ts(5), 5.0),
      (1L, 2L, ts(8), 8.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val got = Relational.asofJoin(errors, clicks, Seq("user_id"),
        "ts", "ts", Seq("value"), "event_id")
      .orderBy("event_id")
      .select("event_id", "asof_value")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got.toSeq == Seq((100L, Some(8.0)), (101L, None), (200L, None)))
  }

  test("asofJoin: simultaneous right row is visible; equal-ts ties pick greatest tie") {
    val errors = Seq((1L, 100L, ts(5))).toDF("user_id", "event_id", "ts")
    val clicks = Seq(
      (1L, 1L, ts(5), 1.0),   // same instant as the error
      (1L, 9L, ts(5), 9.0)    // tie on ts -> greatest event_id wins
    ).toDF("user_id", "event_id", "ts", "value")
    val got = Relational.asofJoin(errors, clicks, Seq("user_id"),
        "ts", "ts", Seq("value"), "event_id")
      .select("asof_value").as[Double].head()
    assert(got == 9.0)
  }
}
