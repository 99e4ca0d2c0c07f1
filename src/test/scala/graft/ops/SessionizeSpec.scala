package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, tsSec: Long) =
    (id, user, new java.sql.Timestamp(tsSec * 1000L))

  test("byGap: new session when gap exceeds threshold, per user, 1-based") {
    val df = Seq(
      ev(1, 1, 0), ev(2, 1, 100), ev(3, 1, 2000),   // gap 1900 > 1800 → new
      ev(4, 1, 2100),
      ev(5, 2, 0), ev(6, 2, 5000))                   // other user independent
      .toDF("event_id", "user_id", "ts")
    val out = Sessionize.byGap(df, gapSeconds = 1800)
      .select($"event_id", $"session_idx").as[(Long, Long)].collect().toMap
    assert(out(1L) == 1 && out(2L) == 1)
    assert(out(3L) == 2 && out(4L) == 2)
    assert(out(5L) == 1 && out(6L) == 2)
  }

  test("byGap: deterministic under repartitioning; ties break by event_id") {
    val df = Seq(ev(10, 1, 50), ev(11, 1, 50), ev(12, 1, 5000))
      .toDF("event_id", "user_id", "ts")
    val a = Sessionize.byGap(df, 1800).select($"event_id", $"session_idx")
      .as[(Long, Long)].collect().toMap
    val b = Sessionize.byGap(df.repartition(5), 1800).select($"event_id", $"session_idx")
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a(10L) == 1 && a(11L) == 1 && a(12L) == 2)
  }

  test("sessions ≡ native session_window: same starts and counts per user") {
    // 40 events, 3 users, gaps straddling the 30-min threshold
    val df = (0 until 40).map { i =>
      val (id, u, t) = ev(i.toLong, i % 3, i.toLong * 937 + (i % 5) * 1801)
      (id, u, t, i.toDouble)
    }.toDF("event_id", "user_id", "ts", "value")
    val mine = Sessionize.sessions(df, gapSeconds = 1800)
      .select($"user_id", $"session_start", $"n_events")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    val native = graft.streaming.EventStreams.sessionCounts(df, gap = "30 minutes")
      .select($"user_id", $"s_start", $"n")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    assert(mine == native)
  }

  test("sessions: bounds and counts per (user, session)") {
    val df = Seq(ev(1, 1, 0), ev(2, 1, 100), ev(3, 1, 9000))
      .toDF("event_id", "user_id", "ts")
    val out = Sessionize.sessions(df, 1800)
      .select($"user_id", $"session_idx", $"n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 2L), (1L, 2L, 1L)))
  }
}
