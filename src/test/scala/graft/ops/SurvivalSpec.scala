package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private def t(day: Int) =
    new java.sql.Timestamp(ts0.getTime + day * 86400000L)

  test("kaplanMeier: hand-computed curve with censoring; exact quantized-ln sums") {
    // A, D: error on day 2; B: error on day 5; C censored at day 3;
    // E censored at day 6 (still at risk when B's event fires)
    val ev = Seq(
      (1L, t(0), "view"), (1L, t(2), "error"),
      (4L, t(0), "view"), (4L, t(2), "error"),
      (2L, t(0), "view"), (2L, t(5), "error"),
      (3L, t(0), "view"), (3L, t(3), "view"),
      (5L, t(0), "view"), (5L, t(6), "view"))
      .toDF("user_id", "ts", "event_type")
    val got = Survival.kaplanMeier(ev, col("event_type") === "error")
      .orderBy("duration")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // day 2: 5 at risk, 2 events → ln(3/5); day 5: 2 at risk (B, E),
    // 1 event → ln(1/2); cumulative quantized-ln sums
    val ln35 = math.floor(math.log(3.0 / 5.0) * 1e6).toLong
    val ln12 = math.floor(math.log(1.0 / 2.0) * 1e6).toLong
    assert(got == Seq((2L, 5L, 2L, ln35), (5L, 2L, 1L, ln35 + ln12)))
    // survival after day 5 ≈ (3/5)·(1/2) = 0.3
    assert(math.abs(math.exp((ln35 + ln12) / 1e6) - 0.3) < 1e-4)
  }

  test("kaplanMeier: terminal zero-survivor duration excluded; layout-invariant") {
    // both entities error: the later one fires when it is the last at risk
    val ev = Seq(
      (1L, t(0), "view"), (1L, t(1), "error"),
      (2L, t(0), "view"), (2L, t(4), "error"))
      .toDF("user_id", "ts", "event_type")
    val got = Survival.kaplanMeier(ev, col("event_type") === "error")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // duration 4 has n_at_risk = n_events = 1 → ln(0), excluded
    assert(got.map(_._1) == Seq(1L))
    val again = Survival.kaplanMeier(ev.repartition(5),
        col("event_type") === "error")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(again == got)
  }

  test("nelsonAalen: hand-computed integer hazard increments, censoring " +
      "keeps entities at risk, terminal duration INCLUDED (no ln)") {
    val ev = Seq(
      (1L, t(0), "view"), (1L, t(1), "error"),   // event at duration 1
      (2L, t(0), "view"), (2L, t(2), "error"),   // event at duration 2
      (3L, t(0), "view"), (3L, t(2), "view"))    // censored at duration 2
      .toDF("user_id", "ts", "event_type")
    val out = Survival.nelsonAalen(ev, col("event_type") === "error")
      .orderBy(col("duration"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    // d=1: 1/3 → 333333333; d=2: at risk 2, 1 event → +500000000
    assert(out == Seq((1L, 3L, 1L, 333333333L), (2L, 2L, 1L, 833333333L)))
    // everyone-dies terminal step: hazard increment is exactly 1e9
    val all = Seq((1L, t(0), "view"), (1L, t(1), "error"))
      .toDF("user_id", "ts", "event_type")
    val term = Survival.nelsonAalen(all, col("event_type") === "error")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(term == Seq((1L, 1L, 1L, 1000000000L)))
  }
}
