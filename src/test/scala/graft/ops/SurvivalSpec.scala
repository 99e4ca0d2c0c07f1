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

  test("logRank: hand-computed O/E/V per cohort; censoring holds at-risk; " +
      "symmetric variance; chi2 from the fixed tree") {
    // cohort a (even ids): u2 censored day 3, u4 censored day 2 — no events.
    // cohort b (odd ids): u3 event day 1, u1 event day 2.
    val ev = Seq(
      (1L, t(0), "view"), (1L, t(2), "error"),
      (2L, t(0), "view"), (2L, t(3), "view"),
      (3L, t(0), "view"), (3L, t(1), "error"),
      (4L, t(0), "view"), (4L, t(2), "view"))
      .toDF("user_id", "ts", "event_type")
    val got = Survival.logRank(ev, col("event_type") === "error",
        col("user_id") % 2 === 0)
      .orderBy("cohort")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // d=1: n=(a:2,b:2), 1 event in b → e_a = e_b = (1·2·1e9)div4 = 5e8;
    //   v = 1·(2/4)·(2/4)·(3/3) = 0.25 per cohort row.
    // d=2: at risk a:2 b:1, 1 event in b → e_a = (1·2·1e9)div3,
    //   e_b = (1·1·1e9)div3; v = (2/3)·(1/3) = 2/9 both (symmetric).
    // d=3: zero events → no term.
    val eA = 500000000L + 666666666L; val eB = 500000000L + 333333333L
    val v = 250000000L + 222222222L
    def chi2(o: Long, e: Long): Long =
      math.floor((o.toDouble - e.toDouble / 1e9)
        * (o.toDouble - e.toDouble / 1e9) / (v.toDouble / 1e9) * 1e6).toLong
    assert(got == Seq(
      ("a", 2L, 0L, eA, v, chi2(0L, eA)),
      ("b", 2L, 2L, eB, v, chi2(2L, eB))))
    // mirror-image cohorts → O = E exactly, chi2 = 0 for both
    val same = Seq(
      (1L, t(0), "view"), (1L, t(1), "error"),
      (2L, t(0), "view"), (2L, t(1), "error"),
      (3L, t(0), "view"), (3L, t(2), "view"),
      (4L, t(0), "view"), (4L, t(2), "view"))
      .toDF("user_id", "ts", "event_type")
    val eq = Survival.logRank(same, col("event_type") === "error",
        col("user_id") % 2 === 0)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(eq.length == 2 &&
      eq.forall(r => r._3 == 1L && r._4 == 1000000000L && r._6 == 0L))
  }
}
