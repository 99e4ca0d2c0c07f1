package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def history(rows: (String, Long, Long, String)*) = {
    val df = rows.toDF("k", "ts", "tie", "v")
    Temporal.scd2(df, col("k"), col("ts"), col("tie"), col("v"))
      .select("k", "version", "v", "valid_from", "valid_to", "is_current")
      .as[(String, Int, String, Long, Option[Long], Boolean)]
      .collect().toList.sortBy(r => (r._1, r._2))
  }

  test("scd2: consecutive no-op observations collapse; intervals chain") {
    val h = history(
      ("a", 1L, 1L, "x"), ("a", 2L, 2L, "x"), ("a", 3L, 3L, "y"),
      ("a", 4L, 4L, "y"), ("a", 5L, 5L, "x"))
    assert(h == List(
      ("a", 1, "x", 1L, Some(3L), false),
      ("a", 2, "y", 3L, Some(5L), false),
      ("a", 3, "x", 5L, None, true)))
  }

  test("scd2: null tracked values are versions, null↔null is a no-op") {
    val h = history(
      ("a", 1L, 1L, "x"), ("a", 2L, 2L, null), ("a", 3L, 3L, null),
      ("a", 4L, 4L, "x"))
    assert(h.map(r => (r._2, r._3, r._4, r._5)) == List(
      (1, "x", 1L, Some(2L)), (2, null, 2L, Some(4L)), (3, "x", 4L, None)))
  }

  test("scd2: equal timestamps order by the tie-break (deterministic)") {
    val h = history(("a", 1L, 2L, "y"), ("a", 1L, 1L, "x"))
    assert(h.map(r => (r._2, r._3)) == List((1, "x"), (2, "y")))
  }

  test("scd2: single observation is the open current version") {
    assert(history(("a", 7L, 1L, "x")) == List(("a", 1, "x", 7L, None, true)))
  }

  test("cdcCompact: latest op wins; a trailing delete removes the key") {
    val log = Seq(
      ("a", 1L, 1L, "I", 10.0), ("a", 2L, 2L, "U", 20.0),
      ("b", 1L, 1L, "I", 1.0), ("b", 2L, 2L, "D", 0.0),
      ("c", 5L, 1L, "D", 0.0), ("c", 6L, 2L, "I", 3.0))
      .toDF("k", "ts", "tie", "op", "v")
    val got = Temporal.cdcCompact(log, col("k"), col("ts"), col("tie"),
        col("op"), deleteOp = "D")
      .select("k", "op", "v").as[(String, String, Double)]
      .collect().toList.sortBy(_._1)
    // a: update survives; b: deleted; c: delete then re-insert survives
    assert(got == List(("a", "U", 20.0), ("c", "I", 3.0)))
  }

  test("scd2 ≡ per-key reference fold on random collision-heavy input") {
    val rnd = new scala.util.Random(42)
    // few keys, few timestamps, few values → dense ties and no-op runs
    val rows = (1 to 400).map { i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(12).toLong, i.toLong,
        if (rnd.nextBoolean()) "a" else "b")
    }
    val got = history(rows: _*)
    val expected = rows.groupBy(_._1).toList.flatMap { case (k, rs) =>
      val ordered = rs.sortBy(r => (r._2, r._3))
      val changes = ordered.foldLeft(List.empty[(Long, String)]) {
        case (acc, (_, ts, _, v)) =>
          if (acc.nonEmpty && acc.head._2 == v) acc else (ts, v) :: acc
      }.reverse
      changes.zipWithIndex.map { case ((ts, v), i) =>
        val next = changes.lift(i + 1).map(_._1)
        (k, i + 1, v, ts, next, next.isEmpty)
      }
    }.sortBy(r => (r._1, r._2))
    assert(got == expected)
  }

  test("cdcCompact: equal timestamps resolve by tie-break descending") {
    val log = Seq(("a", 1L, 1L, "U", 1.0), ("a", 1L, 2L, "D", 0.0))
      .toDF("k", "ts", "tie", "op", "v")
    assert(Temporal.cdcCompact(log, col("k"), col("ts"), col("tie"),
      col("op"), "D").count() == 0)
  }

  test("gapFillForward: full axis per key, carry-forward, gap counter") {
    // k1 observed at 5 (rev 10) and 8 (rev 7); k2 only at 6 (rev 3).
    // Global axis [5, 8] → every key gets all four periods.
    val obs = Seq(("k1", 5L, 10L), ("k1", 8L, 7L), ("k2", 6L, 3L))
      .toDF("k", "m", "rev")
    val got = Temporal.gapFillForward(obs, Seq("k"), "m", Seq("rev"))
      .orderBy("k", "m").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (Option(r.get(r.fieldIndex("rev_ffill"))).map(_.asInstanceOf[Long]),
          Option(r.get(r.fieldIndex("periods_since_obs")))
            .map(_.asInstanceOf[Long]))).toMap
    assert(got.size == 8)
    assert(got(("k1", 5L)) == ((Some(10L), Some(0L))))
    assert(got(("k1", 6L)) == ((Some(10L), Some(1L))))
    assert(got(("k1", 7L)) == ((Some(10L), Some(2L))))
    assert(got(("k1", 8L)) == ((Some(7L), Some(0L))))
    // before k2's first observation: nothing to carry, gap undefined
    assert(got(("k2", 5L)) == ((None, None)))
    assert(got(("k2", 6L)) == ((Some(3L), Some(0L))))
    assert(got(("k2", 8L)) == ((Some(3L), Some(2L))))
  }

  test("ewmaLagged: partial-window renormalization at series start") {
    // weights (3, 1): t1 = 30/3 = 10; t2 = (3·20+10)/4 = 17 (floor);
    // t3 = (3·30+20)/4 = 27 (floor)
    val s = Seq(("k", 1L, 10L), ("k", 2L, 20L), ("k", 3L, 30L))
      .toDF("g", "t", "v")
    val got = Temporal.ewmaLagged(s, Seq("g"), "t", "v", Seq(3L, 1L))
      .orderBy("t").collect().map(_.getAs[Long]("ewma")).toSeq
    assert(got == Seq(10L, 17L, 27L))
    // independent keys don't leak lags into each other
    val two = s.union(Seq(("k2", 1L, 100L)).toDF("g", "t", "v"))
    val k2 = Temporal.ewmaLagged(two, Seq("g"), "t", "v", Seq(3L, 1L))
      .filter(col("g") === "k2").collect()(0).getAs[Long]("ewma")
    assert(k2 == 100L)
  }
}
