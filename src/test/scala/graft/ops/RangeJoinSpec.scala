package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed range join ≡ direct theta join, including bucket-edge cases") {
    val points = Seq(0.0, 9.99, 10.0, 15.5, 29.999, 30.0, 45.0, 99.0)
      .zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("pid", "x")
    val intervals = Seq(
      (100L, 0.0, 10.0),    // exact bucket span: 10.0 excluded (half-open)
      (101L, 5.0, 35.0),    // spans multiple buckets
      (102L, 29.999, 30.0), // sliver
      (103L, 50.0, 60.0))   // matches nothing
      .toDF("iid", "lo", "hi")
    val bucketed = RangeJoin.bucketedRangeJoin(points, "x", intervals, "lo", "hi", 10.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val direct = points.join(intervals, $"x" >= $"lo" && $"x" < $"hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(bucketed == direct)
    assert(bucketed.contains((0L, 100L)) && !bucketed.contains((2L, 100L)))
  }

  test("bucketed range join plans as an equi-join, not nested-loop") {
    val points = spark.range(1000).select($"id".as("pid"), ($"id" * 3.0).as("x"))
    val intervals = spark.range(500)
      .select($"id".as("iid"), ($"id" * 6.0).as("lo"), ($"id" * 6.0 + 12.0).as("hi"))
    val joined = RangeJoin.bucketedRangeJoin(points, "x", intervals, "lo", "hi", 6.0)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
    assert(joined.count() ==
      points.join(intervals, $"x" >= $"lo" && $"x" < $"hi").count())
  }

  test("interval overlap join ≡ theta join; multi-tile overlaps dedupe; " +
      "plans equi, not nested-loop") {
    val a = Seq((1L, 10L, 0L, 10L), (1L, 11L, 20L, 45L), (2L, 12L, 0L, 5L))
      .toDF("k", "aid", "sa", "ea")
    val b = Seq(
      (1L, 20L, 10L, 12L),  // touches aid 10 at the closed endpoint
      (1L, 21L, 5L, 40L),   // overlaps both of key 1's intervals, many tiles
      (1L, 22L, 46L, 50L),  // gap: matches nothing
      (2L, 23L, 5L, 6L),    // closed-endpoint touch again
      (3L, 24L, 0L, 100L))  // different key: never joins
      .toDF("k", "bid", "sb", "eb")
    val tiled = RangeJoin.intervalOverlapJoin(a, b, Seq("k"),
        "aid", "bid", "sa", "ea", "sb", "eb", bucketWidth = 7L)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    val theta = a.join(b, a("k") === b("k") &&
        $"sa" <= $"eb" && $"sb" <= $"ea")
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(tiled == theta)
    assert(tiled == Set((10L, 20L), (10L, 21L), (11L, 21L), (12L, 23L)))
    val plan = RangeJoin.intervalOverlapJoin(a, b, Seq("k"),
        "aid", "bid", "sa", "ea", "sb", "eb", 7L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
  }
}
