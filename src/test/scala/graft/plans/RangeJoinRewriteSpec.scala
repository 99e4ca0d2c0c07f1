package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def points = spark.range(2000)
    .select($"id".as("pid"), ($"id" * 3.0).as("x"))
  private def intervals = spark.range(800)
    .select($"id".as("iid"), ($"id" * 6.0).as("lo"), ($"id" * 6.0 + 12.0).as("hi"))
  private def theta = points.join(intervals, $"x" >= $"lo" && $"x" < $"hi")

  test("optimizer rule rewrites range-theta join to bucketed equi-join, same result") {
    val expected = theta.select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(theta.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRewrite
    spark.conf.set(RangeJoinRewrite.widthKey, "6.0")
    try {
      val rewritten = theta
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
      assert(rewritten.select("pid", "iid").as[(Long, Long)].collect().toSet == expected)
      // column order and schema preserved by the restoring Project
      assert(rewritten.columns.toSeq == Seq("pid", "x", "iid", "lo", "hi"))
      // swapped-side pattern (intervals on the left) also rewrites
      val swapped = intervals.join(points, $"x" >= $"lo" && $"x" < $"hi")
      assert(!swapped.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(swapped.select("pid", "iid").as[(Long, Long)].collect().toSet == expected)
    } finally {
      spark.conf.unset(RangeJoinRewrite.widthKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq RangeJoinRewrite)
    }
  }

  test("rule is a no-op without the width config") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRewrite
    try
      assert(theta.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    finally
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq RangeJoinRewrite)
  }
}
