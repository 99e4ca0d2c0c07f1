package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(s"spark-warehouse/$name")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(loc)
    }
  }

  test("bucketed join on co-bucketed tables plans without a shuffle") {
    dropTable("li_b"); dropTable("o_b")
    val li = Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_quantity")
    val o = Tables.orders(spark, sfDir).select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "o_b", "l_orderkey", 8)

    // force the sort-merge path: at test scale the planner would broadcast,
    // which ignores bucketing (at fact-fact scale broadcast is off the table)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan =
      try Bucketing.bucketedJoin(spark, "li_b", "o_b", "l_orderkey")
        .queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(plan.contains("SortMergeJoin"))
    val joined = Bucketing.bucketedJoin(spark, "li_b", "o_b", "l_orderkey")

    // correctness: identical to the plain (shuffling) join
    val expected = li.join(o, Seq("l_orderkey"))
      .agg(count(lit(1)), sum($"o_totalprice".cast("decimal(18,2)"))).collect().head.toSeq
    val got = joined
      .agg(count(lit(1)), sum($"o_totalprice".cast("decimal(18,2)"))).collect().head.toSeq
    assert(got == expected)
  }
}
