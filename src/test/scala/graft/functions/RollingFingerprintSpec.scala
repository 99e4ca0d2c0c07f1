package graft.functions

import graft.SparkSpec
import graft.ops.{Dedup, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.functions._

class RollingFingerprintSpec extends SparkSpec {
  import spark.implicits._

  test("native expression equals the expression-combinator fold on real docs") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val both = docs.select(
      TextAnalysis.fingerprint($"text").as("fold"),
      RollingFingerprint(Dedup.normalized($"text")).as("native"))
    assert(both.filter($"fold" =!= $"native").count() == 0)
  }

  test("codegen and interpreted paths agree; null in → null out") {
    val df = Seq(Some("hello world"), Some(""), None).toDF("s")
    val out = df.select(RollingFingerprint($"s").as("fp")).collect()
    assert(out(0).getLong(0) > 0)
    assert(out(1).getLong(0) == 0L)
    assert(out(2).isNullAt(0))
    val one = Seq("hello world").toDF("s")
      .select(RollingFingerprint($"s")).as[Long].head()
    assert(out(0).getLong(0) == one)
  }

  test("appears inside a WholeStageCodegen span") {
    val df = Tables.documents(spark, sfDir)
      .select(RollingFingerprint($"text").as("fp"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [rolling_fingerprint"))
  }
}
