package graft.functions

import graft.SparkSpec
import graft.ops.{Dedup, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.functions._

class RollingFingerprintSpec extends SparkSpec {
  import spark.implicits._

  test("matches a driver-side reference computation on real docs") {
    def ref(s: String): Long = {
      val norm = s.trim.toLowerCase.replaceAll("\\s+", " ")
      var acc = 0L; var i = 0
      while (i < norm.length) {
        val cp = norm.codePointAt(i)
        acc = (acc * 31 + cp) % 9007199254740992L
        i += Character.charCount(cp)
      }
      acc
    }
    val rows = Tables.documents(spark, sfDir).limit(50)
      .select($"text", TextAnalysis.fingerprint($"text").as("fp"))
      .as[(String, Long)].collect()
    rows.foreach { case (text, fp) => assert(fp == ref(text)) }
    // supplementary-plane characters fold as single code points
    val astral = Seq("hi 😀").toDF("s")
      .select(RollingFingerprint($"s")).as[Long].head()
    assert(astral == ref("hi 😀"))
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
