package graft.functions

import graft.SparkSpec
import graft.ops.TextAnalysis
import graft.sources.Tables
import org.apache.spark.sql.functions._

class TokenWindowsSpec extends SparkSpec {
  import spark.implicits._

  test("generator emits overlapping windows; last window truncates") {
    val df = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
      .select($"doc_id", expr("token_windows(text, 3, 1)"))
    val got = df.as[(Long, Int, Long, Long, String)].collect().toList
    assert(got == List(
      (1L, 0, 0L, 3L, "a b c"), (1L, 1, 2L, 3L, "c d e"),
      (1L, 2, 4L, 3L, "e f g")))
  }

  test("null and blank documents generate zero rows") {
    val df = Seq((1L, null), (2L, "   "), (3L, "x"))
      .toDF("doc_id", "text")
      .select($"doc_id", expr("token_windows(text, 3, 1)"))
    assert(df.select("chunk").as[String].collect().toList == List("x"))
  }

  test("parity with TextAnalysis.chunkTokens on real documents") {
    val docs = Tables.documents(spark, sfDir)
    val viaGen = docs
      .select($"doc_id", expr("token_windows(text, 100, 20)"))
      .select($"doc_id", $"chunk_id", $"start_tok", $"n_tok",
        RollingFingerprint(col("chunk")).as("chunk_fp"))
    val viaPlan = TextAnalysis.chunkTokens(docs, window = 100, overlap = 20)
    assert(viaGen.exceptAll(viaPlan).isEmpty && viaPlan.exceptAll(viaGen).isEmpty)
  }

  test("LATERAL VIEW form works from SQL") {
    Seq((7L, "one two three four")).toDF("doc_id", "text")
      .createOrReplaceTempView("tw_docs")
    val got = spark.sql(
      """SELECT doc_id, t.chunk_id, t.chunk
        |FROM tw_docs LATERAL VIEW token_windows(text, 2, 0) t""".stripMargin)
      .as[(Long, Int, String)].collect().toList
    assert(got == List((7L, 0, "one two"), (7L, 1, "three four")))
  }

  test("invalid window/overlap fail analysis, not execution") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      df.select(expr("token_windows(text, 2, 5)")).collect()
    }
    assert(e.getMessage.contains("overlap"))
  }
}
