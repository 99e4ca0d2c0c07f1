package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token count: whitespace splitting, blank → 0") {
    val df = Seq("one two  three", "", "   ", "single").toDF("text")
    val out = df.select(TextAnalysis.tokenCount($"text")).as[Int].collect().toSeq
    assert(out == Seq(3, 0, 0, 1))
  }

  test("langId picks the language with most stopword hits") {
    val df = Seq(
      "the cat and the dog of the house is in a tree",
      "der hund und die katze ist nicht ein vogel zu hause",
      "el perro y la casa de los gatos que es un animal",
      "zzz qqq www").toDF("text")
    val out = df.select(TextAnalysis.langId($"text")).as[String].collect().toSeq
    assert(out == Seq("en", "de", "es", "und"))
  }

  test("quality score favors normal prose over noise") {
    val good = "the quick brown fox jumps over the lazy dog and that is a fine thing to see in the morning"
    val noisy = "!!!! 1234 5678 ???? .... 9999 0000 ;;;; 1111 2222"
    val df = Seq(good, noisy).toDF("text")
    val out = df.select(TextAnalysis.qualityScore($"text")).as[Double].collect()
    assert(out(0) > out(1))
    assert(out(0) > 0.7 && out(1) < 0.3)
  }

  test("fingerprint: deterministic, normalization-invariant, content-sensitive") {
    val df = Seq(
      ("a", "Hello World Foo"),
      ("b", "  hello   world foo "),
      ("c", "hello world bar")).toDF("id", "text")
    val m = df.select($"id", TextAnalysis.fingerprint($"text")).as[(String, Long)]
      .collect().toMap
    assert(m("a") == m("b"))
    assert(m("a") != m("c"))
    assert(m.values.forall(v => v >= 0 && v < (1L << 53)))
  }
}
