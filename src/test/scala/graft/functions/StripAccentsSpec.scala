package graft.functions

import graft.SparkSpec

class StripAccentsSpec extends SparkSpec {
  import spark.implicits._

  test("folds accents, keeps true base letters, CJK, and ASCII untouched") {
    val cases = Seq(
      "café" -> "cafe",
      "ñandú" -> "nandu",
      "naïve ÅÉÎ" -> "naive AEI",
      "Straße" -> "Straße",   // ß is a base letter, not an accent
      "ﬁnal" -> "ﬁnal",       // NFKD-only ligature must survive (canonical only)
      "中文测试" -> "中文测试",
      "plain ascii 42" -> "plain ascii 42")
    val got = cases.map(_._1).toDF("s")
      .select(StripAccents($"s")).as[String].collect()
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"strip_accents($in)")
    }
  }

  test("null-safe; codegen and interpreted paths agree") {
    val df = Seq(Some("émigré"), None).toDF("s")
    val got = df.select(StripAccents($"s")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq == Seq("emigre", null))
    // interpreted eval (direct compute) matches the Column result
    assert(StripAccents.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("émigré")).toString
      == "emigre")
  }
}
