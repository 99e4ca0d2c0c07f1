package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GramHashesSpec extends SparkSpec {
  import spark.implicits._

  /** Naive O(n·L) reference: hash every code-point window independently
    * with the same polynomial + fmix — pins the ROLLING recurrence. */
  private def naive(s: String, L: Int): Seq[Long] = {
    val B = 0x9E3779B97F4A7C15L
    def fmix(h0: Long): Long = {
      var h = h0
      h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL
      h ^= h >>> 33; h *= 0xC4CEB9FE1A85EC53L
      h ^= h >>> 33; h
    }
    val cps = s.codePoints().toArray
    (0 to cps.length - L).map { i =>
      var h = 0L
      (i until i + L).foreach(j => h = h * B + cps(j))
      fmix(h)
    }
  }

  test("gram_hashes ≡ independent per-window polynomial (rolling " +
      "recurrence exact), incl. non-BMP code points; short text empty") {
    val rows = Seq(
      "abcdefgh",
      "aaaaaaaa",              // same-symbol runs: all windows equal
      "ab😀cd😀ab", // U+1F600 astral: 1 code point
      "xy")                    // shorter than L=3 → no windows
    val got = rows.toDF("t")
      .select(GramHashes($"t", 3).as("hs"))
      .as[Seq[Long]].collect()
    rows.zip(got).foreach { case (s, hs) =>
      assert(hs == naive(s, 3), s"mismatch on '$s'")
    }
    assert(got(3).isEmpty)
    // equal code-point windows hash equal, across rows and positions
    assert(got(1).distinct.size == 1)
    assert(got(0).distinct.size == got(0).size) // distinct windows differ
  }

  test("hash-equality classes ≡ substring-equality classes on a mixed " +
      "ASCII/astral fixture (the duplicateSpans contract)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a quick brown fox jumped; the lazy dog slept"),
      (3L, "😀😀abc😀😀abc"))
      .toDF("doc_id", "text")
    val L = 5
    val byHash = docs
      .select($"doc_id", posexplode(GramHashes($"text", L)).as(Seq("pos", "h")))
    val bySubstr = docs
      .filter(length($"text") >= L)
      .select($"doc_id",
        explode(sequence(lit(0), length($"text") - L)).as("pos"), $"text")
      .select($"doc_id", $"pos", expr(s"substring(text, pos + 1, $L)").as("g"))
    val joined = byHash.join(bySubstr, Seq("doc_id", "pos")).collect()
    assert(joined.length == bySubstr.count())
    // two positions share a hash ⇔ they share the substring
    val pairs = joined.map(r => (r.getAs[Long]("h"), r.getAs[String]("g")))
    assert(pairs.groupBy(_._1).forall(_._2.map(_._2).distinct.size == 1))
    assert(pairs.groupBy(_._2).forall(_._2.map(_._1).distinct.size == 1))
  }

  test("duplicateSpans via gram_hashes ≡ the substring+xxhash64 " +
      "formulation it replaced (same spans, any partitioning)") {
    val boiler = "COMMON LICENSE BANNER TEXT THAT REPEATS ACROSS DOCS"
    val docs = Seq(
      (10L, s"unique alpha content one $boiler trailing alpha text"),
      (20L, s"$boiler then completely different body here"),
      (30L, "no shared content in this document at all, it is alone"),
      (40L, s"prefix beta $boiler$boiler double banner tail"))
      .toDF("doc_id", "text")
    val got = graft.ops.Dedup.duplicateSpans(docs, gramLen = 12)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // reference: the pre-kernel formulation, inlined
    val L = 12
    def grams = docs
      .select($"doc_id", $"text".as("__t"))
      .filter(length($"__t") >= L)
      .select($"doc_id",
        explode(sequence(lit(0), length($"__t") - L)).as("pos"), $"__t")
      .select($"doc_id", $"pos".cast("long").as("pos"),
        xxhash64(expr(s"substring(__t, pos + 1, $L)")).as("__h"))
    val dup = grams.groupBy($"__h")
      .agg(min($"doc_id").as("mn"), max($"doc_id").as("mx"))
      .filter($"mn" =!= $"mx").select($"__h")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos")
    val ref = grams.join(dup, Seq("__h"), "left_semi")
      .select($"doc_id", $"pos")
      .withColumn("brk",
        when($"pos" - lag($"pos", 1).over(w) <= L, lit(0L)).otherwise(lit(1L)))
      .withColumn("isl", sum($"brk")
        .over(w.rowsBetween(Long.MinValue, 0)))
      .groupBy($"doc_id", $"isl")
      .agg(min($"pos").as("span_start"), (max($"pos") + L).as("span_end"))
      .select($"doc_id", $"span_start", $"span_end",
        ($"span_end" - $"span_start").as("span_len"))
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == ref, s"got $got\nref $ref")
    assert(got.nonEmpty) // the fixture must actually exercise spans
    val rep = graft.ops.Dedup.duplicateSpans(docs.repartition(7), gramLen = 12)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rep == got)
  }
}
