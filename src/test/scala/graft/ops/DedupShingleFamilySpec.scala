package graft.ops

import graft.{SparkEntry, SparkSpec}
import graft.functions.GramHashes
import org.apache.spark.sql.functions._

/** The conf-selected shingle-hash family (`graft.dedup.shingleHash`):
  * "rolling" must be a drop-in signature tier for the whole LSH family —
  * same window structure as the "string" default, family-invariant exact
  * Jaccard, and end-to-end parity on every MinHash-backed oracle query
  * (the round-7 verdict's done-criterion list). */
class DedupShingleFamilySpec extends SparkSpec {
  import spark.implicits._

  private def hashes(text: String, family: String): Seq[Long] = {
    val b = Seq.newBuilder[Long]
    Dedup.foreachShingleHash(text, 3, family)(b += _)
    b.result()
  }

  test("rolling family: every window hash equals the direct polynomial " +
      "recompute (roll-out step exact), incl. short-doc partial gram") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b", // shorter than n=3: one partial gram
      "x", "", "  padded   whitespace  text here ",
      "Mixed CASE and punct, tokens! again tokens! again")
    texts.foreach { t =>
      val toks = Dedup.normalizedJvm(t).split(" ", -1)
      val th = toks.map(tok => Dedup.xxStr(tok))
      val expected =
        if (toks.length < 3)
          Seq(GramHashes.fmix64(th.foldLeft(0L)(_ * GramHashes.B + _)))
        else th.sliding(3).map(w =>
          GramHashes.fmix64(w.foldLeft(0L)(_ * GramHashes.B + _))).toSeq
      assert(hashes(t, "rolling") == expected, s"text: '$t'")
    }
  }

  test("window structure parity: both families emit one hash per word " +
      "3-gram position — same multiset size, same distinct-set size " +
      "(no collisions on the fixture corpus)") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select($"text").as[String].filter(_ != null).collect()
    docs.foreach { t =>
      val s = hashes(t, "string"); val r = hashes(t, "rolling")
      assert(s.length == r.length, "multiset size")
      assert(s.distinct.length == r.distinct.length, "distinct size")
    }
  }

  test("exact Jaccard is family-invariant on fixture near-dup pairs " +
      "(verification never depends on the signature family)") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    def jac(family: String): Map[(Long, Long), Double] = {
      spark.conf.set("graft.dedup.shingleHash", family)
      try {
        val sets = Dedup.hashedShingleSets(docs).as[(Long, Seq[Long])]
          .collect().toMap
        val ids = sets.keys.toSeq.sorted.take(40)
        (for { a <- ids; b <- ids if a < b } yield {
          val sa = sets(a).toSet; val sb = sets(b).toSet
          val un = (sa ++ sb).size
          (a, b) -> (if (un == 0) 1.0
                     else (sa intersect sb).size.toDouble / un)
        }).toMap
      } finally spark.conf.unset("graft.dedup.shingleHash")
    }
    assert(jac("string") == jac("rolling"))
  }

  test("end-to-end oracle parity: q41/q60/q108/q117/q120/q128 return " +
      "identical rows under graft.dedup.shingleHash=rolling") {
    val names = Seq("q41_minhash_pairs", "q60_dedup_components",
      "q108_cross_corpus_dups", "q117_keep_best", "q120_split_leakage",
      "q128_incremental_dedup")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def run(): Seq[String] =
        fn(spark, sfDir).collect().map(_.toString).sorted.toSeq
      val base = run()
      spark.conf.set("graft.dedup.shingleHash", "rolling")
      val rolled = try run()
                   finally spark.conf.unset("graft.dedup.shingleHash")
      assert(rolled == base, s"$name diverged under the rolling family")
    }
  }

  test("unknown family fails at plan build with the named conf") {
    spark.conf.set("graft.dedup.shingleHash", "nope")
    try {
      val e = intercept[IllegalArgumentException] {
        Dedup.minhashBandRows(
          Seq((1L, "a b c d")).toDF("doc_id", "text"))
      }
      assert(e.getMessage.contains("graft.dedup.shingleHash"))
    } finally spark.conf.unset("graft.dedup.shingleHash")
  }
}
