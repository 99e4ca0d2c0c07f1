package graft.ops

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25TopK ranks by term frequency with length normalization; k cuts; id tie-break") {
    val docs = Seq(
      (1L, "spark spark spark query engine"),          // tf=3, short
      (2L, "spark query engine with a much longer tail of words " +
        "padding padding padding padding padding"),    // tf=1, long
      (3L, "spark spark query engine"),                // tf=2, shortest
      (4L, "nothing relevant here at all"),
      (5L, "spark spark spark query engine")           // identical to 1 → tie, id order
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, Seq("spark"), k = 3)
      .as[(Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 5L, 3L),
      s"got ${out.toSeq}")
    assert(out(0)._2 == out(1)._2) // identical docs score identically
    assert(out(1)._2 > out(2)._2)  // higher tf outranks at equal length
    // the long tf=1 doc scores below every short high-tf doc and is cut by k
    assert(!out.map(_._1).contains(2L) && !out.map(_._1).contains(4L))
  }

  test("bm25TopK: docs without any query term never appear") {
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    assert(Retrieval.bm25TopK(docs, Seq("zeta"), k = 5).count() == 0L)
  }

  test("bm25TopK: dotted/backticked and duplicated terms are safe") {
    val docs = Seq((1L, "u.s. trade policy"), (2L, "`tick` and u.s. news u.s."))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, Seq("u.s.", "u.s.", "`tick`"), k = 5)
      .as[(Long, Double)].collect()
    assert(out.map(_._1).toSet == Set(1L, 2L))
    assert(out.head._1 == 2L) // two query-term types + higher tf wins
  }

  test("invertedIndex: df band gates postings, stop-words keep df with NULL list, " +
      "repeated in-doc terms count once") {
    val docs = Seq(
      (3L, "alpha beta common common"), // 'common' twice in-doc → df 1 each
      (1L, "alpha common"),
      (2L, "beta common"),
      (4L, "common")).toDF("doc_id", "text")
    val out = Retrieval.invertedIndex(docs, minDf = 2L, maxDf = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.getString(2)))).sortBy(_._1)
    // 'alpha' df=2 (docs 1,3) sorted postings; 'common' df=4 > maxDf → NULL
    assert(out.toSeq == Seq(
      ("alpha", 2L, Some("1,3")),
      ("beta", 2L, Some("2,3")),
      ("common", 4L, None)))
  }

  test("phraseMatch: consecutive-only, overlapping repeats, repeated-term " +
    "phrases, normalization, and layout invariance") {
    val docs = Seq(
      (1L, "the quick brown fox"),          // 1 match at 1
      (2L, "quick the quick brown"),        // 1 match at 1
      (3L, "quick brown is not quick Brown here quick  brown"),
      // ↑ matches at 0 (case via normalize), 4, 7 (double space collapses)
      (4L, "brown quick"),                  // reversed: no match
      (5L, "quick fox brown"),              // not consecutive: no match
      (6L, "")).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Retrieval.phraseMatch(d, Seq("quick", "brown"))
        .as[(Long, Long, Int)].collect().sortBy(_._1).toSeq
    val got = run(docs)
    assert(got == Seq((1L, 1L, 1), (2L, 1L, 2), (3L, 3L, 0)), s"got $got")
    assert(got == run(docs.repartition(5)))
    // self-repeating phrase: "buffalo buffalo" in "buffalo buffalo buffalo"
    // overlaps at anchors 0 and 1 — the (offset, position) vote handles a
    // token voting for BOTH offsets
    val rep = Retrieval.phraseMatch(
      Seq((9L, "buffalo buffalo buffalo")).toDF("doc_id", "text"),
      Seq("buffalo", "buffalo")).as[(Long, Long, Int)].collect().toSeq
    assert(rep == Seq((9L, 2L, 0)))
    // 3-term phrase needs all three offsets at one anchor
    val tri = Retrieval.phraseMatch(docs, Seq("the", "quick", "brown"))
      .as[(Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(tri == Seq((1L, 1L, 0), (2L, 1L, 1)))
  }
}
