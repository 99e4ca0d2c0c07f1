package graft.ops

import graft.SparkSpec

class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse: fused score is the exact long sum; missing-list docs " +
      "contribute 0 and keep NULL provenance; full-outer keeps both sides") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val out = Ranking.rrfFuse(Seq("a" -> a, "b" -> b), k0 = 60)
      .orderBy($"rrf_x12".desc, $"id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), r.getLong(3)))
    def c(r: Int) = (1e12 / (60 + r)).floor.toLong
    // doc 20 appears in both lists → sum of both contributions, ranks kept
    assert(out.head == ((20L, Some(2), Some(1), c(2) + c(1))))
    assert(out.map(_._1).toSet == Set(10L, 20L, 30L, 40L))
    val ten = out.find(_._1 == 10L).get
    assert(ten == ((10L, Some(1), None, c(1))))
    val forty = out.find(_._1 == 40L).get
    assert(forty == ((40L, None, Some(2), c(2))))
  }

  test("rrfFuse: rank-1 in one list beats rank-2 in two lists only when " +
      "the arithmetic says so (no hidden normalization)") {
    val a = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val b = Seq((2L, 2), (3L, 1)).toDF("id", "rank")
    val byId = Ranking.rrfFuse(Seq("a" -> a, "b" -> b))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    def c(r: Int) = (1e12 / (60 + r)).floor.toLong
    assert(byId(2L) == 2 * c(2) && byId(1L) == c(1))
    assert(byId(2L) > byId(1L)) // 2/62 > 1/61 — fusion favors agreement
  }

  test("ndcgCurve: perfect ranking gives ndcg 1.0 at every depth; dcg " +
      "terms are the quantized longs; mrr is 1/first-relevant") {
    val ranked = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rn")
    val rel = Seq((1L, 3), (2L, 1), (3L, 0), (4L, 0)).toDF("id", "rel")
    val out = Ranking.ndcgCurve(ranked, rel, k = 3)
      .orderBy($"rn").collect()
    def disc(r: Int) = (1e6 / (math.log(r + 1) / math.log(2))).floor.toLong
    val t1 = 7L * disc(1); val t2 = 1L * disc(2)
    assert(out.map(_.getLong(3)).toSeq == Seq(t1, t1 + t2, t1 + t2))
    // ranking == ideal here → ndcg exactly 1.0 at every rank
    assert(out.forall(r => r.getDouble(5) == 1.0))
    assert(out.forall(r => r.getLong(6) == 1000000L))
  }

  test("ndcgCurve: swapped ranking dips below 1, unlisted ids default to " +
      "rel 0, and mrr reflects the first relevant rank") {
    val ranked = Seq((9L, 1), (1L, 2), (2L, 3)).toDF("id", "rn") // 9: no rel row
    val rel = Seq((1L, 3), (2L, 1)).toDF("id", "rel")
    val out = Ranking.ndcgCurve(ranked, rel, k = 3)
      .orderBy($"rn").collect()
    assert(out.map(_.getInt(2)).toSeq == Seq(0, 3, 1))
    assert(out.head.getLong(3) == 0L)          // rank-1 junk → dcg 0
    assert(out.head.getDouble(5) == 0.0)
    assert(out.last.getDouble(5) > 0 && out.last.getDouble(5) < 1.0)
    assert(out.forall(_.getLong(6) == 500000L)) // first relevant at rank 2
  }

  test("ndcgCurve: all-zero relevance yields NULL ndcg and NULL mrr") {
    val ranked = Seq((1L, 1), (2L, 2)).toDF("id", "rn")
    val rel = Seq((1L, 0), (2L, 0)).toDF("id", "rel")
    val out = Ranking.ndcgCurve(ranked, rel, k = 2).collect()
    assert(out.forall(_.isNullAt(5)) && out.forall(_.isNullAt(6)))
  }

  test("apCurve: hand-computed precision terms and AP; the AP@k " +
      "denominator is min(n_rel, k); unlisted ids are irrelevant") {
    // relevant at ranks 1, 3, 5 → P = 1, 2/3, 3/5; id 7 relevant but not
    // retrieved still counts in n_rel (recall is charged)
    val ranked = (1L to 5L).map(i => (i, i.toInt)).toDF("id", "rn")
    val rel = Seq((1L, 1), (3L, 1), (5L, 1), (7L, 1), (2L, 0)).toDF("id", "rel")
    val out = Ranking.apCurve(ranked, rel, k = 5)
      .orderBy($"rn").collect()
    assert(out.map(_.getBoolean(2)).toSeq ==
      Seq(true, false, true, false, true))
    assert(out.map(_.getLong(3)).toSeq == Seq(1L, 1L, 2L, 2L, 3L))
    val ps = out.map(r => if (r.isNullAt(4)) -1L else r.getLong(4)).toSeq
    assert(ps == Seq(1000000L, -1L, 666666L, -1L, 600000L))
    // AP = (1000000 + 666666 + 600000) div min(4, 5) = 566666
    assert(out.forall(r => r.getLong(5) == 4L && r.getLong(6) == 566666L))

    // graded labels + threshold: rel ≥ 2 relevant; n_rel counts the
    // corpus-wide positives under the same threshold
    val g = Ranking.apCurve(ranked,
      Seq((1L, 2), (3L, 1), (5L, 3)).toDF("id", "rel"), k = 5,
      relThreshold = 2).orderBy($"rn").collect()
    assert(g.map(_.getBoolean(2)).toSeq ==
      Seq(true, false, false, false, true))
    // P terms 1, 2/5 → AP = (1000000 + 400000) div 2 = 700000
    assert(g.forall(r => r.getLong(5) == 2L && r.getLong(6) == 700000L))

    // nothing relevant anywhere → AP 0, not NULL/divide-by-zero
    val z = Ranking.apCurve(ranked, Seq((1L, 0)).toDF("id", "rel"), k = 5)
      .collect()
    assert(z.forall(r => r.getLong(5) == 0L && r.getLong(6) == 0L))
  }

  private def mmrRows(df: org.apache.spark.sql.DataFrame) =
    df.as[(Int, Long, Long, Long, Long)].collect().toSeq

  test("mmrDiversify: a redundant near-duplicate is demoted below a less " +
      "relevant but novel candidate; exact hand-computed scores") {
    val cand = Seq((1L, 100L), (2L, 90L), (3L, 50L)).toDF("id", "rel_x9")
    val vecs = Seq(
      (1L, Seq(1f, 0f)), // docs 1 and 2 are identical directions
      (2L, Seq(1f, 0f)),
      (3L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val out = mmrRows(Ranking.mmrDiversify(cand, vecs, k = 3, lambdaMilli = 500))
    // pick 1: argmax 500·rel → doc 1 (score 50000, ms 0)
    // pick 2: doc 2 has cos 1.0 to doc 1 (ms 1e9 → score 45000 − 5e11);
    //         doc 3 is orthogonal (ms 0 → 25000) → doc 3 wins
    // pick 3: doc 2 last, with its full redundancy penalty
    assert(out == Seq(
      (1, 1L, 100L, 0L, 50000L),
      (2, 3L, 50L, 0L, 25000L),
      (3, 2L, 90L, 1000000000L, 45000L - 500L * 1000000000L)))
  }

  test("mmrDiversify: λ = 1000 is pure relevance order with id tie-break; " +
      "k cuts; candidates without a vector row drop") {
    val cand = Seq((5L, 70L), (2L, 70L), (9L, 80L), (7L, 60L)).toDF("id", "rel_x9")
    val vecs = Seq((5L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (9L, Seq(1f, 1f)))
      .toDF("vec_id", "embedding") // doc 7 has no vector → dropped
    val out = mmrRows(Ranking.mmrDiversify(cand, vecs, k = 3, lambdaMilli = 1000))
    assert(out.map(_._2) == Seq(9L, 2L, 5L)) // rel desc, then id asc at 70=70
    // scores are 1000·rel exactly: μ = 0 ⇒ the penalty term vanishes
    assert(out.map(_._5) == Seq(80000L, 70000L, 70000L))
  }

  test("mmrDiversify: anti-parallel vectors give a NEGATIVE max-sim that " +
      "boosts rather than penalizes; empty-selected max-sim is 0, not -1") {
    val cand = Seq((1L, 10L), (2L, 10L)).toDF("id", "rel_x9")
    val vecs = Seq((1L, Seq(1f, 0f)), (2L, Seq(-1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = mmrRows(Ranking.mmrDiversify(cand, vecs, k = 2, lambdaMilli = 500))
    // pick 1: tie at 500·10 → id 1; pick 2: cos(2,1) = −1 → ms = −1e9,
    // score = 5000 + 500·1e9 (novelty bonus, the standard MMR behavior)
    assert(out == Seq(
      (1, 1L, 10L, 0L, 5000L),
      (2, 2L, 10L, -1000000000L, 5000L + 500L * 1000000000L)))
  }

  test("mmrDiversify: the maxCandidates cap is loud, k beyond the pool " +
      "stops early, and bad λ is rejected") {
    val cand = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "rel_x9")
    val vecs = Seq((1L, Seq(1f)), (2L, Seq(1f)), (3L, Seq(1f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Ranking.mmrDiversify(cand, vecs, k = 2, maxCandidates = 2)
    }
    assert(e.getMessage.contains("maxCandidates"))
    assert(mmrRows(Ranking.mmrDiversify(cand, vecs, k = 10)).size == 3)
    intercept[IllegalArgumentException] {
      Ranking.mmrDiversify(cand, vecs, k = 2, lambdaMilli = 1001)
    }
  }
}
