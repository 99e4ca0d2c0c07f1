package graft.ops

import graft.SparkSpec

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  // quantized grain: 0.001f → 1 milli-unit
  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("kCenters: round 0 is the smallest id; later rounds pick the " +
      "farthest point with exact integer d2; ties break to smaller id") {
    val e = emb(
      (1L, Seq(0f, 0f)),
      (2L, Seq(1f, 0f)),      // q=(1000,0): farthest from 1 → round 1, d2=1e6
      (3L, Seq(0f, 0.002f)),  // q=(0,2): d2 to {1,2} = min(4, 1000²+4) = 4
      (4L, Seq(0f, -0.002f))) // symmetric to 3 → equidistant, larger id loses
    val out = Embeddings.kCenters(e, k = 4)
      .orderBy($"sel_round").as[(Int, Long, Long)].collect().toSeq
    assert(out == Seq((0, 1L, 0L), (1, 2L, 1000000L), (2, 3L, 4L), (3, 4L, 4L)))
  }

  test("kCenters: k=1 returns only the round-0 seed; selected points are " +
      "never re-picked (their mind collapses to 0)") {
    val e = emb((7L, Seq(1f)), (9L, Seq(2f)))
    assert(Embeddings.kCenters(e, k = 1).as[(Int, Long, Long)].collect()
      .toSeq == Seq((0, 7L, 0L)))
    val two = Embeddings.kCenters(e, k = 2).as[(Int, Long, Long)].collect()
    assert(two.map(_._2).distinct.length == 2)
  }

  test("kCenters degenerate inputs: empty corpus is a hard error; an " +
      "all-duplicates corpus selects each row once instead of re-picking " +
      "center 0; k above the corpus size stops early") {
    val e0 = intercept[IllegalArgumentException] {
      Embeddings.kCenters(emb(), k = 2)
    }
    assert(e0.getMessage.contains("empty"))
    val dup = emb((1L, Seq(1f, 1f)), (2L, Seq(1f, 1f)), (3L, Seq(1f, 1f)))
    val out = Embeddings.kCenters(dup, k = 3)
      .orderBy($"sel_round").as[(Int, Long, Long)].collect().toSeq
    assert(out.map(_._2) == Seq(1L, 2L, 3L), "each duplicate selected once")
    val short = Embeddings.kCenters(dup, k = 5)
      .as[(Int, Long, Long)].collect()
    assert(short.length == 3, "selection stops when the corpus is exhausted")
  }

  test("jlProject: p_j is the exact signed sum of quantized components " +
      "under the md5-seeded matrix; outDim rows per vector") {
    val e = emb((5L, Seq(0.5f, -1f, 2f)))
    val q = Array(500L, -1000L, 2000L)
    val signs = Embeddings.jlSigns(3, 2)
    val expected = (0 until 2).map { j =>
      (5L, j, signs.collect { case (i, jj, s) if jj == j => s * q(i) }.sum)
    }.toSet
    val out = Embeddings.jlProject(e, outDim = 2, dim = 3)
      .as[(Long, Int, Long)].collect().toSet
    assert(out == expected)
  }

  test("jlSigns: deterministic, ±1 only, and not degenerate (both signs " +
      "appear — md5 seeding actually varies)") {
    val a = Embeddings.jlSigns(8, 4)
    assert(a == Embeddings.jlSigns(8, 4))
    assert(a.map(_._3).toSet == Set(1L, -1L))
    assert(a.size == 32)
  }

  test("pcaTopComponent: recovers the dominant direction — diagonal " +
      "spread gives (707, 707), axis-aligned spread gives (1000, 0)") {
    val diag = emb((1L, Seq(1f, 1f)), (2L, Seq(2f, 2f)), (3L, Seq(-1f, -1f)))
    val vd = Embeddings.pcaTopComponent(diag, rounds = 4, dim = 2)
      .orderBy($"i").as[(Int, Long, Double)].collect()
    assert(vd.map(_._2).toSeq == Seq(707L, 707L), s"got ${vd.toSeq}")
    val axis = emb((1L, Seq(1f, 0f)), (2L, Seq(-2f, 0f)), (3L, Seq(3f, 0f)))
    val va = Embeddings.pcaTopComponent(axis, rounds = 4, dim = 2)
      .orderBy($"i").as[(Int, Long, Double)].collect()
    assert(va.map(_._2).toSeq == Seq(1000L, 0L), s"got ${va.toSeq}")
    // rayleigh is the scatter along the found direction: positive here
    assert(va.head._3 > 0)
  }

  test("pcaTopComponent: partition-layout invariant (exact integer " +
      "accumulation) and mean-invariant (scatter matrix centers)") {
    val rows = (0L until 20L).map { id =>
      (id, Seq((id % 5).toFloat, (id % 3).toFloat, 1f)) }
    val one = Embeddings.pcaTopComponent(
      emb(rows: _*).repartition(1), rounds = 3, dim = 3)
      .orderBy($"i").as[(Int, Long, Double)].collect().toSeq
    val many = Embeddings.pcaTopComponent(
      emb(rows: _*).repartition(7), rounds = 3, dim = 3)
      .orderBy($"i").as[(Int, Long, Double)].collect().toSeq
    assert(one == many)
    // adding a constant offset to every vector must not change the
    // direction: C = n·ΣqqT − S ST is the centered scatter
    val shifted = rows.map { case (id, v) => (id, v.map(_ + 2f)) }
    val sh = Embeddings.pcaTopComponent(
      emb(shifted: _*), rounds = 3, dim = 3)
      .orderBy($"i").as[(Int, Long, Double)].collect().toSeq
    assert(sh.map(_._2) == one.map(_._2), s"$sh vs $one")
  }

  test("jlProject preserves pairwise distance in expectation: the " +
      "distortion ratio over real-ish vectors stays within loose JL bounds") {
    // 16 deterministic 8-dim vectors; m=8 projections of an 8-dim space
    // reproduce distances only approximately — assert the audit ratio
    // proj_d2/(m·orig_d2) lands in a wide sanity band, not exactness
    val rows = (0L until 16L).map { id =>
      (id, (0 until 8).map(i => ((id * 31 + i * 17) % 13 - 6) / 3f).toSeq)
    }
    val e = emb(rows: _*)
    val proj = Embeddings.jlProject(e, outDim = 8, dim = 8)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (id, ps) =>
        id -> ps.sortBy(_._2).map(_._3) }
    val qv = rows.map { case (id, v) =>
      id -> v.map(x => math.floor(x * 1000 + 0.5).toLong) }.toMap
    val ratios = (0L until 15L).map { id =>
      val od = qv(id).zip(qv(id + 1)).map { case (a, b) => (a - b) * (a - b) }.sum
      val pd = proj(id).zip(proj(id + 1)).map { case (a, b) => (a - b) * (a - b) }.sum
      pd.toDouble / (8.0 * od)
    }
    assert(ratios.forall(r => r > 0.05 && r < 5.0), s"ratios $ratios")
    val mean = ratios.sum / ratios.size
    assert(mean > 0.4 && mean < 2.5, s"mean $mean")
  }

  test("labelSilhouette: orthogonal clusters score +1e6 per vec; " +
      "zero vectors dropped; single-label input yields no rows") {
    val e = Seq(
      (1L, Seq(1f, 0f), 0),
      (2L, Seq(1f, 0f), 0),
      (3L, Seq(0f, 1f), 1),
      (4L, Seq(0f, 1f), 1),
      (5L, Seq(0f, 0f), 0)) // zero norm: no direction, dropped
      .toDF("vec_id", "embedding", "label")
    val got = Embeddings.labelSilhouette(e)
      .orderBy($"label").as[(Long, Long, Long)].collect().toSeq
    // a = 1 − cos(own) = 0, b = 1 − cos(other) = 1, s = 1 → 1e6 each
    assert(got == Seq((0L, 2L, 2000000L), (1L, 2L, 2000000L)))

    // a vector sitting in the OTHER cluster's direction scores −1e6
    val mixed = Seq(
      (1L, Seq(1f, 0f), 0),
      (3L, Seq(0f, 1f), 0), // label 0 but aligned with label 1's centroid
      (2L, Seq(0f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    val m = Embeddings.labelSilhouette(mixed).orderBy($"label")
      .as[(Long, Long, Long)].collect().toSeq
    assert(m.head._1 == 0L && m.head._3 < 0L)

    // one label only: b undefined everywhere → empty result
    val solo = Seq((1L, Seq(1f, 0f), 0), (2L, Seq(0f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
    assert(Embeddings.labelSilhouette(solo).count() == 0L)
  }

  test("labelSilhouette: centroid norms beyond long range stay exact " +
      "through the DECIMAL kernel (sum-of-sums squared grows n_label²)") {
    // per-vector q = 3e9 (q² = 9e18, still a legal long), but the 2-vector
    // centroid component is 6e9 whose square 3.6e19 overflows a long —
    // the pre-fix path threw ANSI ArithmeticException here
    val big = Seq(
      (1L, Seq(3.0e6f, 0f), 0), (2L, Seq(3.0e6f, 0f), 0),
      (3L, Seq(0f, 3.0e6f), 1), (4L, Seq(0f, 3.0e6f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Embeddings.labelSilhouette(big)
      .orderBy($"label").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L, 2000000L), (1L, 2L, 2000000L)))
  }

  test("labelCentroidMatrix: exact ±1e6/0 cosines on axis-aligned " +
      "centroids (perfect-square norms), zero-mass label dropped, " +
      "upper triangle only; layout-invariant") {
    val df = Seq(
      (1L, Seq(1f, 0f), 1), (2L, Seq(1f, 0f), 1), // centroid (2000, 0)
      (3L, Seq(0f, 1f), 2),                       // centroid (0, 1000)
      (4L, Seq(-1f, 0f), 3),                      // centroid (-1000, 0)
      (5L, Seq(0f, 0f), 4))                       // zero mass → dropped
      .toDF("vec_id", "embedding", "label")
    def run(d: org.apache.spark.sql.DataFrame) =
      Embeddings.labelCentroidMatrix(d)
        .as[(Long, Long, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    val got = run(df)
    // norms 4e6/1e6/1e6 are perfect squares → the double tree is exact:
    // cos(1,3) = -2e6/(2000·1000) = exactly -1
    assert(got == Seq((1L, 2L, 0L), (1L, 3L, -1000000L), (2L, 3L, 0L)),
      s"got $got")
    assert(got == run(df.repartition(3)))
  }

  test("labelCentroidMatrix: graft.embeddings.maxLabels guard names the " +
      "k² nested-loop hazard instead of running it") {
    val df = Seq((1L, Seq(1f, 0f), 1), (2L, Seq(0f, 1f), 2),
      (3L, Seq(1f, 1f), 3)).toDF("vec_id", "embedding", "label")
    spark.conf.set("graft.embeddings.maxLabels", "2")
    try {
      val err = intercept[IllegalArgumentException] {
        Embeddings.labelCentroidMatrix(df).collect()
      }
      assert(err.getMessage.contains("graft.embeddings.maxLabels"),
        err.getMessage)
    } finally spark.conf.unset("graft.embeddings.maxLabels")
  }
}
