package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  test("temperatureAllocation: weights normalize, alpha<1 upsamples the tail") {
    val docs = (1 to 1000).map(i =>
      (if (i <= 900) "big" else "small", 10L)).toDF("src", "nt")
    val out = Mixture.temperatureAllocation(docs, $"src", $"nt",
      alpha = 0.5, budgetTokens = 10000L).collect()
    val byGroup = out.map(r => r.getAs[String]("group") ->
      (r.getAs[Double]("weight"), r.getAs[Long]("alloc_tokens"))).toMap
    assert(math.abs(out.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-9)
    // proportional would give small 10%; sqrt-scaling lifts it to 1/4
    assert(byGroup("small")._1 > 0.2 && byGroup("small")._1 < 0.3)
    assert(out.map(_.getAs[Long]("alloc_tokens")).sum <= 10000L)
  }

  test("epochShuffle: dense per-epoch positions, distinct permutations, " +
      "partitioning-invariant") {
    val docs = (1L to 60L).toDF("doc_id")
    val out = Mixture.epochShuffle(docs, "doc_id", epochs = 2)
    val byEpoch = out.collect().groupBy(_.getAs[Int]("epoch"))
    assert(byEpoch.keySet == Set(0, 1))
    byEpoch.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq == (0L until 60L))
    }
    // epoch permutations differ (same ids, different order)
    def perm(e: Int) = byEpoch(e).sortBy(_.getAs[Long]("pos"))
      .map(_.getAs[Long]("id")).toSeq
    assert(perm(0) != perm(1))
    // content-keyed: a different input layout yields identical positions
    val again = Mixture.epochShuffle(docs.repartition(7), "doc_id", 2)
      .orderBy("epoch", "id").collect()
    assert(again.sameElements(out.orderBy("epoch", "id").collect()))
  }

  test("curriculumBuckets: equal slices in quality order, bucket 0 cleanest") {
    val docs = (1L to 100L).map(i => (i, i * 10)).toDF("doc_id", "q6")
    val out = Mixture.curriculumBuckets(docs, "doc_id", $"q6", k = 4).collect()
    val sizes = out.groupBy(_.getAs[Long]("bucket")).view.mapValues(_.length).toMap
    assert(sizes == Map(0L -> 25, 1L -> 25, 2L -> 25, 3L -> 25))
    // highest q6 (= highest doc_id here) lands in bucket 0
    val b0 = out.filter(_.getAs[Long]("bucket") == 0L).map(_.getAs[Long]("id"))
    assert(b0.sorted.toSeq == (76L to 100L))
  }

  test("crossCorpusPairs: planted cross-corpus near-dups found, " +
      "intra-corpus pairs never reported") {
    def text(i: Long, tweak: String = "") =
      s"alpha bravo charlie delta echo foxtrot golf hotel india juliet $tweak doc$i"
    val other = "kilo lima mike november oscar papa quebec romeo sierra tango"
    val a = (1L to 10L).map(i => (i, text(i))).toDF("doc_id", "text")
    // b20 is a near-clone of a's doc 2; b21/b22 are near-clones of EACH
    // OTHER (same corpus, unrelated to A) and must not appear; b30+ are
    // unrelated noise
    val b = (Seq((20L, text(2, "x")), (21L, s"$other uno"), (22L, s"$other dos")) ++
      (30L to 35L).map(i => (i, s"totally different content number $i words"))
      ).toDF("doc_id", "text")
    val pairs = Dedup.crossCorpusPairs(a, b, threshold = 0.5).collect()
    assert(pairs.exists(r =>
      r.getAs[Long]("id_a") == 2L && r.getAs[Long]("id_b") == 20L))
    // every reported pair crosses the corpus boundary
    assert(pairs.forall(r => r.getAs[Long]("id_a") <= 10L &&
      r.getAs[Long]("id_b") >= 20L))
    // b21/b22 (intra-B near-dups) never pair with each other
    assert(!pairs.exists(r => r.getAs[Long]("id_b") == 21L ||
      r.getAs[Long]("id_b") == 22L))
  }

  test("proportionalInterleave: Bresenham slots — even spread, no clumping, " +
      "layout-invariant") {
    // source 'big' 8 docs, 'small' 2 docs → N = 10
    val docs = ((1L to 8L).map(i => (i, "big")) ++ Seq((100L, "small"), (101L, "small")))
      .toDF("doc_id", "source")
    val out = Mixture.proportionalInterleave(docs, "doc_id", "source")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("group"),
        r.getAs[Long]("r"), r.getAs[Long]("ikey")))
    // small source: slots (2r+1)*10/4 = 2, 7 — spread across the stream,
    // not clumped at the end
    assert(out.filter(_._2 == "small").map(_._4).sorted.toSeq == Seq(2L, 7L))
    // big source: slots (2r+1)*10/16 = 0,1,3,4,5,6,8,9
    assert(out.filter(_._2 == "big").map(_._4).sorted.toSeq ==
      Seq(0L, 1L, 3L, 4L, 5L, 6L, 8L, 9L))
    // keys strictly increase with r inside a source (even pacing)
    out.groupBy(_._2).foreach { case (_, xs) =>
      val byR = xs.sortBy(_._3).map(_._4)
      assert(byR.zip(byR.tail).forall { case (a, b) => a < b })
    }
    val out2 = Mixture.proportionalInterleave(docs.repartition(7), "doc_id", "source")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("ikey")).toMap
    assert(out.map(r => r._1 -> r._4).toMap == out2)
  }

  test("negativeSamplingTable: contiguous ranges, width = n^0.75 basis, " +
      "frequent tokens damped") {
    // 'common' 16x, 'mid' 8x, 'rare' 1x
    val docs = Seq((1L, ("common " * 16 + "mid " * 8 + "rare").trim))
      .toDF("doc_id", "text")
    val rows = Mixture.negativeSamplingTable(docs)
      .orderBy("token").collect().map(r => (r.getAs[String]("token"),
        r.getAs[Long]("n"), r.getAs[Long]("basis"),
        r.getAs[Long]("cum_start"), r.getAs[Long]("cum_end")))
    // basis = floor(n^0.75 * 1e6): 16^0.75 = 8, 8^0.75 = 4.7568..., 1 → 1
    val m = rows.map(r => r._1 -> r).toMap
    assert(m("common")._3 == 8000000L)
    assert(m("rare")._3 == 1000000L)
    assert(m("mid")._3 == 4756828L)
    // token-ordered ranges tile [0, total) with no gaps or overlaps
    val ordered = rows.sortBy(_._4)
    assert(ordered.head._4 == 0L)
    ordered.zip(ordered.tail).foreach { case (a, b) => assert(a._5 == b._4) }
    rows.foreach(r => assert(r._5 - r._4 == r._3))
    // damping: mass per occurrence shrinks as frequency grows
    assert(m("common")._3 * m("rare")._2 < m("rare")._3 * m("common")._2)
  }
}
