package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  /** 3 well-separated planted blobs in 8-dim: blob b centered at 0.5 on
    * dims {b, b+3}, small deterministic jitter elsewhere. */
  private def planted(n: Int) = (0 until n).map { i =>
    val b = i % 3
    val v = Array.tabulate(8) { d =>
      val base = if (d == b || d == b + 3) 0.5f else 0.0f
      base + ((i * 31 + d * 7) % 5) * 0.004f
    }
    (i.toLong, v.toSeq)
  }.toDF("vec_id", "embedding")

  test("lloydAssign recovers planted blobs (co-membership)") {
    val out = Clustering.lloydAssign(planted(90), k = 3, iters = 4)
      .as[(Long, Int, Long)].collect()
    val byBlob = out.groupBy(r => r._1 % 3).view.mapValues(_.map(_._2).toSet)
    // every blob maps to exactly one cluster, and the three are distinct
    byBlob.values.foreach(cs => assert(cs.size == 1, s"split blob: $byBlob"))
    assert(byBlob.values.flatten.toSet.size == 3)
  }

  test("lloydAssign is partition-invariant and deterministic") {
    val docs = planted(60)
    val a = Clustering.lloydAssign(docs, k = 3, iters = 3)
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    val b = Clustering.lloydAssign(docs.repartition(7), k = 3, iters = 3)
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("iters=1 assigns against the raw md5-hash seeds") {
    val docs = planted(12)
    // recompute seeds by hand: 3 smallest unsigned md5-low64 ids
    val seedIds = (0L until 12L)
      .sortBy(id => Dedup.md5Low64(id.toString) ^ Long.MinValue).take(3)
    val q = docs.as[(Long, Seq[Float])].collect().toMap
      .map { case (id, v) => id -> Similarity.quantizeJvm(v) }
    val out = Clustering.lloydAssign(docs, k = 3, iters = 1)
      .as[(Long, Int, Long)].collect()
    out.foreach { case (id, cid, qd) =>
      val dists = seedIds.zipWithIndex.map { case (sid, c) =>
        val d = q(id).zip(q(sid)).map { case (x, y) => (x - y) * (x - y) }.sum
        (d, c)
      }
      assert((qd, cid) == dists.min, s"vec $id")
    }
  }

  test("empty clusters are dropped, survivors keep their ids") {
    // 2 tight blobs but k=4: at least one seed goes empty after recenter
    val docs = (0 until 40).map { i =>
      val b = i % 2
      (i.toLong, Array.tabulate(4)(d => if (d == b) 1.0f else 0.0f).toSeq)
    }.toDF("vec_id", "embedding")
    val out = Clustering.lloydAssign(docs, k = 4, iters = 3)
      .as[(Long, Int, Long)].collect()
    val used = out.map(_._2).toSet
    // seeds are the 4 smallest-hash ids; with only 2 distinct points in the
    // data, ties collapse onto the smallest cid per blob — every other
    // cluster empties and is dropped
    val seedBlobs = (0L until 40L)
      .sortBy(id => Dedup.md5Low64(id.toString) ^ Long.MinValue)
      .take(4).map(_ % 2).toSet
    assert(used.size == seedBlobs.size, s"got $used for seed blobs $seedBlobs")
    assert(used.subsetOf(Set(0, 1, 2, 3)))
    // all members of a blob land together
    assert(out.groupBy(_._1 % 2).values.forall(_.map(_._2).toSet.size == 1))
  }

  test("daviesBouldin: exact scatter/separation for two tight far blobs " +
      "and the (S_i+S_j)/M_ij ratio") {
    val e = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(0f, 0.002f)),     // A: c=(0,1), sse=2
      (3L, Seq(1f, 0f)), (4L, Seq(1f, 0.002f)))     // B: c=(1000,1), sse=2
      .toDF("vec_id", "embedding")
    val a = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1)).toDF("vec_id", "cluster")
    val out = Clustering.daviesBouldin(e, a)
      .orderBy($"cluster")
      .as[(Int, Long, Long, Double, Int, Double)].collect().toSeq
    assert(out == Seq(
      (0, 2L, 2L, 1.0, 1, 2.0 / 1000000),
      (1, 2L, 2L, 1.0, 0, 2.0 / 1000000)))
  }

  test("daviesBouldin: identical-centroid pairs are excluded from the " +
      "worst-ratio search (no division by zero)") {
    val e = Seq(
      (1L, Seq(0f)), (2L, Seq(0f)),   // A and B share centroid (0)
      (3L, Seq(0f)),
      (4L, Seq(1f)))                  // C far away
      .toDF("vec_id", "embedding")
    val a = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 2)).toDF("vec_id", "cluster")
    val out = Clustering.daviesBouldin(e, a)
      .orderBy($"cluster")
      .as[(Int, Long, Long, Double, Int, Double)].collect().toSeq
    // clusters 0 and 1 both sit at q=0: their mutual pair has m2=0 and
    // must not appear; the worst valid other for both is cluster 2
    assert(out.map(_._5).toSeq == Seq(2, 2, 0))
  }
}
