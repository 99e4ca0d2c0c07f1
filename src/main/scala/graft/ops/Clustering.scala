package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd) over embedding columns — the clustering
  * face of the training-data pipeline (topic bucketing, SemDedup cluster
  * blocking, IVF coarse quantizers all start here).
  *
  * Everything is exact integer arithmetic over milli-quantized vectors
  * (same grain as [[Similarity.quantize]]), so every iteration is
  * bit-deterministic regardless of partitioning AND reproducible by an
  * external engine:
  *   - seeding: the k corpus vectors with the smallest UNSIGNED md5-low64
  *     of their id string ([[Dedup.md5Low64]] ≡ DuckDB `md5_number_lower`)
  *     become centroids 0..k-1 in hash order — a deterministic hash sample,
  *     not `rand()`, so retries/repartitions reseed identically;
  *   - assignment: argmin of the exact long squared-L2 distance, ties to
  *     the smallest centroid id (components ≤ ~2^12 ⇒ a 64-term distance
  *     sits below 2^32 — no overflow under ANSI);
  *   - recentering: per-dimension rounded mean floor(sum/n + 0.5) — one
  *     double division of exact-in-double longs, bit-identical across
  *     engines; empty clusters are DROPPED (their id vanishes; surviving
  *     ids keep their numbering).
  *
  * Scale shape: each iteration is ONE narrow pass over the corpus
  * (mapPartitions kernel, k×dim long accumulators per partition — a few
  * KB) whose partials reduce through a k×dim-row codegen aggregation;
  * centroids live on the driver between iterations (control plane, k×dim
  * longs). No corpus-sized shuffle, no driver materialization of rows.
  * At 100 TB the per-iteration cost is the scan itself; nothing here
  * grows with corpus size except that scan.
  */
object Clustering {

  /** Lloyd assignment after `iters` passes (`iters`-1 recenterings):
    * (idCol, cluster, qdist) — qdist the exact integer squared-L2 distance
    * to the winning centroid in milli-units². */
  def lloydAssign(emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && iters >= 1, s"need k>=1, iters>=1; got k=$k iters=$iters")
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Seq[Float])]

    // --- seeding: k smallest unsigned md5-low64(id) — distributed top-k
    // (TakeOrdered over a projected id scan), then a k-row point fetch.
    val seedIds: Array[Long] = emb.select(col(idCol).cast("long")).as[Long]
      // ^MinValue flips the sign bit: signed order of the flipped value
      // ≡ unsigned order of the hash (DuckDB's UBIGINT natural order)
      .map(id => (Dedup.md5Low64(id.toString) ^ Long.MinValue, id))
      .toDF("h", "id").orderBy($"h", $"id").limit(k)
      .select($"id").as[Long].collect()
    val seedSet = seedIds.toSet
    val seedVecs: Map[Long, Array[Long]] = vecs
      .filter(r => seedSet.contains(r._1))
      .collect().map { case (id, v) => id -> Similarity.quantizeJvm(v) }.toMap
    // cid = position in hash order
    var cents: Array[(Int, Array[Long])] =
      seedIds.zipWithIndex.map { case (id, i) => (i, seedVecs(id)) }

    // --- iters-1 recenterings, each one distributed pass
    (1 until iters).foreach { _ =>
      val bc = spark.sparkContext.broadcast(cents)
      // per-partition partials: (cid, dim, partialSum) plus a dim=-1 count
      // row — tiny fixed-width rows that reduce through a codegen hash agg
      val partials = vecs.mapPartitions { it =>
        val cs = bc.value
        val dim = if (cs.isEmpty) 0 else cs(0)._2.length
        val sums = collection.mutable.Map.empty[Int, Array[Long]]
        val counts = collection.mutable.Map.empty[Int, Long]
        it.foreach { case (_, v) =>
          val q = Similarity.quantizeJvm(v)
          val cid = nearestL2(q, cs)._1
          val s = sums.getOrElseUpdate(cid, new Array[Long](dim))
          var i = 0
          while (i < dim) { s(i) += q(i); i += 1 }
          counts(cid) = counts.getOrElse(cid, 0L) + 1
        }
        sums.iterator.flatMap { case (cid, s) =>
          Iterator.single((cid, -1, counts(cid))) ++
            s.iterator.zipWithIndex.map { case (v, d) => (cid, d, v) }
        }
      }.toDF("cid", "dim", "s")
        .groupBy($"cid", $"dim").agg(sum($"s").as("s"))
        .collect()
      bc.destroy()
      val byCid = partials.groupBy(_.getInt(0))
      cents = cents.flatMap { case (cid, _) =>
        byCid.get(cid).map { rows =>
          val n = rows.find(_.getInt(1) == -1).get.getLong(2)
          val dims = rows.filter(_.getInt(1) >= 0).sortBy(_.getInt(1))
          // rounded quantized mean: one double division of exact longs
          (cid, dims.map(r => math.floor(r.getLong(2).toDouble / n + 0.5).toLong))
        } // absent cid ⇒ empty cluster ⇒ dropped
      }
    }

    // --- final assignment pass
    val bc = spark.sparkContext.broadcast(cents)
    vecs.map { case (id, v) =>
      val (cid, d) = nearestL2(Similarity.quantizeJvm(v), bc.value)
      (id, cid, d)
    }.toDF(idCol, "cluster", "qdist")
  }

  /** Argmin of exact long squared-L2; first minimum in cid-ascending order
    * wins (centroids arrive cid-sorted), i.e. ties break to smallest cid. */
  private def nearestL2(q: Array[Long], cents: Array[(Int, Array[Long])]): (Int, Long) = {
    var best = -1
    var bd = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)._2
      var d = 0L
      var i = 0
      while (i < q.length) { val t = q(i) - cv(i); d += t * t; i += 1 }
      if (d < bd) { bd = d; best = cents(c)._1 }
      c += 1
    }
    (best, bd)
  }
}
