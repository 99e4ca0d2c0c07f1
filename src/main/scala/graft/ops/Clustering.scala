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

  /** Davies–Bouldin cluster-quality report over an assignment (squared-
    * distance scatter variant): per cluster, scatter Sᵢ = SSEᵢ/nᵢ against
    * centroids RECOMPUTED from the final assignment (rounded quantized
    * mean — the [[lloydAssign]] recentering formula, so the report is
    * self-contained given any (id, cluster) frame), separation Mᵢⱼ =
    * exact squared centroid distance, and the DB term maxⱼ (Sᵢ+Sⱼ)/Mᵢⱼ
    * (ties to the smaller j; identical-centroid pairs excluded). The
    * pre-SemDedup gate: a cluster with a large DB term is not separable
    * enough to block on.
    *
    * Determinism: SSE/M are exact long sums; Sᵢ is one double division;
    * the DB ratio is (Sᵢ+Sⱼ)/Mᵢⱼ — two IEEE ops on identical doubles,
    * reproducible cross-engine. Scale shape: two corpus passes (centroid
    * partial-agg, scatter partial-agg) over slim (id, dim, qv) rows plus
    * a k×dim control frame self-joined into k² pairs — nothing above
    * the exchange grows with corpus size.
    */
  def daviesBouldin(emb: DataFrame, assign: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ex = emb.select(col(idCol).cast("long").as("id"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("id"), col("dim"),
        floor(col("x").cast("double") * 1000 + 0.5).cast("long").as("qv"))
    // slim (id, cluster) labels consumed by two fact joins + sizes: pin so
    // the caller's assignment pass (a full corpus kernel scan) runs once
    val a = assign.select(col(idCol).cast("long").as("id"), col("cluster"))
      .localCheckpoint()
    val exa = ex.join(a, "id")
    val c2 = exa.groupBy(col("cluster"), col("dim"))
      .agg(count(lit(1)).as("cnt"), sum(col("qv")).as("sq"))
      .select(col("cluster"), col("dim"),
        floor(col("sq").cast("double") / col("cnt") + 0.5).cast("long").as("cv"))
      .localCheckpoint() // k×dim control frame; feeds scatter + separation
    val sizes = a.groupBy(col("cluster")).agg(count(lit(1)).as("n"))
    // k-row scatter frame feeds si, sj AND the final join (three
    // consumers): pin it so the corpus SSE pass runs once
    val scat = exa.join(c2, Seq("cluster", "dim"))
      .groupBy(col("cluster"))
      .agg(sum((col("qv") - col("cv")) * (col("qv") - col("cv"))).as("sse"))
      .join(sizes, "cluster")
      .select(col("cluster"), col("n"), col("sse"),
        (col("sse").cast("double") / col("n")).as("scatter"))
      .localCheckpoint()
    val mm = c2.as("x")
      .join(c2.as("y"), expr("x.dim = y.dim AND x.cluster <> y.cluster"))
      .groupBy(col("x.cluster").as("ci"), col("y.cluster").as("cj"))
      .agg(sum((col("x.cv") - col("y.cv")) * (col("x.cv") - col("y.cv")))
        .as("m2"))
    val si = scat.select(col("cluster").as("ci"), col("scatter").as("s_i"))
    val sj = scat.select(col("cluster").as("cj"), col("scatter").as("s_j"))
    val db = mm.filter(col("m2") > 0)
      .join(si, "ci").join(sj, "cj")
      .withColumn("r", (col("s_i") + col("s_j")) / col("m2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("ci")).orderBy(col("r").desc, col("cj"))))
      .filter(col("rk") === 1)
      .select(col("ci").as("cluster"), col("cj").as("worst_other"),
        col("r").as("db_term"))
    scat.join(db, "cluster")
      .select(col("cluster"), col("n"), col("sse"), col("scatter"),
        col("worst_other"), col("db_term"))
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
