package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-corpus utilities beyond search: greedy k-center coreset
  * selection (diversity sampling) and Johnson–Lindenstrauss sign
  * projection (dimensionality reduction ahead of the ANN family).
  *
  * Numeric contract: all vector math runs on milli-quantized longs
  * ([[Similarity.quantize]] grain), so distances/projections are exact
  * integers — bit-deterministic under any partitioning and reproducible
  * by an external engine. Randomness is md5-derived from stable strings
  * (never `rand()`), so retries and repartitions replay identically.
  */
object Embeddings {

  /** Greedy k-center (farthest-point / Gonzalez) coreset selection: round
    * 0 picks the smallest id; each later round picks the point farthest
    * (exact long squared-L2) from everything selected so far, ties to the
    * smallest id. The classic 2-approximation to the k-center cover, used
    * as a diversity-max sampler for eval/annotation subsets.
    *
    * Scale shape: the per-row state (id, quantized vec, min-dist-so-far)
    * stays distributed; each round is ONE narrow pass updating `mind`
    * against the single new center (tight JVM loop over a 1-row control
    * frame collected via TakeOrdered — the same control-plane contract as
    * [[Clustering.lloydAssign]]'s centroids) plus a `localCheckpoint`
    * barrier, because the state feeds both the argmax and the next round
    * (the BFS/k-core discipline: state consumed twice per round). Total
    * cost k scans — O(k·n·dim) with no corpus-sized shuffle at all.
    *
    * Degenerate inputs: an empty corpus is a hard error (require);
    * already-selected points never re-enter the argmax, so an
    * all-duplicates corpus selects each row once (by id) rather than
    * re-picking center 0, and a corpus with fewer than k rows returns
    * one row per corpus point (selection stops when exhausted).
    *
    * @return (sel_round, id, d2) — d2 the exact squared distance from the
    *         selected point to the previously selected set (0 at round 0)
    */
  def kCenters(emb: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"need k>=1; got $k")
    val spark = emb.sparkSession
    import spark.implicits._
    // quantize ONCE; Long.MaxValue sentinel = "no center seen yet"
    var state = emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Seq[Float])]
      .map { case (id, v) => (id, Similarity.quantizeJvm(v), Long.MaxValue) }
      .toDF("id", "qv", "mind").as[(Long, Array[Long], Long)]
      .localCheckpoint()

    val selected = Seq.newBuilder[(Int, Long, Long)]
    val picked = scala.collection.mutable.ArrayBuffer.empty[Long]
    var r = 0
    var exhausted = false
    while (r < k && !exhausted) {
      // already-selected ids are excluded from the argmax: on an
      // all-duplicates corpus every mind is 0 and the (mind desc, id) tie
      // would otherwise re-select center 0 forever. With fewer rows than
      // k the selection stops early (fewer than k output rows).
      val cand =
        if (r == 0) state.orderBy($"id").take(1)
        else state.filter(!$"id".isin(picked.toSeq: _*))
          .orderBy($"mind".desc, $"id").take(1)
      if (r == 0) require(cand.nonEmpty,
        "kCenters: embedding corpus is empty")
      if (cand.isEmpty) exhausted = true
      else {
        val row = cand.head
        val (cid, cvec, cd) =
          if (r == 0) (row._1, row._2, 0L) else (row._1, row._2, row._3)
        picked += cid
        selected += ((r, cid, cd))
        if (r < k - 1) {
          val bc = spark.sparkContext.broadcast(cvec)
          state = state.map { case (id, qv, mind) =>
            val cv = bc.value
            var d = 0L; var i = 0
            while (i < qv.length) { val t = qv(i) - cv(i); d += t * t; i += 1 }
            (id, qv, math.min(mind, d))
          }.toDF("id", "qv", "mind").as[(Long, Array[Long], Long)]
            .localCheckpoint()
        }
      }
      r += 1
    }
    selected.result().toDF("sel_round", "id", "d2")
  }

  /** Top principal component of the embedding corpus by deterministic
    * quantized power iteration over the exact-integer scatter matrix
    * C = n·Σqqᵀ − (Σq)(Σq)ᵀ (n² × the covariance — same eigenvectors).
    *
    * Determinism contract (the oracle replays every step bit-for-bit):
    *   - G = Σ q qᵀ and S = Σ q are exact long sums (order-free);
    *   - Cn = floor(C/n) via one double division (C < 2⁵³ ⇒ exact);
    *   - each round: w = Cn·v (exact longs), wq = floor(w/2²⁵) (division
    *     by a power of two is exact in IEEE), v' = floor(wq·1000/√Σwq²)
    *     — the norm is a sqrt of an exact long, so both engines compute
    *     the identical double;
    *   - v₀ = (1000, …, 1000); a zero-norm round keeps v (degenerate
    *     corpus guard).
    *
    * Scale shape: ONE pass over the corpus — a mapPartitions kernel
    * accumulating dim×dim long partials (the [[Clustering.lloydAssign]]
    * discipline), reduced through a hash aggregate to a control-plane
    * matrix; the iteration itself is driver math over dim² longs. Exact-
    * integer regime holds to n ≈ 5·10⁵ vectors (n²·maxq² < 2⁶³); beyond
    * that, feed a deterministic hash sample — the same contract as IVF
    * training.
    *
    * @return (i, v_x3, rayleigh) — final direction in 1e-3 units and its
    *         Rayleigh quotient vᵀCn·v / vᵀv (one double division)
    */
  def pcaTopComponent(emb: DataFrame, rounds: Int = 4,
      vecCol: String = "embedding", dim: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val parts = emb.select(col(vecCol)).as[Seq[Float]]
      .mapPartitions { it =>
        val g = Array.ofDim[Long](dim * dim)
        val s = new Array[Long](dim)
        var n = 0L
        it.foreach { v =>
          val q = Similarity.quantizeJvm(v)
          var i = 0
          while (i < dim) {
            s(i) += q(i)
            var j = 0
            while (j < dim) { g(i * dim + j) += q(i) * q(j); j += 1 }
            i += 1
          }
          n += 1
        }
        if (n == 0) Iterator.empty
        else Iterator.single((-1, -1, n)) ++
          s.iterator.zipWithIndex.map { case (x, i) => (i, -1, x) } ++
          g.iterator.zipWithIndex.map { case (x, ij) =>
            (ij / dim, ij % dim, x) }
      }.toDF("i", "j", "x")
      .groupBy($"i", $"j").agg(sum($"x").as("x"))
      .collect()
    val n = parts.find(r => r.getInt(0) == -1 && r.getInt(1) == -1)
      .map(_.getLong(2)).getOrElse(0L)
    require(n > 0, "pcaTopComponent needs a non-empty corpus")
    val sv = new Array[Long](dim)
    val gm = Array.ofDim[Long](dim * dim)
    parts.foreach { r =>
      val (i, j, x) = (r.getInt(0), r.getInt(1), r.getLong(2))
      if (i >= 0 && j == -1) sv(i) = x
      else if (i >= 0 && j >= 0) gm(i * dim + j) = x
    }
    // Cn = floor((n·G − S Sᵀ)/n) — exact longs into one exact double div
    val cn = Array.tabulate(dim * dim) { ij =>
      val i = ij / dim; val j = ij % dim
      math.floor((n * gm(ij) - sv(i) * sv(j)).toDouble / n).toLong
    }
    var v = Array.fill(dim)(1000L)
    (0 until rounds).foreach { _ =>
      val w = Array.tabulate(dim) { i =>
        var acc = 0L; var j = 0
        while (j < dim) { acc += cn(i * dim + j) * v(j); j += 1 }
        acc
      }
      val wq = w.map(x => math.floor(x / 33554432.0).toLong) // /2^25 exact
      val n2 = wq.map(x => x * x).sum
      if (n2 > 0) {
        val nrm = math.sqrt(n2.toDouble)
        v = wq.map(x => math.floor(x * 1000 / nrm).toLong)
      }
    }
    // Rayleigh quotient of the final direction, in Cn units
    val wf = Array.tabulate(dim) { i =>
      var acc = 0L; var j = 0
      while (j < dim) { acc += cn(i * dim + j) * v(j); j += 1 }
      acc
    }
    val num = v.zip(wf).map { case (a, b) => a * b }.sum
    val den = v.map(x => x * x).sum
    val lam = if (den > 0) num.toDouble / den else 0.0
    v.zipWithIndex.map { case (x, i) => (i, x, lam) }
      .toSeq.toDF("i", "v_x3", "rayleigh")
  }

  /** md5-seeded ±1 sign matrix for [[jlProject]]: sign(i,j) = +1 iff
    * md5-low64("jl:i:j") is even — DuckDB-reproducible via
    * `md5_number_lower(concat(...)) % 2`. */
  def jlSigns(dim: Int, outDim: Int): Seq[(Int, Int, Long)] =
    for (i <- 0 until dim; j <- 0 until outDim)
      yield (i, j, if ((Dedup.md5Low64(s"jl:$i:$j") & 1L) == 0L) 1L else -1L)

  /** Johnson–Lindenstrauss sign projection: p_j = Σ_i sign(i,j)·q_i over
    * milli-quantized components — exact longs, with E[‖p‖²] = outDim·‖q‖²
    * (±1 entries, no 1/√m scaling; consumers divide by outDim).
    *
    * Scale shape: posexplode (Generate, codegen) → broadcast join against
    * the dim×outDim sign matrix (control plane) → partial+final hash
    * aggregate on (id, j). The fan-out is dim×outDim per row map-side
    * only; the exchange carries n·outDim slim long rows. This is the
    * row-multiplying path, so it is Generate + codegen aggregation, NOT
    * a higher-order-function lambda (the SCALE.md q102/q124 lesson).
    *
    * @return (id, j, p) — outDim rows per input vector
    */
  def jlProject(emb: DataFrame, outDim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val signs = broadcast(jlSigns(dim, outDim).toDF("i", "j", "sgn"))
    // quantize AFTER the explode: scalar floor/cast on the exploded value
    // stays in whole-stage codegen (an array-transform lambda would be
    // interpreted and re-inlined per consumer — Similarity's qat lesson)
    emb.select(col(idCol).cast("long").as("id"),
        posexplode(col(vecCol)).as(Seq("i", "x")))
      .select(col("id"), col("i"),
        floor(col("x").cast("double") * 1000 + 0.5).cast("long").as("q"))
      .join(signs, "i")
      .groupBy(col("id"), col("j"))
      .agg(sum(col("q") * col("sgn")).as("p"))
  }

  /** Centroid silhouette per label: how well-separated are the labeled
    * clusters in embedding space? For each vector, a = cosine distance to
    * its OWN label centroid, b = the smallest cosine distance to any
    * OTHER label's centroid, s = (b − a)/max(a, b) — the classic
    * silhouette with centroid distances standing in for mean pairwise
    * distance (the O(n·k) "simplified silhouette", vs O(n²) exact; at
    * corpus scale the pairwise form is never an option).
    *
    * Exactness: vectors are milli-quantized longs; a centroid is its
    * cluster's component-wise integer SUM (cosine is scale-invariant, so
    * the un-divided sum vector IS the centroid direction — no float mean),
    * making every dot/norm an exact integer; cosine and the silhouette
    * ratio are fixed double trees over those exact integers, quantized
    * floor(·10⁶). Vectors with zero quantized norm are dropped (no
    * direction). Because centroid components grow with n_label, the
    * centroid norm Σ(Σx_i)² grows with n_label² — a long would overflow
    * at ~3×10⁶ coherent milli-quantized unit vectors per label — so the
    * centroid-side norm and the query·centroid dot run through
    * [[Similarity.normIntBig]]/[[Similarity.dotIntBig]] (DECIMAL(38,0),
    * exact through n_label ≈ 10¹⁵; HUGEINT on the oracle side).
    *
    * Scale: one explode-aggregate builds k·dim centroid components (a
    * control-plane frame, broadcast back); each vector then meets exactly
    * k centroid rows — O(n·k) with nothing corpus-sized shuffled.
    *
    * @return per label: (label, n_vecs, sil_sum_x6) — mean silhouette is
    *         sil_sum_x6 / (n_vecs·10⁶), left to the caller
    */
  def labelSilhouette(emb: DataFrame, labelCol: String = "label",
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = emb.select(col(idCol).cast("long").as("id"),
        col(labelCol).cast("long").as("lbl"),
        Similarity.quantize(col(vecCol)).as("qv"))
      .withColumn("xx", Similarity.normInt(col("qv")))
      .filter(col("xx") > 0L)
      .localCheckpoint() // feeds the centroid build AND the scoring pass
    // centroid = per-label component sums: k·dim rows, then re-packed to
    // one array row per label (sorted by position — deterministic)
    val comp = q.select(col("lbl"), posexplode(col("qv")).as(Seq("i", "x")))
      .groupBy(col("lbl"), col("i")).agg(sum(col("x")).as("s"))
    val cents = comp.groupBy(col("lbl").as("clbl"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("s")))),
        e => e.getField("s")).as("cv"))
      .withColumn("cc", Similarity.normIntBig(col("cv")))
      .filter(col("cc") > 0L)
    val dbl = "double"
    val cos = Similarity.dotIntBig(col("qv"), col("cv")).cast(dbl) /
      (sqrt(col("xx").cast(dbl)) * sqrt(col("cc").cast(dbl)))
    val scored = q.join(broadcast(cents), lit(true))
      .select(col("id"), col("lbl"),
        (col("clbl") === col("lbl")).as("own"),
        (lit(1.0d) - cos).as("d"))
      .groupBy(col("id"), col("lbl"))
      .agg(max(when(col("own"), col("d"))).as("a"),
        min(when(!col("own"), col("d"))).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    val s = when(greatest(col("a"), col("b")) > 0.0d,
      (col("b") - col("a")) / greatest(col("a"), col("b"))).otherwise(0.0d)
    scored
      .select(col("lbl").as("label"), floor(s * lit(1e6)).cast("long").as("sx"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("sx")).as("sil_sum_x6"))
  }

  /** Pairwise cosine between LABEL CENTROIDS — the embedding-space
    * confusion/drift matrix: which labeled groups point the same way
    * (candidates for merging, or evidence of label noise / source drift)
    * and which are orthogonal. The pairwise complement of
    * [[labelSilhouette]] (that scores member-to-centroid cohesion; this
    * scores centroid-to-centroid separation).
    *
    * EXACTNESS: the [[labelSilhouette]] integer-centroid contract —
    * cosine is scale-invariant, so un-divided component SUMS are the
    * centroid directions; dots/norms through DECIMAL(38,0)
    * ([[Similarity.dotIntBig]], HUGEINT on a SQL engine), and the final
    * cosine is one fixed double tree over exact integers, quantized ·10⁶.
    *
    * Scale shape: one corpus pass to k·dim component sums (map-side
    * combined), re-packed to k centroid rows and checkpointed; the k×k
    * upper-triangle pairing is a control-plane cross of k-row frames
    * (labels are a bounded axis — the q186 discipline). The non-equi
    * pair predicate plans as a nested loop, so the bounded axis is
    * ENFORCED, not assumed: a runtime `graft.embeddings.maxLabels`
    * guard (default 10 000 → ≤ ~5·10⁷ pairs) fails with a named error
    * instead of silently degrading to an O(k²) loop on a
    * high-cardinality label column (the `graft.ann.maxProbe` pattern).
    * Zero-mass labels drop (no direction to compare).
    *
    * @return (label_a, label_b, cos_x6) for label_a < label_b, cosine
    *         in 1e-6 units */
  def labelCentroidMatrix(emb: DataFrame, labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame = {
    val q = emb.select(col(labelCol).cast("long").as("lbl"),
      Similarity.quantize(col(vecCol)).as("qv"))
    val comp = q.select(col("lbl"), posexplode(col("qv")).as(Seq("i", "x")))
      .groupBy(col("lbl"), col("i")).agg(sum(col("x")).as("s"))
    val cents = comp.groupBy(col("lbl"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("s")))),
        e => e.getField("s")).as("cv"))
      .withColumn("cc", Similarity.normIntBig(col("cv")))
      .filter(col("cc") > 0L)
      .localCheckpoint() // consumed by BOTH sides of the pair cross
    val maxLabels = emb.sparkSession.conf
      .get("graft.embeddings.maxLabels", "10000").toLong
    val k = cents.count() // k rows — control-plane by construction
    require(k <= maxLabels,
      s"labelCentroidMatrix: $k distinct labels exceeds " +
        s"graft.embeddings.maxLabels=$maxLabels — the k x k centroid pair " +
        "cross is a nested-loop join sized k^2; this label column is not a " +
        "bounded axis. Cluster first (kMeans/kCenter) or raise the conf if " +
        "k^2 pairs are genuinely wanted.")
    val a = cents.select(col("lbl").as("label_a"), col("cv").as("cva"),
      col("cc").as("cca"))
    val b = cents.select(col("lbl").as("label_b"), col("cv").as("cvb"),
      col("cc").as("ccb"))
    a.join(b, col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"),
        floor(Similarity.dotIntBig(col("cva"), col("cvb")).cast("double")
          / (sqrt(col("cca").cast("double")) * sqrt(col("ccb").cast("double")))
          * lit(1e6)).cast("long").as("cos_x6"))
  }
}
