package graft

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. `count()` forces full plan execution without
  * driver-side result materialization.
  *
  * Two measured passes at the bench SF — "cold" (first touch of the bench
  * data; OS page cache and shuffle reuse empty) and "warm" (steady state) —
  * are reported as explicit `cold_total`/`warm_total` fields, with the
  * headline `value` = the cold pass, the honest number for a first run on
  * a cluster. Scalar fields come FIRST and per-query timings are rounded
  * to ms so a consumer that truncates long lines still parses the totals.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // dev convenience: SPARK_GRAFT_BENCH_ONLY=q102_copurchase,q124_pagerank
    // restricts the run for A/B iteration; the driver never sets it
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    def selected(n: String) = only.forall(_.contains(n))
    val spark = GraftSession.builder("graft-bench", Some(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      // ContextCleaner frees broadcasts/shuffle files via WEAK references,
      // i.e. only after a GC — which a 100+ GiB heap may not run for the
      // whole suite. Without draining it, state from 200+ queries
      // accumulates and the heavy tail measures 3-6x slower in-suite than
      // isolated (q183: 37s vs 8s, same data). The drain lives in
      // release() BETWEEN queries; the periodic timer is pushed out so a
      // multi-second full GC never lands inside a timed section (measured
      // at 10x: a 45s timer inflated random mid-suite queries 3-10x).
      .config("spark.cleaner.periodicGC.interval", "1h")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm every query's codegen/JIT path on the smallest SF first: without
    // this the "cold" pass measures classloading + whole-stage compilation
    // (5-10x), i.e. the JVM, not the plan. sf0.001 is ~1% of bench data, so
    // the warmup adds negligible I/O and leaves the bench data untouched.
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.filter(kv => selected(kv._1))
      .sortBy(_._1).foreach { case (_, fn) =>
        try { fn(spark, warmDir).count() } catch { case _: Throwable => () }
      }
    // Iterative queries localCheckpoint per round; those blocks stay in the
    // block store until the ContextCleaner's weak refs get GC'd, which a
    // large-heap JVM may never do mid-run. Across 167 queries × 2 passes the
    // leftovers squeeze execution memory and inflate the heavy tail 2-3×
    // (q139 measured 21 s inside the full suite vs 6.6 s isolated at 10×).
    // Dropping all persisted RDDs between queries — outside the timed
    // section — restores per-query isolation; nothing is shared across them.
    var sinceGc = 0
    def release(): Unit = {
      // blocking: async unpersist was measured still in flight when the
      // next query's timed section opened — the free must complete HERE,
      // in the untimed gap
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      // getPersistentRDDs holds WEAK values: an RDD object GC'd between
      // queries drops out of the map while its (checkpoint) blocks stay in
      // the block store until the ContextCleaner's post-GC drain — the
      // round-7 warm-pass>cold-pass artifact. Purge the blocks the block
      // manager ACTUALLY holds, by rdd id, deterministically.
      org.apache.spark.graft.BlockPurge.purgeRddBlocks(spark.sparkContext)
      // drain the weak-ref cleaner queue at a bounded cadence, always
      // OUTSIDE the timed section (a timer-based GC was measured landing
      // inside queries at 10x data — see the builder comment)
      sinceGc += 1
      if (sinceGc >= 10) { sinceGc = 0; System.gc() }
    }
    // --- self-calibration canary -----------------------------------------
    // A fixed CPU-bound probe (max of xxhash64 over a 1.6e9-row range,
    // one partition per core — no I/O, no data dependence) timed at suite
    // start, between the cold and warm passes, and after the isolated
    // re-times. Its clean-box value is pinned below (measured on this
    // container class, idle, median of repeated runs; override via
    // SPARK_GRAFT_CANARY_CLEAN_S when the fleet hardware changes).
    // noise_factor = median(canary_s)/clean makes a contended/polluted run
    // SELF-EVIDENT in the emitted JSON — the round-6 driver artifact was
    // silently ~3.4x inflated by environment and had to be adjudicated by
    // hand. Factor > 1.5 additionally prints a loud stderr warning.
    val canaryCleanS =
      sys.env.getOrElse("SPARK_GRAFT_CANARY_CLEAN_S", "0.45").toDouble
    def canaryProbe(rows: Long): Unit =
      spark.range(0L, rows, 1L, cpus.toInt)
        .agg(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.col("id")))).head()
    def canary(): Double = {
      System.gc() // never measure someone else's collection
      val t0 = System.nanoTime()
      canaryProbe(1600000000L)
      (System.nanoTime() - t0) / 1e9
    }
    // --- checkpoint-heavy canary ------------------------------------------
    // The CPU canary is provably BLIND to memory/disk drift (no I/O, no
    // execution-memory demand — the round-7 SCALE.md blind spot): leftover
    // blocks squeezing execution memory, or a dirty page cache, never move
    // it. This probe exercises exactly that surface: localCheckpoint ~0.8 GB
    // into the block store, then a wide hash aggregate over it (8M groups —
    // real execution-memory demand that spills when squeezed), released
    // through the same purge path as the suite. Sized to ~0.4 GB storage
    // + ~1.5 GB aggregate exec memory: comfortable on the default 8 GiB
    // bench heap, squeezed visibly by leftover-block pollution. Emitted
    // as ckpt_canary_s + ckpt_noise_factor beside the CPU pair; clean pin
    // env-overridable via SPARK_GRAFT_CKPT_CANARY_CLEAN_S.
    val ckptCleanS =
      sys.env.getOrElse("SPARK_GRAFT_CKPT_CANARY_CLEAN_S", "6.0").toDouble
    def ckptProbe(rows: Long): Unit = {
      val df = spark.range(0L, rows, 1L, cpus.toInt)
        .select(org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.col("id")).as("k"))
        .localCheckpoint()
      df.groupBy((org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("k"),
          org.apache.spark.sql.functions.lit(1048576L))).as("g"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .agg(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.col("n"))).head()
      org.apache.spark.graft.BlockPurge.purgeRddBlocks(spark.sparkContext)
    }
    def ckptCanary(): Double = {
      System.gc()
      val t0 = System.nanoTime()
      ckptProbe(50000000L)
      (System.nanoTime() - t0) / 1e9
    }
    canaryProbe(10000000L) // untimed: JIT/codegen warm the probe itself
    // untimed FULL-SIZE warm: the first checkpoint probe pays one-off
    // page/buffer allocation (measured 10.4 vs 6.0 s steady) — the timed
    // probes must compare steady state to steady state
    ckptProbe(50000000L)
    val canaries = scala.collection.mutable.ArrayBuffer[Double]()
    val ckptCanaries = scala.collection.mutable.ArrayBuffer[Double]()
    def noiseFactor: Double = {
      val s = canaries.sorted
      math.rint(s(s.size / 2) / canaryCleanS * 1000) / 1000
    }
    def ckptNoiseFactor: Double = {
      val s = ckptCanaries.sorted
      math.rint(s(s.size / 2) / ckptCleanS * 1000) / 1000
    }
    canaries += canary()
    ckptCanaries += ckptCanary()
    // a failed query is reported as -1, never as a (fast-looking) timing
    def pass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.filter(kv => selected(kv._1))
        .sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case e: Throwable =>
                   System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
        val t = (System.nanoTime() - t0) / 1e9
        release()
        name -> (if (ok) t else -1.0)
      }
    var cold = pass()
    canaries += canary()
    ckptCanaries += ckptCanary()
    // --- self-certification (round-8: the driver artifact's cold total was
    // 50% drift and only the stderr warning said so). If either canary
    // fires after the cold pass, the cold numbers are already suspect —
    // re-run the cold pass ONCE (bounded; an idle box converges, a
    // genuinely contended one fails the final `valid` flag instead of
    // shipping a silently incomparable total). The first attempt's total
    // is kept in the JSON as the retry trail.
    var coldRetries = 0
    var coldAttempt1 = -1.0
    if (noiseFactor > 1.5 || ckptNoiseFactor > 1.5) {
      System.err.println(
        s"[bench] canaries fired after the cold pass (cpu $noiseFactor, " +
          s"ckpt $ckptNoiseFactor) — re-running the cold pass once; " +
          "attempt-1 total kept as cold_total_attempt1")
      coldAttempt1 = math.rint(cold.map(_._2).filter(_ >= 0).sum * 1000) / 1000
      coldRetries = 1
      cold = pass()
      canaries += canary()
      ckptCanaries += ckptCanary()
    }
    val warm = pass()
    def r3(v: Double) = math.rint(v * 1000) / 1000
    def total(xs: Seq[(String, Double)]) = r3(xs.map(_._2).filter(_ >= 0).sum)
    val qs = warm.zip(cold).map { case ((k, w), (_, c)) =>
      val v = if (w < 0 || c < 0) -1.0 else r3(w)
      "\"" + k + "\":" + v
    }.mkString("{", ",", "}")
    // `valid` self-certifies the artifact: true iff no canary (cpu or
    // ckpt, medians over the whole run) sits above 1.5× its clean pin.
    // A consumer comparing totals across rounds should gate on it.
    def validFlag: Boolean = noiseFactor <= 1.5 && ckptNoiseFactor <= 1.5
    def retryTrail: String =
      s""""cold_retries":$coldRetries""" +
        (if (coldRetries > 0) s""","cold_total_attempt1":$coldAttempt1""" else "")
    println(s"""{"metric":"total","value":${total(cold)},"unit":"sec",""" +
      s""""cold_total":${total(cold)},"warm_total":${total(warm)},""" +
      s""""n_queries":${warm.size},"sf":"$sfDir",""" +
      s""""valid":$validFlag,$retryTrail,""" +
      s""""canary_s":${canaries.map(r3).mkString("[", ",", "]")},""" +
      s""""noise_factor":$noiseFactor,""" +
      s""""ckpt_canary_s":${ckptCanaries.map(r3).mkString("[", ",", "]")},""" +
      s""""ckpt_noise_factor":$ckptNoiseFactor,"queries":$qs}""")
    // Isolated re-measure of the tail: in-suite numbers run up to 2x above
    // isolated on IDENTICAL plans (residual page-cache / code-cache /
    // block-manager state across 200+ queries in one JVM — the round-4
    // verdict's watch item). Re-timing the slowest warm queries after a
    // full unpersist + cache-clear + forced GC separates plan regressions
    // from harness noise in round-over-round comparison.
    val slowTail = warm.filter(_._2 >= 0).sortBy(-_._2).take(10)
    val iso = slowTail.map { case (name, _) =>
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      org.apache.spark.graft.BlockPurge.purgeRddBlocks(spark.sparkContext)
      System.gc()
      val t0 = System.nanoTime()
      val ok = try { SparkEntry.queries(name)(spark, sfDir).count(); true }
               catch { case _: Throwable => false }
      name -> (if (ok) r3((System.nanoTime() - t0) / 1e9) else -1.0)
    }
    val isoJson = iso.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    canaries += canary()
    ckptCanaries += ckptCanary()
    if (noiseFactor > 1.5)
      System.err.println(
        s"[bench] WARNING: canary noise_factor $noiseFactor > 1.5 " +
          s"(canaries ${canaries.map(r3).mkString(", ")} s vs clean " +
          s"$canaryCleanS s) — this box is contended or throttled; the " +
          "totals on this line are NOT comparable across rounds. Re-run " +
          "on an idle box before drawing per-query conclusions.")
    if (ckptNoiseFactor > 1.5)
      System.err.println(
        s"[bench] WARNING: ckpt canary noise_factor $ckptNoiseFactor > 1.5 " +
          s"(probes ${ckptCanaries.map(r3).mkString(", ")} s vs clean " +
          s"$ckptCleanS s) — memory/disk drift (block-store pollution, " +
          "dirty page cache, storage contention) that the CPU canary " +
          "cannot see; totals are NOT comparable across rounds.")
    // The per-query line is ~8 KB at 230+ queries and the driver keeps only
    // the LAST 2000 chars of output — repeat the scalars on a short FINAL
    // line (plus the compact isolated tail, ~400 chars) so the totals
    // always land inside the tail window. Round-11 addition (the round-10
    // verdict's artifact fix): after the scalars, as many of the HEAVIEST
    // per-query warm timings as fit a fixed budget that keeps the whole
    // line inside the window (rounds 1-3 proved a full-map line there
    // breaks the parse) — this is what makes the driver's per-query
    // round-over-round diff and the low/high-core scaling ratios
    // computable for every query that carries meaningful time; the
    // sub-budget tail sits at the ~0.3 s per-query floor and is covered
    // by the full map on the first line above.
    val scalarPart = s"""{"metric":"total","value":${total(cold)},"unit":"sec",""" +
      s""""cold_total":${total(cold)},"warm_total":${total(warm)},""" +
      s""""n_queries":${warm.size},"sf":"$sfDir",""" +
      s""""valid":$validFlag,$retryTrail,""" +
      s""""canary_s":${canaries.map(r3).mkString("[", ",", "]")},""" +
      s""""noise_factor":$noiseFactor,""" +
      s""""ckpt_canary_s":${ckptCanaries.map(r3).mkString("[", ",", "]")},""" +
      s""""ckpt_noise_factor":$ckptNoiseFactor,""" +
      s""""slowest_isolated":$isoJson"""
    val lineBudget = 1800 // < the 2000-char window, with slack for a
                          // trailing harness line after the JSON
    val topEntries = scala.collection.mutable.ArrayBuffer[String]()
    var fits = true
    for ((k, v) <- warm.filter(_._2 >= 0).sortBy(-_._2) if fits) {
      val e = "\"" + k + "\":" + r3(v)
      val projected = scalarPart.length + 40 +
        topEntries.map(_.length + 1).sum + e.length
      if (projected <= lineBudget) topEntries += e else fits = false
    }
    println(scalarPart + s""","queries_emitted":${topEntries.size},""" +
      s""""queries":${topEntries.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
