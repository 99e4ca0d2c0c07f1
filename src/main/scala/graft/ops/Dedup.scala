package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (north-star EXT,
  * SURVEY.md J8): exact, MinHash+LSH, SimHash, exact n-gram Jaccard.
  *
  * Scale design notes (100 TB posture):
  *  - exact dedup shuffles once on a 64-bit content hash, never on the text;
  *  - MinHash signatures are computed per-row with higher-order functions
  *    (zero shuffle), only band buckets shuffle — the classic
  *    shingle→minhash→band pipeline with candidate verification;
  *  - pathological buckets (boilerplate shingles) are capped: a bucket with
  *    more than `maxBucketSize` docs is dropped from candidate generation —
  *    at web scale such buckets are near-identical spam whose pairs explode
  *    quadratically; cap + report, don't melt the shuffle.
  */
object Dedup {

  /** Whitespace-normalized lowercase text — the canonical form all
    * text-dedup operators hash. */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  // ------------------------------------------------------------- exact
  /** Exact dedup: keep the minimum `idCol` per normalized-content group.
    * Equivalent plan to groupBy(xxhash64) but keyed on the hash so 100 TB of
    * text never shuffles — only (hash, id) pairs do. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val h = xxhash64(normalized(col(textCol)))
    docs.select(h.as("__h"), col(idCol))
      .groupBy(col("__h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
      .drop("__h")
  }

  // ------------------------------------------------------------- shingles
  /** Word n-gram shingle array (distinct). Documents shorter than n words
    * shingle to their whole normalized text. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(normalized(text), " ")
    val grams = transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
    array_distinct(grams)
  }

  /** Exact Jaccard similarity of two shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, 0.0).otherwise(inter / union)
  }

  // ------------------------------------------------------------- minhash
  /** k MinHash values per doc, computed row-local: min over shingles of a
    * seeded 64-bit hash. No shuffle, no UDF — `transform` + `array_min`
    * stay in codegen. */
  def minhashSignature(shingleArr: Column, k: Int = 64): Seq[Column] =
    (0 until k).map { seed =>
      array_min(transform(shingleArr, sh => xxhash64(lit(seed), sh))).as(s"mh_$seed")
    }

  /** Candidate duplicate pairs via LSH banding + exact-Jaccard verification.
    *
    * @param bands     b bands of r = k/bands rows; P(candidate) ≈
    *                  1-(1-s^r)^b — defaults catch s ≳ 0.5
    * @param threshold exact-Jaccard cutoff applied to candidates
    * @return (id_a, id_b, jaccard) with id_a < id_b, distinct
    */
  def minhashDuplicatePairs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", k: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, maxBucketSize: Int = 1000): DataFrame = {
    val r = k / bands
    require(bands * r == k, "bands must divide k")
    val withSig = docs
      .select(col(idCol).as("id"), shingles(col(textCol)).as("sh"))
      .select(col("id") +: col("sh") +: minhashSignature(col("sh"), k): _*)
    // one row per (doc, band): band hash = hash of that band's r minhashes
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until r).map(i => col(s"mh_${b * r + i}")): _*).as("bh"))
    }
    val exploded = withSig
      .select(col("id"), col("sh"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("sh"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    // cap pathological buckets before the quadratic pair join
    val bucketed = exploded
      .withColumn("__bn", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")))
      .filter(col("__bn") <= maxBucketSize)
    val a = bucketed.select(col("band"), col("bh"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = bucketed.select(col("band"), col("bh"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ------------------------------------------------------------- simhash
  /** 64-bit SimHash over word-token hashes: bit i of the output is the sign
    * of Σ_tokens (±1 by bit i of xxhash64(token)). Row-local, codegen. */
  def simhash(text: Column): Column = {
    val hashes = transform(split(normalized(text), " "), t => xxhash64(t))
    val n = size(hashes)
    (0 until 64).foldLeft(lit(0L)) { (acc, i) =>
      val ones = size(filter(hashes, h => shiftright(h, i).bitwiseAND(1) === 1))
      acc + when(ones * 2 > n, lit(1L << i)).otherwise(0L)
    }
  }

  /** Near-dup candidate pairs by SimHash: equal 16-bit band → hamming
    * verification ≤ maxHamming (any pair within distance d shares ≥1 of 4
    * bands when d ≤ 3). */
  def simhashDuplicatePairs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", maxHamming: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sim"))
    val bandCols = (0 until 4).map(b =>
      struct(lit(b).as("band"), shiftright(col("sim"), b * 16).bitwiseAND(0xFFFFL).as("bh")))
    val exploded = sh.select(col("id"), col("sim"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("sim"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val a = exploded.select(col("band"), col("bh"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = exploded.select(col("band"), col("bh"), col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
