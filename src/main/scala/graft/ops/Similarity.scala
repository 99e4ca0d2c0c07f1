package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (north-star EXT).
  *
  * Numeric contract: embeddings are quantized to integer milli-units before
  * any arithmetic, so dot products and norms are exact integers — results
  * are bit-identical regardless of summation order, engine, or parallelism
  * (floating-point reductions are order-dependent; integer ones aren't).
  * The final cosine is one double division + sqrt — deterministic.
  *
  * Scale paths:
  *  - [[bruteForceTopK]]: queries broadcast against the full corpus; right
  *    for |queries| ≪ |corpus| (the common "probe" shape). O(|Q|·N) but
  *    embarrassingly parallel, no shuffle of the corpus.
  *  - [[lshTopK]]: sign-random-projection buckets; only same-bucket pairs
  *    score. Probes multiple tables; recall tunable by (tables, bits).
  */
object Similarity {

  /** float[] → integer milli-units (exact in double before floor). */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 1000 + 0.5).cast("long"))

  def dotInt(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  def normInt(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0L), (acc, x) => acc + x)

  /** Exact cosine between quantized vectors, as double. */
  def cosine(a: Column, b: Column): Column =
    dotInt(a, b).cast("double") / sqrt((normInt(a) * normInt(b)).cast("double"))

  /** Brute-force top-k cosine neighbors for each query vector.
    * @param queries subset of rows (vec_id, embedding) — broadcast side
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), quantize(col(vecCol)).as("qv"))
    val e = corpus.select(col(idCol).as("eid"), quantize(col(vecCol)).as("ev"))
    val scored = e.join(broadcast(q), col("qid") =!= col("eid"))
      .withColumn("cos", cosine(col("qv"), col("ev")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("eid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("eid"), col("cos"), col("rn"))
  }

  /** Sign-random-projection bucket for LSH: `bits` pseudo-hyperplanes, the
    * j-th plane's i-th component derived from a seeded hash — deterministic,
    * data-independent, no stored model. Returns a `bits`-wide integer
    * bucket id. */
  def srpBucket(vecQ: Column, bits: Int, table: Int): Column = {
    // component weight ∈ {-1,0,1} from hash(table, plane, index): cheap
    // ternary projections are a standard SRP variant and stay integer-exact.
    def proj(plane: Int): Column = {
      val weighted = zip_with(
        vecQ,
        sequence(lit(0), size(vecQ) - 1),
        (x, i) => {
          val h = xxhash64(lit(table), lit(plane), i)
          when(pmod(h, lit(3)) === 0, lit(0L))
            .when(pmod(h, lit(3)) === 1, x)
            .otherwise(-x)
        })
      aggregate(weighted, lit(0L), (acc, x) => acc + x)
    }
    (0 until bits).foldLeft(lit(0L)) { (acc, p) =>
      acc + when(proj(p) > 0, lit(1L << p)).otherwise(0L)
    }
  }

  /** LSH-bucketed approximate top-k: per table, queries meet only
    * same-bucket corpus rows; union across tables, dedupe, rank. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int = 8, tables: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = corpus.select(col(idCol).as("eid"), quantize(col(vecCol)).as("ev"))
    val q = queries.select(col(idCol).as("qid"), quantize(col(vecCol)).as("qv"))
    val candidates = (0 until tables).map { t =>
      val eb = e.withColumn("bucket", srpBucket(col("ev"), bits, t))
      val qb = q.withColumn("bucket", srpBucket(col("qv"), bits, t))
      eb.join(broadcast(qb), Seq("bucket")).filter(col("qid") =!= col("eid"))
        .select(col("qid"), col("eid"), col("qv"), col("ev"))
    }.reduce(_.unionByName(_)).dropDuplicates("qid", "eid")
    val scored = candidates.withColumn("cos", cosine(col("qv"), col("ev")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("eid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("eid"), col("cos"), col("rn"))
  }

  /** Embedding near-duplicate pairs: all (a<b) pairs with cosine ≥ τ.
    * Brute-force O(N²/2) — correct baseline at test scale; the LSH variant
    * is the scale path. */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), quantize(col(vecCol)).as("va"))
    val b = corpus.select(col(idCol).as("id_b"), quantize(col(vecCol)).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
