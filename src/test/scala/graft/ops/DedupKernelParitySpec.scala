package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The zero-shuffle JVM kernels must produce byte-identical signatures to
  * the expression formulations they replace — same xxhash64, same
  * normalization, same shingle multiset. Any drift here silently changes
  * which near-duplicate pairs the LSH pipelines emit. */
class DedupKernelParitySpec extends SparkSpec {
  import spark.implicits._

  // edge shapes: multi-space, leading/trailing space + tab, unicode, short
  // docs (< n tokens), empty string, single token, long repetitive doc
  private lazy val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog"),
    (2L, "  the   quick\tbrown fox  "),
    (3L, "Ünïcode ÉTÉ straße 北京 toLower"),
    (4L, "two words"),
    (5L, ""),
    (6L, "single"),
    (7L, ("spam ham " * 50).trim),
    (8L, "punctuation, counts! as? tokens."),
    (9L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("xxStr matches Spark's xxhash64 expression on strings") {
    val got = docs.filter($"text".isNotNull)
      .select($"doc_id", xxhash64($"text").as("h"))
      .as[(Long, Long)].collect().toMap
    val want = docs.filter($"text".isNotNull)
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> Dedup.xxStr(t) }.toMap
    assert(got == want)
  }

  test("normalizedJvm matches the normalized expression") {
    val got = docs.filter($"text".isNotNull)
      .select($"doc_id", Dedup.normalized($"text").as("n"))
      .as[(Long, String)].collect().toMap
    val want = docs.filter($"text".isNotNull)
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> Dedup.normalizedJvm(t) }.toMap
    assert(got == want)
  }

  test("minhashBandRows matches the expression signatures' band hashes") {
    val k = 64; val bands = 16; val r = k / bands
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id", k)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until r).map(i => col(s"mh_${b * r + i}")): _*).as("bh"))
    }
    val want = sigs.select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bh"))
      .as[(Long, Int, Long)].collect().toSet
    val got = Dedup.minhashBandRows(docs, "text", "doc_id", k, bands)
      .as[(Long, Int, Long)].collect().toSet
    assert(got == want)
  }

  test("hashedShingleSets matches window-assembled collect_set shingles") {
    val want = Dedup.shingleRows(docs, "text", "doc_id")
      .groupBy(col("id")).agg(collect_set(xxhash64(col("sh"))).as("sh"))
      .as[(Long, Seq[Long])].collect()
      .map { case (id, sh) => id -> sh.toSet }.toMap
    val got = Dedup.hashedShingleSets(docs, "text", "doc_id")
      .as[(Long, Seq[Long])].collect()
      .map { case (id, sh) => id -> sh.toSet }.toMap
    assert(got == want)
  }

  test("simhashSignaturesKernel matches the expression simhash bits") {
    val want = Dedup.simhashSignatures(docs, "text", "doc_id")
      .as[(Long, Long)].collect().toSet
    val got = Dedup.simhashSignaturesKernel(docs, "text", "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(got == want)
  }

  test("kernel paths stay parity on the real corpus (sf0.001)") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val want = Dedup.simhashSignatures(corpus).as[(Long, Long)].collect().toSet
    val got = Dedup.simhashSignaturesKernel(corpus).as[(Long, Long)].collect().toSet
    assert(got == want)
    val wantSets = Dedup.shingleRows(corpus)
      .groupBy(col("id")).agg(collect_set(xxhash64(col("sh"))).as("sh"))
      .as[(Long, Seq[Long])].collect().map { case (i, s) => i -> s.toSet }.toMap
    val gotSets = Dedup.hashedShingleSets(corpus)
      .as[(Long, Seq[Long])].collect().map { case (i, s) => i -> s.toSet }.toMap
    assert(gotSets == wantSets)
  }
}
