package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Term-based retrieval over the corpus — BM25 scoring as one declarative
  * plan (north-star EXT: the retrieval side of a training-data pipeline,
  * e.g. quality-by-query probes or dedup-against-eval lookups).
  *
  * Scale shape: ONE pass over the token stream — document length and a
  * codegen'd conditional count per query term in the same partial+final
  * hash aggregate, so the exchange carries one (id, dl, |terms| longs)
  * row per document (term sets are small by nature); document
  * frequencies are a ≤|terms|-row broadcast; the final top-k is
  * `TakeOrderedAndProject` (per-partition heaps, no global sort).
  *
  * Cross-engine exactness (same discipline as the oracled quality/packing
  * queries): IDF is the only transcendental — it is quantized to 1e-6 by
  * `floor` on both engines (a 1-ulp `ln` divergence only matters if the
  * scaled value lands within an ulp of an integer, ~2⁻⁴² per distinct df);
  * every per-(doc, term) contribution is then `floor(idf_q * s * 1e9)` — a
  * LONG — and the per-doc score is a SUM OF LONGS: exact, order-free,
  * identical under any partitioning. The reported double is one final
  * division.
  */
object Retrieval {

  /** Top-k documents by BM25 over `terms`.
    *
    * @return (id, score) rows, `score_x9`-descending then id; score is the
    *         quantized BM25 sum (see class doc)
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one term")
    // index-keyed column names: terms are corpus tokens and may contain
    // dots/backticks (col("__tf_u.s.") would parse as field access), and
    // a duplicated term must not create ambiguous aliases
    val ts = terms.distinct
    val toks = docs.select(col(idCol).as("id"),
      explode(split(Dedup.normalized(coalesce(col(textCol), lit(""))), " ")).as("t"))
    // ONE pass over the token stream: document length and one conditional
    // count per query term in the same partial+final hash aggregate (query
    // term sets are small by nature — a column per term beats a second
    // explode + exchange); then unpivot the hit columns to (id, t, tf).
    val perDoc = toks.groupBy(col("id")).agg(
      count(lit(1)).as("dl"),
      ts.zipWithIndex.map { case (t, i) =>
        sum(when(col("t") === t, 1L).otherwise(0L)).as(s"__tf_$i") }: _*)
      .localCheckpoint() // slim (id, dl, |terms| longs); feeds 3 consumers
    // two scalars (control plane) — broadcast as a 1-row frame, no collect
    val stats = perDoc.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
    val dl = perDoc.select(col("id"), col("dl"))
    val tf = ts.zipWithIndex.map { case (t, i) =>
        perDoc.select(col("id"), lit(t).as("t"), col(s"__tf_$i").as("tf")) }
      .reduce(_.unionByName(_))
      .filter(col("tf") > 0)
    val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(dfreq), "t")
      .join(dl, "id")
      .crossJoin(broadcast(stats))
      .withColumn("idf_q",
        floor(log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) * 1e6) / 1e6)
      .withColumn("s",
        col("tf") * lit(k1 + 1) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .withColumn("c9", floor(col("idf_q") * col("s") * 1e9))
    scored.groupBy(col("id"))
      .agg(sum(col("c9")).as("score_x9"))
      .orderBy(col("score_x9").desc, col("id"))
      .limit(k)
      .select(col("id"), (col("score_x9").cast("double") / 1e9).as("score"))
  }

  /** Materialized inverted index: one row per indexable term with its
    * document frequency and the full sorted posting list — the artifact
    * that turns [[bm25TopK]]'s ad-hoc corpus scan into an O(|postings|)
    * lookup (build once per corpus snapshot, serve many queries).
    *
    * Scale posture: postings are collected ONLY for terms inside the
    * [minDf, maxDf] band, decided by a map-side-combinable df count
    * BEFORE any list is built. The maxDf cut is what makes the reducer
    * safe: a stop-word's posting row would otherwise hold a corpus-sized
    * list in one task — and carries no retrieval signal anyway (its IDF
    * ≈ 0; BM25 serving treats missing terms as unindexed). Dropped terms
    * are still visible: rows above the band report their df with a NULL
    * posting list, so index consumers can distinguish "rare/absent" from
    * "deliberately unindexed" — the same report-what-you-dropped contract
    * as the LSH bucket-cap audits. Only (term-hash-sized string, id)
    * pairs shuffle; doc text never does.
    *
    * @return (term, df, postings) — postings a comma-joined sorted id
    *         string (cross-engine-stable rendering), NULL above maxDf
    */
  /** Exact PHRASE search — all documents containing `phrase`'s tokens
    * CONSECUTIVELY, with match counts and the first match position: the
    * positional-index query the flat [[invertedIndex]] can't answer
    * (posting intersection finds docs with all terms ANYWHERE; phrases
    * need adjacency).
    *
    * One-shuffle shape, no self-join chain: each token row matching
    * phrase term i at position p becomes an (id, p − i, i) vote — an
    * anchor-position candidate — and a phrase STARTS at anchor a iff all
    * |phrase| distinct offsets voted for a, i.e. one grouped
    * count-distinct per (id, anchor). A k-term phrase is k − 1
    * equi-joins in the textbook positional-index form; here it is one
    * map-side-filterable explode (only phrase tokens survive — the
    * filter sits before the exchange, so the shuffle carries matches,
    * not the corpus) plus one aggregate, for any k. Repeated phrase
    * terms are exactly why the vote is (i, p) — a single token row
    * legitimately votes for several offsets of a self-repeating phrase
    * ("buffalo buffalo"), and DISTINCT i per anchor is the correct
    * accept test.
    *
    * @return (id, n_matches, first_pos) for docs with ≥1 phrase match;
    *         positions are 0-based token offsets
    */
  def phraseMatch(docs: DataFrame, phrase: Seq[String],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(phrase.nonEmpty, "phraseMatch needs a non-empty phrase")
    val k = phrase.length
    val toks = docs.select(col(idCol).as("id"),
      posexplode(split(Dedup.normalized(coalesce(col(textCol), lit(""))),
        " ")).as(Seq("pos", "t")))
    // (offset i → term) votes; a token equal to several phrase terms
    // votes once per matching offset
    val offsets = docs.sparkSession.createDataFrame(
      phrase.zipWithIndex.map { case (t, i) => (i, t) }).toDF("i", "pt")
    val votes = toks.join(broadcast(offsets), col("t") === col("pt"))
      .select(col("id"), (col("pos") - col("i")).as("anchor"), col("i"))
      .filter(col("anchor") >= 0)
    votes.groupBy(col("id"), col("anchor"))
      .agg(countDistinct(col("i")).as("nf"))
      .filter(col("nf") === k.toLong)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_matches"), min(col("anchor")).as("first_pos"))
  }

  def invertedIndex(docs: DataFrame, minDf: Long = 1L, maxDf: Long = Long.MaxValue,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // distinct terms per doc in-row (array_distinct) — the (id, term)
    // stream enters the shuffle already deduped, so df = count(*)
    val pairs = docs.select(col(idCol).as("id"),
      explode(array_distinct(split(
        Dedup.normalized(coalesce(col(textCol), lit(""))), " "))).as("term"))
    val dfs = pairs.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      // slim (term, df) — consumed by the indexable-band semi-join AND the
      // final left join; materialize so the corpus tokenization+count pass
      // runs once (pairs itself is corpus-sized and must NOT be pinned)
      .localCheckpoint()
    val indexable = dfs.filter(col("df") <= maxDf)
    val postings = pairs
      .join(indexable.select(col("term")), Seq("term"), "left_semi")
      .groupBy(col("term"))
      .agg(array_join(transform(array_sort(collect_list(col("id"))),
        x => x.cast("string")), ",").as("postings"))
    dfs.join(postings, Seq("term"), "left")
      .select(col("term"), col("df"), col("postings"))
  }
}
