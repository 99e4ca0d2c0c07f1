package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (north-star EXT):
  * language ID, quality scoring, token counting, document fingerprinting.
  * All pure column expressions — codegen'd, no UDFs, embarrassingly
  * parallel at any scale.
  */
object TextAnalysis {

  private def toks(text: Column): Column =
    split(Dedup.normalized(text), " ")

  /** Whitespace token count; empty/blank text → 0. */
  def tokenCount(text: Column): Column =
    when(trim(text) === "" || text.isNull, 0).otherwise(size(toks(text)))

  /** BPE-ish subword count estimate: word-boundary pieces plus an extra
    * piece per 6 chars of long words (common ~4 chars/token heuristic,
    * without a vocab file). */
  def subwordCountEstimate(text: Column): Column = {
    val pieces = transform(toks(text), t => greatest(ceil(length(t) / 6.0), lit(1L)))
    // blank text → 0, consistent with tokenCount (split('') yields [''],
    // which would otherwise count as one piece)
    when(trim(text) === "" || text.isNull, 0L)
      .otherwise(coalesce(aggregate(pieces, lit(0L), (a, x) => a + x), lit(0L)))
  }

  /** Stopword hit count for one language's marker set (duplicates count —
    * frequency matters for language evidence). */
  private def stopwordHits(text: Column, words: Seq[String]): Column =
    size(filter(toks(text), t => t.isin(words.map(lit(_)): _*)))

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "los", "de", "que", "y", "un", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "des"))

  /** n-gram/stopword heuristic language ID with a fixed priority order
    * (en > de > es > fr) on ties; 'und' (undetermined) when no evidence. */
  def langId(text: Column): Column = {
    val en = stopwordHits(text, stopwords("en"))
    val de = stopwordHits(text, stopwords("de"))
    val es = stopwordHits(text, stopwords("es"))
    val fr = stopwordHits(text, stopwords("fr"))
    when(greatest(en, de, es, fr) === 0, "und")
      .when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  /** Quality features + a composite score ∈ [0,1]: length, token stats,
    * punctuation/digit/uppercase ratios, stopword density. Per-row double
    * arithmetic — deterministic. */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val nChars = length(text).cast("double")
    val nToks = tokenCount(text).cast("double")
    val punct = (nChars - length(regexp_replace(text, "[.,!?;:]", ""))).cast("double")
    val digits = (nChars - length(regexp_replace(text, "[0-9]", ""))).cast("double")
    val uppers = (nChars - length(regexp_replace(text, "[A-Z]", ""))).cast("double")
    val stops = stopwordHits(text, stopwords.values.flatten.toSeq).cast("double")
    val safeChars = greatest(nChars, lit(1.0))
    val safeToks = greatest(nToks, lit(1.0))
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nToks,
      "avg_token_len" -> (length(regexp_replace(Dedup.normalized(text), " ", "")).cast("double") / safeToks),
      "punct_ratio" -> (punct / safeChars),
      "digit_ratio" -> (digits / safeChars),
      "upper_ratio" -> (uppers / safeChars),
      "stopword_ratio" -> (stops / safeToks))
  }

  /** Composite quality score: in-range token count, sane word lengths, some
    * stopword mass — multiplied by a noise penalty so digit/punct-heavy
    * garbage scores near 0 even when its length/shape look fine. */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text).toMap
    val lenOk = when(f("n_tokens") >= 10 && f("n_tokens") <= 100000, 1.0).otherwise(0.0)
    val wordOk = when(f("avg_token_len") >= 2 && f("avg_token_len") <= 12, 1.0).otherwise(0.0)
    val stopOk = least(f("stopword_ratio") * 5, lit(1.0))
    val noise = least(f("digit_ratio") * 5 + f("punct_ratio") * 5, lit(1.0))
    (lenOk * 0.3 + wordOk * 0.3 + stopOk * 0.4) * (lit(1.0) - noise)
  }

  /** Deterministic document fingerprint: polynomial rolling hash of the
    * normalized text's code points, mod 2^53 (stays exact in BIGINT on
    * every engine — no overflow wraparound semantics to disagree on).
    * Delegates to the native codegen Expression; code-point iteration
    * (not UTF-16 units) matches DuckDB's per-character `ascii()`, so the
    * oracle parity holds beyond the BMP too. */
  def fingerprint(text: Column): Column =
    graft.functions.RollingFingerprint(Dedup.normalized(text))
}
