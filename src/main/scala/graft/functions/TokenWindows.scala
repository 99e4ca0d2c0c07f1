package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst `Generator` (the UDTF extension point, SURVEY.md §2.11):
  * explodes a document into overlapping token windows — the context-window
  * chunking of `TextAnalysis.chunkTokens` as a single 1→N generator instead
  * of a sequence/posexplode/slice pipeline.
  *
  * `SELECT doc_id, t.* FROM docs LATERAL VIEW token_windows(text, 100, 20) t`
  * after `GraftExtensions` injection (or the same call in the DataFrame
  * API via `expr`). Emits `(chunk_id, start_tok, n_tok, chunk)`; null/blank
  * text generates zero rows (the generator-native form of the chunker's
  * not-null filter).
  *
  * Window/overlap must be foldable int literals — they shape the output
  * and are evaluated once per task, not per row. Tokenization matches
  * chunkTokens exactly: trim + split on runs of whitespace, windows of
  * `window` tokens every `window - overlap` tokens, the last window
  * truncated. A `mapPartitions`-free, codegen-fallback generator: the
  * surrounding plan stays in whole-stage codegen, only GenerateExec's
  * inner loop interprets (same as every built-in non-explode generator).
  */
case class TokenWindows(text: Expression, window: Expression,
    overlap: Expression) extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, window, overlap)

  private lazy val w: Int = window.eval().asInstanceOf[Number].intValue()
  private lazy val o: Int = overlap.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult = {
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"token_windows needs a string document, got ${text.dataType.sql}")
    else if (!window.foldable || !overlap.foldable ||
        !Seq(window, overlap).forall(e =>
          e.dataType == IntegerType || e.dataType == LongType ||
            e.dataType == ShortType || e.dataType == ByteType))
      TypeCheckResult.TypeCheckFailure(
        "token_windows(text, window, overlap): window/overlap must be int literals")
    else if (window.eval().asInstanceOf[Number].intValue() <= 0 ||
        overlap.eval().asInstanceOf[Number].intValue() < 0 ||
        overlap.eval().asInstanceOf[Number].intValue() >=
          window.eval().asInstanceOf[Number].intValue())
      TypeCheckResult.TypeCheckFailure(
        s"need 0 <= overlap < window; got window=$window overlap=$overlap")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_id", IntegerType, nullable = false),
    StructField("start_tok", LongType, nullable = false),
    StructField("n_tok", LongType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) return Nil
    val s = t.asInstanceOf[UTF8String].toString.trim
    if (s.isEmpty) return Nil
    val toks = s.split("\\s+")
    val step = w - o
    val n = toks.length
    val nchunks = if (n <= w) 1 else 1 + (n - w + step - 1) / step
    (0 until nchunks).iterator.map { i =>
      val start = i * step
      val len = math.min(w, n - start)
      InternalRow(i, start.toLong, len.toLong,
        UTF8String.fromString(toks.slice(start, start + len).mkString(" ")))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TokenWindows =
    copy(text = newChildren(0), window = newChildren(1), overlap = newChildren(2))
}
