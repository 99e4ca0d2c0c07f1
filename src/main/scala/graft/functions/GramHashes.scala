package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression emitting the 64-bit hash of EVERY
  * `gramLen`-code-point window of a string as one packed long array —
  * the per-position kernel behind exact substring dedup
  * ([[graft.ops.Dedup.duplicateSpans]], cf. Lee et al. 2022 "Deduplicating
  * Training Data Makes Language Models Better", and the reference's
  * content-hash discipline at redcap-etl.py:299-356).
  *
  * Why a custom expression (SURVEY.md §7.3 path (b)): the combinator form
  * — `explode(sequence(0, len-L))` + `substring` + `xxhash64` — costs one
  * generated row, one substring ALLOCATION, and an O(L) hash per position,
  * and the span operator needs the position frame twice. This kernel is a
  * single O(n) loop per document inside the whole-stage-codegen span: a
  * polynomial rolling hash (Rabin–Karp; h·B + cp in, (h − cp·B^{L−1})·B
  * out, everything mod 2⁶⁴ via natural long wrap with an odd B, so every
  * step is bijective) finalized per position with murmur3's fmix64 so the
  * emitted values partition/group uniformly. fmix64 is itself bijective,
  * so the collision structure is exactly the rolling hash's: two DISTINCT
  * windows collide only when their code-point difference polynomial
  * vanishes mod 2⁶⁴ — the same ~2⁻⁶⁴-per-pair class as the xxhash64 gram
  * comparisons used across the dedup family (a false positive needs human
  * review anyway; the DuckDB oracle recomputes with exact string grams).
  *
  * Windows are CODE-POINT-grained to stay in lockstep with Spark's
  * `substring`/`length` (and DuckDB's `substr`): position i here is
  * exactly the gram `substring(text, i+1, L)`. Strings shorter than L
  * yield an empty array (no windows), matching `length(text) >= L` gates.
  */
case class GramHashes(child: Expression, gramLen: Int)
    extends UnaryExpression {
  require(gramLen >= 2, "gram_hashes needs gramLen >= 2")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gram_hashes requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    GramHashes.compute(input.asInstanceOf[UTF8String], gramLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramHashes.compute($c, $gramLen)")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object GramHashes {
  // odd ⇒ multiplication is a bijection mod 2^64 (golden-ratio constant);
  // shared with Dedup's rolling token-shingle signature family
  private[graft] final val B: Long = 0x9E3779B97F4A7C15L

  /** murmur3 fmix64 — bijective finalizer, well-distributed output. */
  private[graft] def fmix64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL
    h ^= h >>> 33; h *= 0xC4CEB9FE1A85EC53L
    h ^= h >>> 33
    h
  }

  /** Called from both interpreted eval and generated code. */
  def compute(s: UTF8String, gramLen: Int): ArrayData = {
    val str = s.toString
    val chars = str.length
    // code points, one tight pass (surrogate pairs collapse to one entry)
    var n = 0
    var i = 0
    while (i < chars) { n += 1; i += Character.charCount(str.codePointAt(i)) }
    if (n < gramLen)
      return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val cps = new Array[Int](n)
    i = 0
    var k = 0
    while (i < chars) {
      val cp = str.codePointAt(i)
      cps(k) = cp; k += 1; i += Character.charCount(cp)
    }
    var bl = 1L // B^(gramLen-1), for rolling the leading code point out
    var j = 0
    while (j < gramLen - 1) { bl *= B; j += 1 }
    val out = new Array[Long](n - gramLen + 1)
    var h = 0L
    j = 0
    while (j < gramLen) { h = h * B + cps(j); j += 1 }
    out(0) = fmix64(h)
    var p = 1
    while (p <= n - gramLen) {
      h = (h - cps(p - 1) * bl) * B + cps(p + gramLen - 1)
      out(p) = fmix64(h)
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def apply(c: Column, gramLen: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(GramHashes(Bridge.expression(c), gramLen))
  }
}
