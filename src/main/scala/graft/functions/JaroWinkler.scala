package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native codegen expression — the standard
  * record-linkage scorer for short identifier strings (names, SKUs,
  * vocab), where Levenshtein over-penalizes transpositions.
  *
  * Standard definition, matching DuckDB `jaro_winkler_similarity`
  * (verified pairwise over the test vocabulary at 1e-6 quantization):
  * Jaro = (m/|a| + m/|b| + (m−t)/m)/3 with the match window
  * ⌊max(|a|,|b|)/2⌋−1 and t = half the out-of-order matches; the Winkler
  * prefix boost j + ℓ·0.1·(1−j) applies only when j > 0.7, ℓ = shared
  * prefix capped at 4. Comparison runs over UTF-16 code units (both
  * engines agree on ASCII; quantize scores to floor(·1e6) before
  * hash-matching across engines — the last-ulp is not contractual).
  *
  * The kernel is a static JVM method called from generated code, so the
  * expression stays inside whole-stage codegen (no CodegenFallback); the
  * O(|a|·|b|) window scan is the expected cost for ≤~64-char keys — gate
  * candidate pairs with blocking first ([[graft.ops.RecordLinkage]]).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires (STRING, STRING), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinkler.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Called from both interpreted eval and generated code. */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    if (a == b) return 1.0
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(la, lb) / 2 - 1
    val fa = new Array[Boolean](la)
    val fb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb, i + window + 1)
      var j = lo
      var found = false
      while (!found && j < hi) {
        if (!fb(j) && a.charAt(i) == b.charAt(j)) {
          fa(i) = true; fb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (fa(i)) {
        while (!fb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxP = math.min(4, math.min(la, lb))
    while (l < maxP && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))
  }
}
