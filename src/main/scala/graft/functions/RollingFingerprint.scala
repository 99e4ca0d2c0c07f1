package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the polynomial rolling-hash document
  * fingerprint (SURVEY.md §7.3 path (b): a custom `Expression` with
  * `doGenCode` when the operator is hot and the expression-combinator
  * form is interpreted).
  *
  * Semantics match [[TextAnalysis.fingerprint]]'s `aggregate(split(...))`
  * fold exactly — acc = (acc * 31 + codepoint) mod 2^53 over the input's
  * code points — but run as one tight JVM loop per row inside the
  * whole-stage-codegen span, instead of per-character interpreted lambda
  * steps (the array fold allocates a per-char array and walks it through
  * `CodegenFallback`).
  */
case class RollingFingerprint(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    RollingFingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingFingerprint.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object RollingFingerprint {
  final val Mod: Long = 9007199254740992L // 2^53 — exact in BIGINT everywhere

  /** Called from both interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  def apply(c: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(RollingFingerprint(Bridge.expression(c)))
  }
}
