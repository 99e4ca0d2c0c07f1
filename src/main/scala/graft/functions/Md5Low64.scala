package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MD5-low64 of a string, as a native codegen expression: digest bytes
  * 8..15 read little-endian — bit-identical to DuckDB `md5_number_lower`,
  * so orderings/selections keyed on it are reproducible by an external
  * engine (the same parity contract as [[graft.ops.Dedup.md5Low64]], which
  * is the mapPartitions-kernel form of this Column).
  *
  * Use when a UNIFORM scrambling hash with cross-engine parity is needed —
  * epoch shuffles, deterministic sampling keys, seeding (q81's k-means
  * init). [[RollingFingerprint]] is cheaper but order-preserving on
  * same-length numeric strings (it is a polynomial in the code points), so
  * it must not be used as a permutation key.
  */
case class Md5Low64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_low64 requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_low64"

  override protected def nullSafeEval(input: Any): Any =
    Md5Low64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Low64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Low64 =
    copy(child = newChild)
}

object Md5Low64 {
  private val md5Tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Called from both interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    val md = md5Tl.get(); md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 15
    while (i >= 8) { v = (v << 8) | (d(i) & 0xffL); i -= 1 }
    v
  }

  def apply(c: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(Md5Low64(Bridge.expression(c)))
  }
}
