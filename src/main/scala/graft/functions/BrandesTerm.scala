package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** One dependency term of Brandes' backward pass (Brandes 2001, "A
  * faster algorithm for betweenness centrality"), in the engine's
  * 1e-9-quantized integer form:
  *
  *   term_x9 = ⌊ σ_v · (10⁹ + δ_w_x9) / σ_w ⌋
  *
  * i.e. σv/σw · (1 + δw) with δ carried in 1e9 units, so the whole
  * accumulation is integer arithmetic — order-free sums, bit-identical
  * across engines/partitionings, and replayable in a SQL oracle as
  * `(sv * (1000000000 + dw)) // sw` over 128-bit integers.
  *
  * Long-typed (round-11): σ/δ ride BIGINT accumulators — primitive
  * UnsafeRow hash-aggregate buffers and half the shuffle bytes of the
  * previous DECIMAL(38,0) carriers. Exactness is unchanged inside the
  * accumulator range: the σv·(10⁹+δw) product is evaluated in 128 bits
  * (multiplyHigh fast path, BigInteger only when the product tops 2⁶³),
  * and the quotient fails LOUDLY — ArithmeticException — if it exceeds
  * BIGINT or σ_w ≤ 0, never a silent null/wrap (the loud-overflow
  * contract of [[graft.ops.Graph.bfsPathCounts]]' σ; the operating
  * envelope moves from 10³⁸ to the 2⁶² layer guard, which the output
  * seam's BIGINT presentation capped at 2⁶³ anyway).
  *
  * All three children are BIGINT; result BIGINT.
  */
case class BrandesTerm(sigmaV: Expression, deltaW: Expression,
    sigmaW: Expression) extends TernaryExpression {

  override def first: Expression = sigmaV
  override def second: Expression = deltaW
  override def third: Expression = sigmaW

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"brandes_term requires BIGINT inputs, got " +
        children.map(_.dataType.catalogString).mkString(", "))

  override def dataType: DataType = LongType
  override def prettyName: String = "brandes_term"

  override protected def nullSafeEval(sv: Any, dw: Any, sw: Any): Any =
    BrandesTerm.compute(sv.asInstanceOf[Long], dw.asInstanceOf[Long],
      sw.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sv, dw, sw) =>
      s"graft.functions.BrandesTerm.compute($sv, $dw, $sw)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BrandesTerm =
    copy(sigmaV = newFirst, deltaW = newSecond, sigmaW = newThird)
}

object BrandesTerm {
  private val ONE_E9 = 1000000000L

  /** Called from both interpreted eval and generated code. */
  def compute(sv: Long, dw: Long, sw: Long): Long = {
    if (sw <= 0L)
      throw new ArithmeticException(
        s"brandes_term: sigma_w must be positive, got $sw")
    if (sv < 0L || dw < 0L || dw > Long.MaxValue - ONE_E9)
      throw new ArithmeticException(
        s"brandes_term: input outside the long-accumulator range " +
          s"(sigma_v=$sv, delta_w=$dw) — upstream guard breached")
    val add = ONE_E9 + dw
    val hi = Math.multiplyHigh(sv, add)
    val lo = sv * add
    if (hi == 0L && lo >= 0L) lo / sw // product fits 63 bits: one divide
    else {
      // 128-bit product (possible only near the 2^62 layer-guard ceiling):
      // exact BigInteger divide, loud if the quotient exceeds BIGINT
      val q = java.math.BigInteger.valueOf(sv)
        .multiply(java.math.BigInteger.valueOf(add))
        .divide(java.math.BigInteger.valueOf(sw))
      try q.longValueExact() catch {
        case _: ArithmeticException => throw new ArithmeticException(
          s"brandes_term: result $q exceeds BIGINT — path-count " +
            "blowup; reduce rounds or the seed set")
      }
    }
  }

  def apply(sigmaV: Column, deltaW: Column, sigmaW: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(BrandesTerm(Bridge.expression(sigmaV),
      Bridge.expression(deltaW), Bridge.expression(sigmaW)))
  }
}
