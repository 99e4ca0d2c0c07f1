package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType}

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
  * Why a custom expression: Spark's `div` on decimals narrows the result
  * to LONG (wraps for centrality-scale path counts) and decimal `/`
  * rounds HALF_UP at scale ≥ 6 (floor of a near-integer quotient can be
  * off by one). This computes in unbounded BigInteger and fails LOUDLY —
  * ArithmeticException — if the result exceeds DECIMAL(38,0) or σ_w ≤ 0,
  * never a silent null (the loud-overflow contract of
  * [[graft.ops.Graph.bfsPathCounts]]' σ).
  *
  * All three children are DECIMAL(38,0); result DECIMAL(38,0).
  */
case class BrandesTerm(sigmaV: Expression, deltaW: Expression,
    sigmaW: Expression) extends TernaryExpression {

  override def first: Expression = sigmaV
  override def second: Expression = deltaW
  override def third: Expression = sigmaW

  private val d38 = DecimalType(38, 0)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == d38)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"brandes_term requires DECIMAL(38,0) inputs, got " +
        children.map(_.dataType.catalogString).mkString(", "))

  override def dataType: DataType = d38
  override def prettyName: String = "brandes_term"

  override protected def nullSafeEval(sv: Any, dw: Any, sw: Any): Any =
    BrandesTerm.compute(sv.asInstanceOf[Decimal], dw.asInstanceOf[Decimal],
      sw.asInstanceOf[Decimal])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sv, dw, sw) =>
      s"graft.functions.BrandesTerm.compute($sv, $dw, $sw)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BrandesTerm =
    copy(sigmaV = newFirst, deltaW = newSecond, sigmaW = newThird)
}

object BrandesTerm {
  private val ONE_E9 = java.math.BigInteger.valueOf(1000000000L)

  /** Called from both interpreted eval and generated code. */
  def compute(sv: Decimal, dw: Decimal, sw: Decimal): Decimal = {
    val svI = sv.toJavaBigDecimal.toBigIntegerExact
    val dwI = dw.toJavaBigDecimal.toBigIntegerExact
    val swI = sw.toJavaBigDecimal.toBigIntegerExact
    if (swI.signum <= 0)
      throw new ArithmeticException(
        s"brandes_term: sigma_w must be positive, got $swI")
    val q = svI.multiply(ONE_E9.add(dwI)).divide(swI)
    val out = Decimal(new java.math.BigDecimal(q))
    if (!out.changePrecision(38, 0))
      throw new ArithmeticException(
        s"brandes_term: result $q exceeds DECIMAL(38,0) — path-count " +
          "blowup; reduce rounds or the seed set")
    out
  }

  def apply(sigmaV: Column, deltaW: Column, sigmaW: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(BrandesTerm(Bridge.expression(sigmaV),
      Bridge.expression(deltaW), Bridge.expression(sigmaW)))
  }
}
