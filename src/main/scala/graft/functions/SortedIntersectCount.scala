package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** |a ∩ b| for two SORTED-ascending distinct long arrays, as a native
  * codegen expression: one linear merge pass, zero allocation — where
  * `size(array_intersect(a, b))` builds a hash set PER CALL, which is the
  * whole cost of a similarity-join verify stage running millions of pairs
  * (each array is built once but intersected against many partners).
  * Callers own the contract that both arrays are sorted distinct —
  * [[graft.ops.Dedup.hashedShingleSets]] emits exactly that; an unsorted
  * input silently undercounts, so do not expose this on arbitrary arrays.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  // containsNull inputs are REJECTED, not tolerated: compute() reads
  // elements with getLong, so a null slot would silently count as 0L on
  // the unsafe path (wrong answer) or NPE interpreted — and a sorted-set
  // contract has no place for null elements anyway
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(LongType, false) &&
        right.dataType == ArrayType(LongType, false))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sorted_intersect_count requires ARRAY<BIGINT> with non-null " +
        s"elements on both sides, got ${left.dataType.catalogString} and " +
        s"${right.dataType.catalogString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedIntersectCount.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Called from both interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(SortedIntersectCount(
      Bridge.expression(a), Bridge.expression(b)))
  }
}
