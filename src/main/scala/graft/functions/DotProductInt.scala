package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Codegen'd integer dot product over `array<int>` — the scoring
  * kernel for int8-quantized ANN ([[graft.sim.Ann.int8RerankTopK]]).
  *
  * Same pattern as [[DotProduct]] (higher-order lambdas are never
  * codegen'd), but accumulating in long: int8 codes are ≤ 127 in
  * magnitude, so a 64-dim dot is ≤ 64·127² ≈ 2²⁰ — exact in long for
  * any realistic dimension (overflow needs ~2⁴⁹ elements). Null if
  * either array is null; fails loudly on length mismatch.
  */
case class DotProductInt(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<int> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_product_int"

  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"dot_product_int: mismatched vector lengths $n vs ${b.numElements()}")
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getInt(i).toLong * b.getInt(i).toLong
      i += 1
    }
    acc
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("dotProductInt", this, classOf[DotProductInt].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$self.compute($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductInt =
    copy(left = newLeft, right = newRight)
}

object DotProductInt {
  def dotInt(a: Column, b: Column): Column =
    Bridge.column(DotProductInt(Bridge.expression(a), Bridge.expression(b)))
}
