package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd |A ∩ B| over two SORTED-ASCENDING, duplicate-free
  * `array<bigint>` token-fingerprint sets — the exact-verification
  * kernel of the prefix-filtered set-similarity joins
  * ([[graft.dedup.SetSimJoin]]).
  *
  * Replaces `size(array_intersect(s1, s2))`, whose generic
  * implementation builds a boxed hash set per ROW — at candidate-pair
  * volume (⪆10⁵ pairs × ⪆10² tokens each at bench scale, linear in
  * corpus size beyond) the per-pair allocation dominated the verify
  * stage. A two-pointer merge over pre-sorted primitive arrays does
  * the same count with zero allocation; the single sort is paid once
  * per SET row upstream (|s|·log|s| per set, not per pair).
  *
  * SORTEDNESS IS A PRECONDITION, not checked (checking costs the pass
  * the kernel exists to save): callers must sort both sides with
  * `sort_array` where the set frames are built. Unsorted input gives
  * an UNDERCOUNT, never a crash. Null if either side is null.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var acc = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { acc += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    acc
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sortedIntersectCount", this,
      classOf[SortedIntersectCount].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$self.compute($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
}
