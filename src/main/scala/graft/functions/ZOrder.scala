package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) interleaving for multi-dimensional data layout
  * (SURVEY.md §2 #96) — the technique behind lakehouse
  * `OPTIMIZE ZORDER BY`: interleaving the bits of two quantized
  * dimensions gives a single sort key under which rows close in BOTH
  * dimensions land close in the file order. Range-partitioning and
  * writing by z-value therefore concentrates any 2-D box predicate's
  * rows into few files, which is what makes min/max-stats file
  * skipping effective at 100 TB — a 1-D sort clusters one dimension
  * and scatters the other (ZOrderSpec measures exactly this).
  *
  * Pure bigint bit arithmetic (shift/mask/or) — engine-exact, so the
  * z-value itself is oracle-checkable against the equivalent 32-term
  * DuckDB expression.
  */
case class InterleaveBits16(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bigint inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits16"

  /** a's bit i → output bit 2i; b's bit i → output bit 2i+1.
    * Inputs are masked to their low 16 bits (callers quantize). */
  def compute(a: Long, b: Long): Long = {
    var out = 0L
    var i = 0
    while (i < 16) {
      out |= ((a >>> i) & 1L) << (2 * i)
      out |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("interleave", this, classOf[InterleaveBits16].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$self.compute($a, $b)")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): InterleaveBits16 =
    copy(left = l, right = r)
}

object ZOrder {
  /** Morton z-value of two 16-bit-quantized bigint dimensions. */
  def zvalue16(a: Column, b: Column): Column =
    Bridge.column(InterleaveBits16(Bridge.expression(a), Bridge.expression(b)))

  /** The equivalent DuckDB SQL (32 shift/mask terms) for the oracle. */
  def zvalueSql(a: String, b: String): String =
    (0 until 16).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
}
