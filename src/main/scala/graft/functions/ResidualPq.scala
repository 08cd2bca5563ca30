package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Residual-PQ kernels for IVF-PQ (SURVEY.md §2 #94) — the classic
  * IVFADC layout (Jégou et al. 2011 §IV): a vector is stored as its
  * coarse cell plus PQ codes of the RESIDUAL `v/‖v‖ − centroid(cell)`.
  * Residuals are small (the coarse quantizer absorbed the corpus
  * structure), so the same 8-byte code budget quantizes far finer
  * than PQ on raw vectors — and one shared residual codebook serves
  * every cell. Reference-object kernels like [[SignBuckets]] /
  * [[CentroidCells]]: constant-size codegen at any parameter count.
  */
object ResidualPq {

  /** PQ codes of `vec/nrm − coarse(cell)` under the residual
    * codebooks: array<int> of length m. */
  case class Encode(first: Expression, second: Expression, third: Expression,
                    coarse: Array[Array[Double]],
                    cb: ProductQuantizer.Codebooks)
      extends TernaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (first.dataType, second.dataType, third.dataType) match {
        case (ArrayType(DoubleType, _), DoubleType, IntegerType) =>
          TypeCheckResult.TypeCheckSuccess
        case (a, b, c) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double>, double, int), got " +
            s"${a.catalogString}, ${b.catalogString}, ${c.catalogString}")
      }
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "residual_pq_encode"

    def compute(vec: ArrayData, nrm: Double, cell: Int): ArrayData = {
      require(vec.numElements() == cb.dim,
        s"residual_pq_encode: dim ${vec.numElements()} != codebook dim ${cb.dim}")
      val ctr = coarse(cell)
      val codes = new Array[Int](cb.m)
      var s = 0
      while (s < cb.m) {
        val off = s * cb.dsub
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cb.ksub) {
          val sub = cb.cent(s)(c)
          var d = 0.0; var i = 0
          while (i < cb.dsub) {
            val t = vec.getDouble(off + i) / nrm - ctr(off + i) - sub(i)
            d += t * t; i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        codes(s) = best
        s += 1
      }
      new GenericArrayData(codes)
    }

    override def nullSafeEval(v: Any, n: Any, c: Any): Any =
      compute(v.asInstanceOf[ArrayData], n.asInstanceOf[Double], c.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("residualEncode", this, classOf[Encode].getName)
      defineCodeGen(ctx, ev, (v, n, c) => s"$self.compute($v, $n, $c)")
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Encode =
      copy(first = f, second = s, third = t)
  }

  /** `(q/‖q‖) · centroid(cell)` — the per-cell base term of the IVFADC
    * score (the residual LUT adds the fine term). */
  case class CentroidDot(left: Expression, right: Expression, cellExpr: Expression,
                         coarse: Array[Array[Double]])
      extends TernaryExpression {
    override def first: Expression = left
    override def second: Expression = right
    override def third: Expression = cellExpr
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType, cellExpr.dataType) match {
        case (ArrayType(DoubleType, _), DoubleType, IntegerType) =>
          TypeCheckResult.TypeCheckSuccess
        case (a, b, c) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double>, double, int), got " +
            s"${a.catalogString}, ${b.catalogString}, ${c.catalogString}")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "centroid_dot"

    def compute(vec: ArrayData, nrm: Double, cell: Int): Double = {
      val ctr = coarse(cell)
      var d = 0.0
      var i = 0
      while (i < ctr.length) { d += vec.getDouble(i) / nrm * ctr(i); i += 1 }
      d
    }

    override def nullSafeEval(v: Any, n: Any, c: Any): Any =
      compute(v.asInstanceOf[ArrayData], n.asInstanceOf[Double], c.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("centroidDot", this, classOf[CentroidDot].getName)
      defineCodeGen(ctx, ev, (v, n, c) => s"$self.compute($v, $n, $c)")
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): CentroidDot =
      copy(left = f, right = s, cellExpr = t)
  }

  def residualEncode(vec: Column, nrm: Column, cell: Column,
                     coarse: Seq[Seq[Double]], cb: ProductQuantizer.Codebooks): Column =
    Bridge.column(Encode(Bridge.expression(vec), Bridge.expression(nrm),
      Bridge.expression(cell), coarse.map(_.toArray).toArray, cb))

  def centroidDot(vec: Column, nrm: Column, cell: Column,
                  coarse: Seq[Seq[Double]]): Column =
    Bridge.column(CentroidDot(Bridge.expression(vec), Bridge.expression(nrm),
      Bridge.expression(cell), coarse.map(_.toArray).toArray))
}
