package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** All sign-LSH bucket ids of a vector in one pass — `planes(t)(b)` is
  * hyperplane `b` of table `t`; output element `t` is table `t`'s
  * bucket id (`Σ bit·2^i`, identical fold to [[graft.sim.Ann.bucketId]]).
  *
  * Exists for compile-time, not algorithmic, reasons: unrolling
  * `nTables × nBits` literal-array dot products into the plan (the
  * previous shape) generates O(tables·bits·dim) Java source that
  * janino chews on for seconds — at d07's corpus-derived 40 tables ×
  * 6 bits × 64 dims that's ~15k generated expression terms PER QUERY
  * COMPILATION. Here the plane matrix rides along as one reference
  * object and the arithmetic is a tight JVM loop; the generated code
  * is a single call site regardless of parameters. Same FLOPs, same
  * output, constant-size codegen.
  */
case class SignBuckets(child: Expression, planes: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_buckets"

  def compute(vec: ArrayData): ArrayData = {
    val out = new Array[Long](planes.length)
    val n = vec.numElements()
    var t = 0
    while (t < planes.length) {
      val tbl = planes(t)
      var acc = 0L
      var b = 0
      while (b < tbl.length) {
        val p = tbl(b)
        require(p.length == n,
          s"sign_buckets: vector dim $n != plane dim ${p.length}")
        var d = 0.0
        var i = 0
        while (i < n) { d += vec.getDouble(i) * p(i); i += 1 }
        // NaN → bit 1, matching the replaced SQL `when(dot > 0, …)`
        // (Spark orders NaN above every real, so its `NaN > 0` is
        // true while the JVM's is false)
        acc = acc * 2 + (if (d > 0 || java.lang.Double.isNaN(d)) 1L else 0L)
        b += 1
      }
      out(t) = acc
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(vec: Any): Any = compute(vec.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("signBuckets", this, classOf[SignBuckets].getName)
    defineCodeGen(ctx, ev, v => s"$self.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): SignBuckets =
    copy(child = newChild)
}

object SignBuckets {
  def signBuckets(vec: Column, planes: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(SignBuckets(Bridge.expression(vec),
      planes.map(_.map(_.toArray).toArray).toArray))
}
