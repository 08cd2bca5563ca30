package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import org.apache.spark.sql.graft.Bridge

/** Symmetric int8 quantization for embedding columns — the vector-store
  * prep step that shrinks a float corpus 4× before ANN serving.
  *
  * Per vector: `amax = max|x_i|`, `q_i = floor(x_i·127/amax + 0.5)`
  * (∈ [−127, 127]; an all-zero vector quantizes to zeros). Both the
  * scale and the codes are single correctly-rounded IEEE expressions,
  * so they are engine-exact under the [[graft.Exact]] rules.
  *
  * Same custom-expression pattern as [[DotProduct]]: per-element
  * lambdas (`transform`) are never codegen'd by Spark, so a tight JVM
  * loop behind `doGenCode` keeps the whole projection inside
  * WholeStageCodegen.
  */
object QuantizeInt8 {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType | FloatType, _) => true
    case _ => false
  }

  private def fail(pretty: String, dt: DataType): TypeCheckResult =
    TypeCheckResult.TypeCheckFailure(
      s"$pretty requires an array<double> or array<float> input, got ${dt.catalogString}")

  /** max(|x_i|) as double; 0.0 for an empty vector. */
  case class AbsMax(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else fail(prettyName, child.dataType)

    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_abs_max"

    private lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    def compute(a: ArrayData): Double = {
      val n = a.numElements()
      var m = 0.0
      var i = 0
      while (i < n) {
        // fail loudly on null elements (ArrayData would silently read
        // garbage/0.0) — matches sig_match_count/dot_product behavior
        require(!a.isNullAt(i), s"$prettyName: null element at index $i")
        val v = math.abs(if (isFloat) a.getFloat(i).toDouble else a.getDouble(i))
        if (v > m) m = v
        i += 1
      }
      m
    }

    override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("absMax", this, classOf[AbsMax].getName)
      defineCodeGen(ctx, ev, a => s"$self.compute($a)")
    }

    override protected def withNewChildInternal(newChild: Expression): AbsMax =
      copy(child = newChild)
  }

  /** `floor(x_i·127/amax + 0.5)` per element as array<int>. */
  case class Quantize(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else fail(prettyName, child.dataType)

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "vec_quantize_int8"

    private lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    def compute(a: ArrayData): ArrayData = {
      val n = a.numElements()
      var amax = 0.0
      var i = 0
      while (i < n) {
        require(!a.isNullAt(i), s"$prettyName: null element at index $i")
        val v = math.abs(if (isFloat) a.getFloat(i).toDouble else a.getDouble(i))
        if (v > amax) amax = v
        i += 1
      }
      val out = new Array[Int](n)
      if (amax > 0.0) {
        i = 0
        while (i < n) {
          val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
          out(i) = math.floor(x * 127.0 / amax + 0.5).toInt
          i += 1
        }
      }
      new GenericArrayData(out)
    }

    override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("quantize", this, classOf[Quantize].getName)
      defineCodeGen(ctx, ev, a => s"$self.compute($a)")
    }

    override protected def withNewChildInternal(newChild: Expression): Quantize =
      copy(child = newChild)
  }

  def absMax(v: Column): Column = Bridge.column(AbsMax(Bridge.expression(v)))
  def quantizeInt8(v: Column): Column = Bridge.column(Quantize(Bridge.expression(v)))
}
