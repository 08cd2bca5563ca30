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

  /** Σ|q_i| over an int code array as long; 0 for empty. Codegen'd
    * sibling of [[AbsMax]] for the sound near-dup prefilter's L1 term
    * ([[graft.sim.Ann.int8CodeCols]]) — a `functions.aggregate`
    * lambda would put an interpreted lambdafunction in every
    * candidate-stage plan (PlanSpec forbids exactly that). */
  case class SumAbsInt(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<int> input, got ${dt.catalogString}")
    }

    override def dataType: DataType = LongType
    override def prettyName: String = "vec_sum_abs_int"

    def compute(a: ArrayData): Long = {
      val n = a.numElements()
      var s = 0L
      var i = 0
      while (i < n) {
        require(!a.isNullAt(i), s"$prettyName: null element at index $i")
        s += math.abs(a.getInt(i).toLong)
        i += 1
      }
      s
    }

    override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("sumAbsInt", this, classOf[SumAbsInt].getName)
      defineCodeGen(ctx, ev, a => s"$self.compute($a)")
    }

    override protected def withNewChildInternal(newChild: Expression): SumAbsInt =
      copy(child = newChild)
  }

  def sumAbsInt(a: Column): Column = Bridge.column(SumAbsInt(Bridge.expression(a)))

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

  /** Sign-bit packing for binary quantization (s29) — the memory
    * tier below int8: one BIT per dimension (32× smaller than float,
    * 8× below the int8 codes), packed MSB-first into 32-bit words
    * carried as array<long> (⌈d/32⌉ words; word w =
    * fold acc·2 + (x_i > 0) over i ∈ [32w, min(d, 32w+32))). Strict
    * `> 0`: zeros and −0.0 pack as 0 on every engine, so the words —
    * and every Hamming distance over them — are integer-exact and
    * DuckDB-oracleable (unlike [[SignBuckets]], which maps NaN dots
    * to 1 for its bucket-stability contract). 32-bit words keep the
    * oracle SQL in signed-BIGINT-safe shifts. */
  case class SignPack(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else fail(prettyName, child.dataType)

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "vec_sign_pack"

    private lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    def compute(a: ArrayData): ArrayData = {
      val n = a.numElements()
      val words = (n + 31) / 32
      val out = new Array[Long](words)
      var w = 0
      while (w < words) {
        var acc = 0L
        var i = w * 32
        val end = math.min(n, w * 32 + 32)
        while (i < end) {
          require(!a.isNullAt(i), s"$prettyName: null element at index $i")
          val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
          acc = acc * 2 + (if (x > 0) 1L else 0L)
          i += 1
        }
        out(w) = acc
        w += 1
      }
      new GenericArrayData(out)
    }

    override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("signPack", this, classOf[SignPack].getName)
      defineCodeGen(ctx, ev, a => s"$self.compute($a)")
    }

    override protected def withNewChildInternal(newChild: Expression): SignPack =
      copy(child = newChild)
  }

  /** Σ popcount(a_w XOR b_w) over two equal-length packed-word arrays
    * ([[SignPack]]) — the s29 Hamming distance, one codegen'd fused
    * kernel instead of a zip_with lambda + bit_count chain. */
  case class HammingPacked(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<long> inputs, got ${l.catalogString}, ${r.catalogString}")
      }

    override def dataType: DataType = LongType
    override def prettyName: String = "vec_hamming_packed"

    def compute(a: ArrayData, b: ArrayData): Long = {
      val n = a.numElements()
      require(b.numElements() == n,
        s"$prettyName: word count mismatch ($n vs ${b.numElements()})")
      var s = 0L
      var i = 0
      while (i < n) {
        require(!a.isNullAt(i) && !b.isNullAt(i),
          s"$prettyName: null word at index $i")
        s += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
        i += 1
      }
      s
    }

    override def nullSafeEval(a: Any, b: Any): Any =
      compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("hammingPacked", this, classOf[HammingPacked].getName)
      defineCodeGen(ctx, ev, (a, b) => s"$self.compute($a, $b)")
    }

    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): HammingPacked = copy(left = newLeft, right = newRight)
  }

  def absMax(v: Column): Column = Bridge.column(AbsMax(Bridge.expression(v)))
  def quantizeInt8(v: Column): Column = Bridge.column(Quantize(Bridge.expression(v)))
  def signPack(v: Column): Column = Bridge.column(SignPack(Bridge.expression(v)))
  def hammingPacked(a: Column, b: Column): Column =
    Bridge.column(HammingPacked(Bridge.expression(a), Bridge.expression(b)))
}
