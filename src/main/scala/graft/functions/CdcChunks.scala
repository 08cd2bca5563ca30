package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit fingerprints of a string's content-defined chunks in ONE
  * pass over the UTF-8 bytes — the codegen replacement for d17's
  * lambda composition (filter-over-sequence boundary scan + transform
  * of md5(substring) — higher-order lambdas are never codegen'd and
  * allocate a substring per chunk; this allocates one output array).
  *
  * Boundary rule (must stay textually in sync with the d17 DuckDB
  * oracle): a cut AFTER byte j when (31·b_j + b_{j+1}) mod 16 = 0.
  * The oracle evaluates the same rule on CHARACTERS (`ascii`), which
  * is byte-identical for ASCII corpora — real CDC is byte-level; on
  * non-ASCII text the oracle mirror, not this expression, is the
  * approximation.
  *
  * Chunk identity is fmix64(FNV-1a) of the chunk's byte range — the
  * same 1:1 content↔fingerprint regime as [[ShingleFingerprints]].
  * A 64-bit collision would need TWO different chunks to collide AND
  * meet inside one capped digest bucket AND two more to do the same
  * for the pair to clear d17's ≥3-shared-chunk support floor — at
  * 10¹² chunks the birthday term alone is ~3%, and the floor makes a
  * false pair require three independent collisions on the same doc
  * pair (~10⁻⁵⁰): fingerprint width is not the scale risk here. */
case class CdcChunks(child: Expression, modulus: Int, seed: Long)
    extends UnaryExpression {

  require(modulus > 0, s"modulus must be positive: $modulus")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  /** Hot loop shared by interpreted eval and generated code. */
  def compute(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    if (len == 0) return new GenericArrayData(Array.empty[Long])
    var arr = new Array[Long](8)
    var n = 0
    var start = 0
    var j = 0
    while (j < len - 1) {
      if (((bytes(j) & 0xff) * 31 + (bytes(j + 1) & 0xff)) % modulus == 0) {
        if (n == arr.length) arr = java.util.Arrays.copyOf(arr, n * 2)
        arr(n) = ShingleFingerprints.fmix64(
          Fingerprint64.hashRange(bytes, start, j + 1, seed))
        n += 1
        start = j + 1
      }
      j += 1
    }
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, n + 1)
    arr(n) = ShingleFingerprints.fmix64(
      Fingerprint64.hashRange(bytes, start, len, seed))
    n += 1
    new GenericArrayData(java.util.Arrays.copyOf(arr, n))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("cdcChunks", this, classOf[CdcChunks].getName)
    defineCodeGen(ctx, ev, c => s"$self.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  val DefaultSeed: Long = 0xcbf29ce484222325L // FNV offset basis

  def cdcChunks(c: Column, modulus: Int = 16): Column =
    Bridge.column(CdcChunks(Bridge.expression(c), modulus, DefaultSeed))
}
