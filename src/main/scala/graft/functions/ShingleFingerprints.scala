package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit fingerprints of all word n-gram shingles of a single-spaced
  * string, in one pass over the UTF-8 bytes.
  *
  * Because the input is pre-normalized (single spaces, trimmed — see
  * TextNorm), every n-token shingle is a contiguous byte range, so
  * each fingerprint is an FNV-1a over that range: no token arrays, no
  * substring allocation, no interpreted higher-order functions. This
  * replaces a `transform(sequence…, slice + concat_ws + xxhash64)`
  * composition that, being lambda-based, is never codegen'd and
  * dominated the near-dup pipelines (~1 ms/doc interpreted vs ~1 µs
  * here).
  *
  * Texts with fewer than `n` tokens yield one whole-string shingle.
  */
case class ShingleFingerprints(child: Expression, n: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_fingerprints"

  /** Hot loop shared by interpreted eval and generated code. */
  def compute(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // token start offsets (single-space separated)
    var nTokens = if (len == 0) 0 else 1
    var i = 0
    while (i < len) {
      if (bytes(i) == ' ') nTokens += 1
      i += 1
    }
    if (nTokens < n) {
      return new GenericArrayData(
        Array(ShingleFingerprints.fmix64(Fingerprint64.hashBytes(bytes, seed))))
    }
    val starts = new Array[Int](nTokens + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTokens) = len + 1 // sentinel: "space" one past the end
    val out = new Array[Long](nTokens - n + 1)
    var k = 0
    while (k < out.length) {
      val from = starts(k)
      val until = starts(k + n) - 1 // exclude trailing separator
      out(k) = ShingleFingerprints.fmix64(
        Fingerprint64.hashRange(bytes, from, until, seed))
      k += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingleFp", this, classOf[ShingleFingerprints].getName)
    defineCodeGen(ctx, ev, c => s"$self.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleFingerprints =
    copy(child = newChild)
}

object ShingleFingerprints {
  def shingleFingerprints(textNorm: Column, n: Int,
                          seed: Long = Fingerprint64.DefaultSeed): Column =
    Bridge.column(ShingleFingerprints(Bridge.expression(textNorm), n, seed))

  /** MurmurHash3 finalizer: FNV-1a alone has weak bit avalanche,
    * which visibly degrades SimHash (per-bit balance matters there);
    * fmix64 restores full diffusion at ~3 ops per shingle. */
  def fmix64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }
}
