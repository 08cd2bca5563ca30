package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit FNV-1a rolling fingerprint of a string — a native Catalyst
  * expression with full codegen (`doGenCode`), so it participates in
  * whole-stage codegen like a built-in.
  *
  * This is the scale path for document fingerprinting (SURVEY.md §2
  * #31): at 100 TB the 8-byte fingerprint is what shuffles, not the
  * document body. The md5-based fingerprint in `t04_fingerprint` is
  * the cross-engine-checkable variant; this one is faster (no hex
  * string materialization) and seedable for hash families.
  */
case class Fingerprint64(child: Expression, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"

  override def nullSafeEval(input: Any): Any =
    Fingerprint64.hashBytes(input.asInstanceOf[UTF8String].getBytes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Fingerprint64.hashBytes($c.getBytes(), ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

object Fingerprint64 {
  /** FNV-1a 64-bit offset basis. */
  final val DefaultSeed = 0xcbf29ce484222325L
  private final val Prime = 0x100000001b3L

  /** Referenced from generated code — must stay public + static. */
  def hashBytes(bytes: Array[Byte], seed: Long): Long =
    hashRange(bytes, 0, bytes.length, seed)

  /** Range variant — the single FNV-1a implementation; ShingleFingerprints
    * hashes each shingle's contiguous byte range through this, so the
    * "shingle fingerprint == fingerprint of the shingle string" 1:1
    * correspondence d04 relies on can never silently diverge. */
  def hashRange(bytes: Array[Byte], from: Int, until: Int, seed: Long): Long = {
    var h = seed
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }

  def fingerprint64(c: Column): Column =
    Bridge.column(Fingerprint64(Bridge.expression(c), DefaultSeed))

  def fingerprint64(c: Column, seed: Long): Column =
    Bridge.column(Fingerprint64(Bridge.expression(c), seed))
}
