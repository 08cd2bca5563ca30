package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** LZ78 phrase count of a string's UTF-8 bytes — the classic
  * dictionary-parse complexity measure (Lempel & Ziv, IEEE-IT 1978):
  * the number of phrases in the incremental parse, where each phrase
  * is the longest already-seen phrase plus one new byte. A
  * compression-based QUALITY signal for corpus curation: template junk
  * and keyboard-mash repetition parse into few long phrases (low
  * count), natural text into many short ones — the signal behind
  * "compression ratio" filters in production corpus pipelines, exact
  * and deterministic by construction (no codec library, no level
  * knobs; gzip-family output is implementation-versioned, this parse
  * is a mathematical function of the bytes).
  *
  * Growth: for an i.i.d.-ish source the count is Θ(n / log n); for a
  * single repeated byte it collapses to Θ(√n). The per-row cost is one
  * pass with a long→int hash probe per byte — embarrassingly parallel,
  * no state outside the row (the dictionary is per-DOCUMENT, bounded
  * by the doc's own length, reset every row).
  *
  * The dictionary is an open-addressed long→int table keyed by
  * (prefix-phrase id << 9 | next byte + 1) — the shifted byte field
  * spans 1..256 (9 bits), ids stay below 2^24 for any 16 MiB
  * document, so the packed key never collides structurally.
  */
case class Lz78Phrases(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "lz78_phrases"

  /** Hot loop shared by interpreted eval and generated code. Open
    * addressing with linear probing; capacity is a power of two grown
    * at 60% load. key 0 is impossible (a real key always carries a
    * phrase byte with the id shifted clear of it, and id 0 + byte b
    * packs to 1+b ≥ 1), so 0 marks an empty slot. */
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val len = bytes.length
    if (len == 0) return 0L
    var cap = 1 << 10
    var keys = new Array[Long](cap)
    var vals = new Array[Int](cap)
    var size = 0
    var nextId = 1
    var prev = 0
    var phrases = 0L
    var i = 0
    while (i < len) {
      val key = (prev.toLong << 9) | ((bytes(i) & 0xff) + 1L)
      // probe
      var idx = (java.lang.Long.hashCode(key * 0x9e3779b97f4a7c15L)
        & (cap - 1))
      var found = -1
      while (found == -1 && keys(idx) != 0L) {
        if (keys(idx) == key) found = vals(idx)
        else idx = (idx + 1) & (cap - 1)
      }
      if (found != -1) {
        prev = found
      } else {
        keys(idx) = key
        vals(idx) = nextId
        nextId += 1
        size += 1
        phrases += 1L
        prev = 0
        if (size * 5 > cap * 3) { // grow at 60% load
          val oldKeys = keys; val oldVals = vals
          cap <<= 1
          keys = new Array[Long](cap)
          vals = new Array[Int](cap)
          var j = 0
          while (j < oldKeys.length) {
            val k = oldKeys(j)
            if (k != 0L) {
              var x = (java.lang.Long.hashCode(k * 0x9e3779b97f4a7c15L)
                & (cap - 1))
              while (keys(x) != 0L) x = (x + 1) & (cap - 1)
              keys(x) = k
              vals(x) = oldVals(j)
            }
            j += 1
          }
        }
      }
      i += 1
    }
    if (prev != 0) phrases += 1L // trailing partial phrase
    phrases
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self =
      ctx.addReferenceObj("lz78Phrases", this, classOf[Lz78Phrases].getName)
    defineCodeGen(ctx, ev, c => s"$self.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Lz78Phrases =
    copy(child = newChild)
}

object Lz78Phrases {
  def lz78Phrases(c: Column): Column =
    Bridge.column(Lz78Phrases(Bridge.expression(c)))
}
