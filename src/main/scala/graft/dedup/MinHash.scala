package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MinHash + LSH near-duplicate detection (SURVEY.md §2 #22).
  *
  * shingle (word n-grams) → 64-bit hash per shingle (`xxhash64`) →
  * k-permutation minhash signature (one pass, custom expression) →
  * band hashes → bucket self-join for candidates → signature-overlap
  * verification.
  *
  * Scale shape: per-document work is a single projection; the only
  * shuffle is the band-bucket join, which carries (doc_id, band_hash)
  * pairs — 16 bytes/row/band — never document text. Candidate pairs
  * are bucket-local, so cost is O(Σ bucket²), not O(n²).
  */
object MinHash {

  /** Minhash signature of a set of 64-bit element hashes.
    *
    * Permutation family: h_i(v) = a_i·v + b_i (mod 2^64) with odd a_i
    * derived from `seed` via splitmix64 — deterministic across runs
    * and JVMs. Signed min is used consistently on both sides of any
    * comparison, so ordering choice is immaterial.
    */
  case class MinHashSignature(child: Expression, k: Int, seed: Long)
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.catalogString}")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_signature"

    @transient private lazy val (as, bs): (Array[Long], Array[Long]) = {
      val a = new Array[Long](k)
      val b = new Array[Long](k)
      var i = 0
      while (i < k) {
        a(i) = MinHash.splitmix64(seed + 2 * i) | 1L // odd multiplier
        b(i) = MinHash.splitmix64(seed + 2 * i + 1)
        i += 1
      }
      (a, b)
    }

    /** Hot loop shared by interpreted eval and generated code. */
    def computeSig(arr: ArrayData): GenericArrayData = {
      val n = arr.numElements()
      val sig = Array.fill[Long](k)(Long.MaxValue)
      var j = 0
      while (j < n) {
        val v = arr.getLong(j)
        var i = 0
        while (i < k) {
          val h = as(i) * v + bs(i)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
        j += 1
      }
      new GenericArrayData(sig)
    }

    override def nullSafeEval(input: Any): Any =
      computeSig(input.asInstanceOf[ArrayData])

    /** Full codegen: the generated code calls [[computeSig]] on the
      * already-materialized child array, so the (regex + shingle)
      * subtree stays in whole-stage codegen instead of being
      * re-interpreted per row (a CodegenFallback here made the d03
      * pipeline ~20× slower). */
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSignature].getName)
      defineCodeGen(ctx, ev, c => s"$self.computeSig($c)")
    }

    override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
      copy(child = newChild)
  }

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Word n-gram shingles of a pre-normalized, single-spaced text
    * column, hashed to 64 bits — single-pass codegen'd expression
    * (see [[graft.functions.ShingleFingerprints]]; a lambda-based
    * `transform(…, xxhash64(concat_ws(slice(…))))` composition is
    * interpreted by Spark and ~1000× slower per doc). */
  def shingleHashes(textNorm: Column, n: Int): Column =
    graft.functions.ShingleFingerprints.shingleFingerprints(textNorm, n)

  def signature(shingleHashes: Column, k: Int, seed: Long): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingleHashes), k, seed))

  /** One 64-bit hash per band of `r = k / nBands` signature rows —
    * rotate-xor fold in a single codegen'd pass ([[BandHashesExpr]]).
    * The earlier `transform(sequence…, aggregate(slice…))` computed
    * the same values but was interpreted per element (nBands·r lambda
    * dispatches and slice allocations per row). */
  def bandHashes(sig: Column, nBands: Int, k: Int): Column = {
    require(k % nBands == 0,
      s"bandHashes: nBands=$nBands must divide k=$k (trailing signature " +
      "rows would silently drop from every band, weakening LSH recall)")
    Bridge.column(BandHashesExpr(Bridge.expression(sig), nBands))
  }

  case class BandHashesExpr(child: Expression, nBands: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.catalogString}")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "band_hashes"

    def compute(sig: ArrayData): GenericArrayData = {
      val k = sig.numElements()
      require(k % nBands == 0,
        s"band_hashes: signature length $k not divisible by $nBands bands")
      val r = k / nBands
      val out = new Array[Long](nBands)
      var j = 0
      while (j < nBands) {
        var acc = 1125899906842597L
        var i = j * r
        val end = i + r
        while (i < end) {
          acc = (java.lang.Long.rotateLeft(acc, 5)) ^ sig.getLong(i)
          i += 1
        }
        out(j) = acc
        j += 1
      }
      new GenericArrayData(out)
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("bandHashes", this, classOf[BandHashesExpr].getName)
      defineCodeGen(ctx, ev, c => s"$self.compute($c)")
    }

    override protected def withNewChildInternal(newChild: Expression): BandHashesExpr =
      copy(child = newChild)
  }

  /** Candidate near-dup pairs: equal band hash in any band. */
  def candidatePairs(sigs: DataFrame, idCol: String, sigCol: String, nBands: Int, k: Int): DataFrame = {
    // barrier → ReuseExchange computes signatures once for both sides
    val mat = sigs.repartition(col(idCol))
    val bands = mat.select(
        col(idCol),
        posexplode(bandHashes(col(sigCol), nBands, k)).as(Seq("band", "bh")))
      .select(idCol, "band", "bh")
    val b1 = bands.toDF("id1", "band1", "bh1")
    val b2 = bands.toDF("id2", "band2", "bh2")
    b1.join(b2,
        col("band1") === col("band2") && col("bh1") === col("bh2") &&
        col("id1") < col("id2"))
      .select("id1", "id2")
      .distinct()
  }

  /** Signature-overlap count (k·estimated-jaccard) for verification —
    * codegen'd single pass; runs once per CANDIDATE PAIR, so the
    * interpreted `zip_with`+`aggregate` version sat directly on the
    * LSH join's hot path. */
  def sigMatches(sig1: Column, sig2: Column): Column =
    Bridge.column(SigMatchCount(Bridge.expression(sig1), Bridge.expression(sig2)))

  case class SigMatchCount(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (a, b) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<bigint> inputs, got " +
          s"${a.catalogString} and ${b.catalogString}")
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "sig_match_count"

    def compute(a: ArrayData, b: ArrayData): Long = {
      // fail loudly on mixed-k signatures (matches DotProduct): a silent
      // min-length truncation would quietly deflate similarity estimates
      require(a.numElements() == b.numElements(),
        s"sig_match_count: signature lengths differ (${a.numElements()} vs ${b.numElements()})")
      val n = a.numElements()
      var c = 0L
      var i = 0
      while (i < n) {
        if (a.getLong(i) == b.getLong(i)) c += 1
        i += 1
      }
      c
    }

    override def nullSafeEval(a: Any, b: Any): Any =
      compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("sigMatch", this, classOf[SigMatchCount].getName)
      defineCodeGen(ctx, ev, (a, b) => s"$self.compute($a, $b)")
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SigMatchCount =
      copy(left = newLeft, right = newRight)
  }
}
