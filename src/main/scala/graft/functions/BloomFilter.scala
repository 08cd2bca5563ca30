package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom-filter runtime join filter (SURVEY.md §2 #88) — the explicit
  * form of the semi-join reduction Spark's own AQE runtime filter
  * performs when statistics let it: build a bit-set sketch over the
  * SMALL (already filtered) side's join keys, broadcast it, and drop
  * big-side rows that cannot possibly match BEFORE they reach the
  * shuffle. False positives only (removed by the real join that
  * follows); false negatives never — so the composed query is
  * result-identical to the plain join, and at 100 TB the fact-side
  * shuffle shrinks by the dimension predicate's selectivity (the
  * filter evaluates in the scan stage, next to the parquet reader).
  *
  * The sketch itself crosses the driver once (`build`) — the same
  * sketch-sized subquery round-trip as Spark's InjectRuntimeFilter,
  * NOT a collect of data rows: 10 bits/key at 1% fpp makes a 1M-key
  * dimension a 1.2 MB broadcast.
  *
  * Hashing: Kirsch–Mitzenmacher double hashing over the fmix64
  * finalizer (full avalanche; same mixer the SimHash path uses).
  */
object BloomFilter {

  /** MurmurHash3 fmix64 finalizer. */
  def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }

  /** Optimal sizing for `expectedKeys` at `fpp`: m = −n·ln p / ln²2
    * bits (rounded up to a power of two for mask indexing),
    * k = (m/n)·ln 2 hash probes. */
  def sizing(expectedKeys: Long, fpp: Double): (Int, Int) = {
    require(expectedKeys > 0 && fpp > 0 && fpp < 1, s"bad bloom sizing ($expectedKeys, $fpp)")
    val ln2 = math.log(2.0)
    val mBits = math.max(64.0, -expectedKeys.toDouble * math.log(fpp) / (ln2 * ln2))
    val uncapped = java.lang.Long.highestOneBit(math.ceil(mBits).toLong * 2 - 1)
    val pow2 = math.min(1L << 30, uncapped)
    val k = math.max(1, math.round(pow2.toDouble / expectedKeys.toDouble * ln2).toInt)
    val kCapped = math.min(16, k)
    if (uncapped > (1L << 30)) {
      // the fpp contract is NOT met past the cap: harmless where a real
      // join removes false positives (q45), but a caller that DROPS on
      // membership (bloom-dedup streams) must know the realized rate
      val realized = math.pow(
        1.0 - math.exp(-kCapped.toDouble * expectedKeys.toDouble / pow2.toDouble), kCapped.toDouble)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        f"bloom sizing capped at 2^30 bits: $expectedKeys%d keys at requested fpp=$fpp%g " +
        f"need $uncapped%d bits; realized fpp ≈ $realized%.4f")
    }
    (pow2.toInt, kCapped)
  }

  private def setBit(words: Array[Long], idx: Long): Unit = {
    val i = idx.toInt
    words(i >>> 6) |= 1L << (i & 63)
  }

  private def getBit(words: Array[Long], idx: Long): Boolean = {
    val i = idx.toInt
    (words(i >>> 6) & (1L << (i & 63))) != 0L
  }

  /** Mutating insert into a raw word array (numBits = words.length·64,
    * power of two) — the streaming state-store path, where the words
    * live inside a `GroupState` rather than a built [[Filter]].
    * h1/h2 are hoisted once per key (the probe loop is the scan-stage
    * hot path — recomputing two fmix64 per probe doubles the work). */
  def insert(words: Array[Long], key: Long, numHashes: Int): Unit = {
    val numBits = words.length << 6
    val mask = (numBits - 1).toLong
    val h1 = fmix64(key)
    val h2 = fmix64(key + 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < numHashes) { setBit(words, (h1 + i.toLong * h2) & mask); i += 1 }
  }

  /** Membership probe against a raw word array. */
  def contains(words: Array[Long], key: Long, numHashes: Int): Boolean = {
    val numBits = words.length << 6
    val mask = (numBits - 1).toLong
    val h1 = fmix64(key)
    val h2 = fmix64(key + 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < numHashes) {
      if (!getBit(words, (h1 + i.toLong * h2) & mask)) return false
      i += 1
    }
    true
  }

  /** Mergeable bit-set aggregator: map-side partials OR together, so
    * only sketch-sized buffers cross the wire (never key lists). */
  class Agg(numBits: Int, numHashes: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(Integer.bitCount(numBits) == 1, s"numBits must be a power of two, got $numBits")
    override def zero: Array[Long] = new Array[Long](numBits >>> 6)
    override def reduce(b: Array[Long], key: Long): Array[Long] = {
      BloomFilter.insert(b, key, numHashes)
      b
    }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) |= b2(i); i += 1 }
      b1
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Immutable built filter. `words` is the bit-set; membership is
    * [[mightContain]] — false negatives are impossible. */
  final case class Filter(words: Array[Long], numHashes: Int) {
    def numBits: Int = words.length << 6
    def contains(key: Long): Boolean = BloomFilter.contains(words, key, numHashes)
  }

  /** Build a filter over a single long key column. One driver-side
    * action on a SKETCH-sized aggregate (the runtime-filter subquery
    * pattern) — the key rows themselves stay distributed. */
  def buildLong(keys: DataFrame, keyCol: String, expectedKeys: Long,
                fpp: Double = 0.01): Filter = {
    val (numBits, numHashes) = sizing(expectedKeys, fpp)
    val spark = keys.sparkSession
    import spark.implicits._
    val agg = new Agg(numBits, numHashes)
    // null keys can never equi-join match — drop them rather than
    // letting the non-nullable Long decode fail the build
    val words = keys.select(keyCol).na.drop(Seq(keyCol))
      .as[Long].select(agg.toColumn.name("bf")).head()
    Filter(words, numHashes)
  }

  /** Membership test column — codegen'd, evaluates in the scan stage. */
  def mightContain(key: Column, filter: Filter): Column =
    Bridge.column(MightContainLong(Bridge.expression(key), filter))
}

/** `filter.contains(key)` as a codegen'd Catalyst expression — the
  * built sketch rides along as a reference object (a broadcast-sized
  * constant), so the probe inlines into whole-stage codegen next to
  * the parquet scan instead of boxing through a UDF. */
case class MightContainLong(child: Expression, filter: BloomFilter.Filter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key, got ${child.dataType.catalogString}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(key: Any): Any = filter.contains(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter.Filter].getName)
    defineCodeGen(ctx, ev, key => s"$f.contains($key)")
  }

  override protected def withNewChildInternal(newChild: Expression): MightContainLong =
    copy(child = newChild)
}
