package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing (SURVEY.md §2 #32).
  *
  * Media payloads (image/audio/video) travel as opaque `binary`
  * columns with a typed metadata struct beside them. The Spark-side
  * plumbing — schema, partition-preserving batch decode, deterministic
  * metadata — is real; the default codec is STUBBED (this container has
  * no image/audio libraries): [[StubDecoder]] derives metadata
  * deterministically from payload bytes so tests are reproducible. A
  * production deployment swaps in a real [[MediaDecoder]]; nothing
  * else changes — and [[Codecs.PgmBmpDecoder]] /
  * [[Codecs.GrayGridExtractor]] are exactly that swap for the two
  * dependency-free public formats (netpbm PGM, uncompressed BMP),
  * decoding real pixels through the same hooks (MultimodalSpec).
  */
object Binary {

  case class MediaMeta(width: Int, height: Int, channels: Int, nBytes: Long)

  /** Decode contract: payload bytes → metadata (+ features later).
    * Implementations must be serializable (shipped to executors). */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte]): MediaMeta
  }

  /** Deterministic fake decode — STUB for the real codec. Long
    * arithmetic throughout: `(n * 3)` in Int wraps negative past
    * ~715 MB payloads and would diverge from [[stubMetaColumns]]'
    * long-typed math. */
  object StubDecoder extends MediaDecoder {
    override def decode(payload: Array[Byte]): MediaMeta = {
      val n = payload.length.toLong
      MediaMeta(width = (n % 640).toInt, height = ((n * 3) % 480).toInt,
        channels = 3, nBytes = n)
    }
  }

  /** Text column → binary payload (the stand-in for reading real
    * media bytes; at scale this is the parquet `binary` column). */
  def payloadOf(text: Column): Column = encode(text, "UTF-8")

  /** Expression-level stub metadata — same math as [[StubDecoder]],
    * but fully codegen'd (used by the oracle-checked m01 query). */
  def stubMetaColumns(payload: Column): Seq[Column] = {
    val n = length(payload).cast("long")
    Seq(
      n.as("n_bytes"),
      (n % 640).as("width"),
      ((n * 3) % 480).as("height"),
      lit(3L).as("channels"))
  }

  /** Partition-preserving batch decode: the `mapPartitions` hook where
    * a real decoder does vectorized work per batch (the Scala analog
    * of `mapInPandas`). No shuffle; binary stays columnar until here. */
  def decodePartitions[T](ds: Dataset[(Long, Array[Byte])], decoder: MediaDecoder)(
      implicit enc: Encoder[(Long, MediaMeta)]): Dataset[(Long, MediaMeta)] =
    ds.mapPartitions(_.map { case (id, payload) => (id, decoder.decode(payload)) })

  /** Feature-extraction contract: payload → fixed-width embedding
    * (the step that feeds the s01–s07 ANN family). */
  trait FeatureExtractor extends Serializable {
    def dim: Int
    def features(payload: Array[Byte]): Array[Float]
  }

  /** Deterministic stub features: fmix64-style mixing of (byte-sum,
    * lane) → [0,1) floats. Reproducible across runs/partitionings;
    * a production extractor (CLIP, wav2vec, …) swaps in unchanged. */
  class StubFeatureExtractor(val dim: Int = 8) extends FeatureExtractor {
    override def features(payload: Array[Byte]): Array[Float] = {
      import graft.functions.BloomFilter.fmix64 // the library's one mixer
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += payload(i) & 0xffL; i += 1 }
      Array.tabulate(dim) { lane =>
        ((fmix64(sum * 31L + lane) >>> 11).toDouble / (1L << 53).toDouble).toFloat
      }
    }
  }

  /** Partition-preserving batch feature extraction — same
    * `mapPartitions` shape as [[decodePartitions]]; the output column
    * is `array<float>`, exactly the embeddings-table schema the ANN
    * operators consume. */
  def extractFeaturesPartitions(ds: Dataset[(Long, Array[Byte])],
                                extractor: FeatureExtractor)(
      implicit enc: Encoder[(Long, Array[Float])]): Dataset[(Long, Array[Float])] =
    ds.mapPartitions(_.map { case (id, p) => (id, extractor.features(p)) })

  /** Resize: target dims clamp the metadata and bound the payload
    * budget (`w·h·channels` bytes). The stub truncates bytes — a real
    * codec re-encodes — but the column shapes and the budget
    * arithmetic are the production ones. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int, channels: Int = 3): Array[Byte] = {
    val budget = w.toLong * h * channels
    if (payload.length <= budget) payload
    else java.util.Arrays.copyOf(payload, budget.toInt)
  }

  /** Frame sampling contract: one payload (video) → k frame payloads. */
  trait FrameSampler extends Serializable {
    def sample(payload: Array[Byte]): Seq[Array[Byte]]
  }

  /** Codegen'd frame count of the stub sampler: k = 1 + n%4. */
  def frameCount(payload: Column): Column =
    lit(1L) + length(payload).cast("long") % 4

  /** Deterministic stub frames: k = 1 + n%4 contiguous byte windows of
    * n/k bytes, the last absorbing the remainder — the SAME lengths
    * the column-level math in the oracle-checked m02 query computes
    * ([[frameCount]] + integer division), so the Dataset plumbing and
    * the driver-gated query stay provably in sync (MultimodalSpec
    * asserts the parity). */
  object StubFrameSampler extends FrameSampler {
    override def sample(payload: Array[Byte]): Seq[Array[Byte]] = {
      val n = payload.length
      val k = 1 + (n % 4)
      val step = n / k
      (0 until k).map { i =>
        java.util.Arrays.copyOfRange(payload, i * step, if (i == k - 1) n else (i + 1) * step)
      }
    }
  }

  /** One row per sampled frame via `flatMap` — partition-preserving
    * explode, no shuffle; frames land beside their doc id. */
  def sampleFramesPartitions(ds: Dataset[(Long, Array[Byte])], sampler: FrameSampler)(
      implicit enc: Encoder[(Long, Int, Array[Byte])]): Dataset[(Long, Int, Array[Byte])] =
    ds.flatMap { case (id, p) =>
      sampler.sample(p).zipWithIndex.map { case (f, i) => (id, i + 1, f) }
    }
}
