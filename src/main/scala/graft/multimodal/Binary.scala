package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing (SURVEY.md §2 #32).
  *
  * Media payloads (image/audio/video) travel as opaque `binary`
  * columns with a typed metadata struct beside them. The Spark-side
  * plumbing — schema, partition-preserving batch decode, deterministic
  * metadata — is real; the actual codec is STUBBED (this container has
  * no image/audio libraries): [[StubDecoder]] derives metadata
  * deterministically from payload bytes so tests are reproducible. A
  * production deployment swaps in a real [[MediaDecoder]]; nothing
  * else changes.
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
}
