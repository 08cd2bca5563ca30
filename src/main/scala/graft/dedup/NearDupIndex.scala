package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent near-dup admission index (#186) — the corpus side of the
  * streaming near-dup ingest gate ([[graft.streaming.EventStream
  * .nearDupGateForeachBatch]]) as a durable, APPENDABLE artifact, the
  * [[graft.sim.AnnIndex]] lifecycle applied to MinHash/LSH state:
  *
  *  - `build` computes each corpus doc's minhash signature ONCE,
  *    persists the signature table, and derives + persists the band
  *    table FROM THE STORED SIGNATURES (never a second shingle pass).
  *    A `meta` row pins (k, nBands, seed) — the parameters are part
  *    of the index identity (bands built at different parameters don't
  *    collide correctly), so `append` and `gate` read them from the
  *    index rather than trusting caller arguments: a parameter
  *    mismatch is unrepresentable, not merely checked.
  *  - `append` folds an admitted ingest batch in at O(batch) cost
  *    (signature + band rows for the new docs only, parquet append —
  *    the same no-torn-reads story as AnnIndex.append).
  *  - `gate` wires the stored tables straight into the foreachBatch
  *    near-dup gate, so a nightly ingest job is: gate today's stream
  *    against the index, then append what was admitted.
  *
  * At 100 TB the band table is the big artifact (nBands rows/doc of
  * three longs); it is written partitioned by `band`, so the gate's
  * (band, bh) join prunes each probe task to 1/nBands of the files.
  */
object NearDupIndex {

  def build(corpus: DataFrame, dir: String, k: Int = 64, nBands: Int = 16,
            seed: Long = 0x5eedL): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    writeSigs(corpus, dir, k, nBands, seed)
    Seq((k, nBands, seed)).toDF("k", "n_bands", "seed")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Append an (admitted) batch without rebuilding: same parameters,
    * O(batch) new rows. */
  def append(newDocs: DataFrame, dir: String): Unit = {
    val spark = newDocs.sparkSession
    val (k, nBands, seed) = readMeta(spark, dir)
    writeSigs(newDocs, dir, k, nBands, seed, append = true)
  }

  /** (bands, sigs) as the gate expects them. */
  def load(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$dir/bands").select("band", "bh", "cid"),
      spark.read.parquet(s"$dir/sigs"))

  /** The streaming ingest gate served from the persisted index. */
  def gate(spark: SparkSession, dir: String)(
      onAdmitted: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    val (k, nBands, seed) = readMeta(spark, dir)
    val (bands, sigs) = load(spark, dir)
    graft.streaming.EventStream.nearDupGateForeachBatch(
      bands, sigs, k, nBands, seed)(onAdmitted)
  }

  /** Maintenance: merge the small per-append segment files inside each
    * band partition (and the flat sigs dir) — the same small-file tax
    * and the same crash-recoverable swap as
    * [[graft.sim.AnnIndex.compact]]. */
  def compact(spark: SparkSession, dir: String,
              minFileBytes: Long = 8L * 1024 * 1024,
              targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val a = graft.sources.Writers.compactSmallFiles(
      spark, s"$dir/bands", minFileBytes, targetFileBytes)
    val b = graft.sources.Writers.compactSmallFiles(
      spark, s"$dir/sigs", minFileBytes, targetFileBytes)
    (a._1 + b._1, a._2 + b._2)
  }

  private def writeSigs(docs: DataFrame, dir: String, k: Int, nBands: Int,
                        seed: Long, append: Boolean = false): Unit = {
    val spark = docs.sparkSession
    val mode = if (append) "append" else "overwrite"
    docs
      .withColumn("text_norm", graft.etl.TextNorm.normalizeText(col("text")))
      .select(col("doc_id").as("cid"), MinHash.signature(
        array_distinct(MinHash.shingleHashes(col("text_norm"), 3)), k, seed)
        .as("csig"))
      .write.mode(mode).parquet(s"$dir/sigs")
    // bands derive from the STORED signatures — one shingle pass total
    val sigSrc =
      if (append)
        spark.read.parquet(s"$dir/sigs")
          .join(docs.select(col("doc_id").as("cid")), Seq("cid"), "left_semi")
      else spark.read.parquet(s"$dir/sigs")
    sigSrc
      .select(col("cid"),
        posexplode(MinHash.bandHashes(col("csig"), nBands, k))
          .as(Seq("band", "bh")))
      .select("band", "bh", "cid")
      .write.mode(mode).partitionBy("band").parquet(s"$dir/bands")
  }

  private def readMeta(spark: SparkSession, dir: String): (Int, Int, Long) = {
    val m = spark.read.parquet(s"$dir/meta").select("k", "n_bands", "seed").head()
    (m.getInt(0), m.getInt(1), m.getLong(2))
  }
}
