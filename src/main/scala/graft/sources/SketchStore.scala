package graft.sources

import org.apache.spark.sql.SparkSession

import graft.functions.BloomFilter

/** Persisted mergeable sketch artifacts — the incremental-analytics
  * counterpart of [[graft.sim.AnnIndex]]: each ingest batch builds its
  * own sketch ONCE, the artifact (kilobytes) is stored next to the
  * data, and any later consumer merges the sketches it needs instead
  * of re-scanning the batches. Bloom insert only ever SETS bits, so
  * the OR-merge of per-batch filters is BIT-IDENTICAL to a filter
  * built over the union in one pass (spec-pinned) — merge order,
  * grouping, and re-merging are all free. That property is what makes
  * "seen-key" state maintainable across days at 100 TB: day N's probe
  * filter = OR of N daily kilobyte artifacts, no history re-scan.
  *
  * The artifact is one parquet row (words array + numHashes); array
  * columns are fine here — this is an internal artifact, not an
  * oracle-compared query output (ORACLE.md rule 7 applies to query
  * outputs only). */
object SketchStore {

  def saveBloom(spark: SparkSession, filter: BloomFilter.Filter,
                dir: String): Unit = {
    import spark.implicits._
    Seq((filter.words.toSeq, filter.numHashes))
      .toDF("words", "num_hashes")
      .repartition(1)
      .write.mode("overwrite").parquet(dir)
  }

  def loadBloom(spark: SparkSession, dir: String): BloomFilter.Filter = {
    import spark.implicits._
    val (words, nh) = spark.read.parquet(dir)
      .select("words", "num_hashes").as[(Seq[Long], Int)].head()
    BloomFilter.Filter(words.toArray, nh)
  }

  /** OR-merge; requires identically-sized filters (same sizing params
    * — a mismatched pair was built for a different keyspace budget and
    * their bit positions don't line up). */
  def mergeBloom(a: BloomFilter.Filter, b: BloomFilter.Filter): BloomFilter.Filter = {
    require(a.words.length == b.words.length && a.numHashes == b.numHashes,
      s"incompatible sketches: ${a.words.length}x${a.numHashes} vs ${b.words.length}x${b.numHashes}")
    val out = new Array[Long](a.words.length)
    var i = 0
    while (i < out.length) { out(i) = a.words(i) | b.words(i); i += 1 }
    BloomFilter.Filter(out, a.numHashes)
  }
}
