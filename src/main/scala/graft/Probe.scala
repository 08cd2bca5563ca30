package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main for plan experiments (not part of the library API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    val docs = Tables.documents(spark, dir)
    println("docs: " + docs.count())

    import graft.dedup.{MinHash, SimHash}
    import graft.etl.TextNorm
    def sigs = docs
      .withColumn("text_norm", TextNorm.normalizeText(col("text")))
      .withColumn("sh", MinHash.shingleHashes(col("text_norm"), 3))
      .select(col("doc_id"), SimHash.simhash(col("sh")).as("ssig"))
    var t0 = System.nanoTime()
    println("d03 nocache rows: " + SimHash.nearDupPairs(sigs, "doc_id", "ssig", 4, 3).count())
    println("d03 nocache sec: " + (System.nanoTime() - t0) / 1e9)
    t0 = System.nanoTime()
    println("d03 barrier rows: " + SimHash.nearDupPairs(sigs.repartition(32), "doc_id", "ssig", 4, 3).count())
    println("d03 barrier sec: " + (System.nanoTime() - t0) / 1e9)
    spark.stop()
  }
}
