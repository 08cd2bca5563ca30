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
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    time("docs scan") { docs.count() }
    time("docs scan again") { docs.count() }
    time("normalize only") {
      docs.withColumn("t", graft.etl.TextNorm.normalizeText(col("text")))
        .select(sum(length(col("t")))).queryExecution.toRdd.count()
    }
    time("shingle k=3") {
      docs.withColumn("t", graft.etl.TextNorm.normalizeText(col("text")))
        .withColumn("sh", graft.dedup.MinHash.shingleHashes(col("t"), 3))
        .select(sum(size(col("sh")))).queryExecution.toRdd.count()
    }
    time("shingle+distinct") {
      docs.withColumn("t", graft.etl.TextNorm.normalizeText(col("text")))
        .withColumn("sh", array_distinct(graft.dedup.MinHash.shingleHashes(col("t"), 3)))
        .select(sum(size(col("sh")))).queryExecution.toRdd.count()
    }
    time("minhash sig k=64") {
      docs.withColumn("t", graft.etl.TextNorm.normalizeText(col("text")))
        .withColumn("sh", graft.dedup.MinHash.shingleHashes(col("t"), 3))
        .withColumn("sig", graft.dedup.MinHash.signature(col("sh"), 64, 0x5eedL))
        .select(sum(size(col("sig")))).queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
