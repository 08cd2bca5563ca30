package graft

import org.apache.spark.sql.SparkSession

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
    // driver-contract smoke: entry() must return rows on sf0.001
    val n = SparkEntry.entry(spark).count()
    println(s"[probe] entry rows: $n")
    require(n > 0, "entry must return rows")
    println(s"[probe] queries: ${SparkEntry.queries.size}, oracles: ${SparkEntry.oracleSql.size}")
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    require(missing.isEmpty, s"oracles without queries: $missing")
    spark.stop()
  }
}
