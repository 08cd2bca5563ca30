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
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("q07_dedup_top_per_key", "q17_etl_pipeline", "q19_asof_join", "d02_minhash_lsh")) {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val nExchanges = plan.linesIterator.count(_.contains("Exchange "))
      val wgl = plan.contains("WindowGroupLimit")
      val bc = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
      println(s"=== $name: exchanges=$nExchanges windowGroupLimit=$wgl broadcastJoins=$bc")
      plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Window"))
        .foreach(l => println("   " + l.trim.take(150)))
    }
    spark.stop()
  }
}
