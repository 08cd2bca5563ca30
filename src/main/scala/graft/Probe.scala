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
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (name <- Seq("q41_scd2", "q40_upsert")) {
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      val nEx = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      println(s"[probe] $name hash exchanges: $nEx")
      plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Window"))
        .foreach(l => println("   " + l.trim.take(120)))
    }
    spark.stop()
  }
}
