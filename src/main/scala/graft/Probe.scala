package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main for plan experiments (not part of the library API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val cust = Tables.customer(spark, dir)
    val nat = broadcast(Tables.nation(spark, dir))
    val reg = broadcast(Tables.region(spark, dir))
    val joined = cust
      .join(nat, cust("c_nationkey") === nat("n_nationkey"))
      .join(reg, nat("n_regionkey") === reg("r_regionkey"))
      .select(
        col("r_name").as("rname", org.apache.spark.sql.types.Metadata.empty),
        col("n_name").as("nname", org.apache.spark.sql.types.Metadata.empty),
        col("c_acctbal"))
    println("joined ok: " + joined.count())
    val rolled = joined.rollup("rname", "nname")
      .agg(count(lit(1)).as("n_cust"))
    println("rolled ok: " + rolled.count())
    rolled.show(5)
    spark.stop()
  }
}
