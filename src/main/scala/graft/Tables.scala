package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All readers go through the parquet DataSource V2 so Catalyst pushes
  * filters and prunes columns into the scan — the 100 TB path is the
  * same code, just a different directory.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has drifted across testdata generations, so normalize
    * every encoding to session-local TimestampType (micros):
    *   - parquet TIMESTAMP(NANOS) + `spark.sql.legacy.parquet.nanosAsLong
    *     =true` → a long of epoch-nanos; convert with FLOOR integer
    *     division (no double round-trip: epoch-nanos exceed 2^53, and
    *     `DIV` alone truncates toward zero, which would round pre-1970
    *     sub-microsecond values the wrong way).
    *   - parquet timestamp[us] with isAdjustedToUTC=false → Spark reads
    *     TIMESTAMP_NTZ, which `unix_micros`/interval arithmetic reject at
    *     analysis; cast to TimestampType. Every entrypoint pins
    *     `spark.sql.session.timeZone=UTC`, so the cast is exact (the
    *     wall-clock value is reinterpreted as UTC instant, the same
    *     convention the nanos-as-long arm and the DuckDB oracle use).
    *   - TIMESTAMP_LTZ (timestamp[us] adjusted to UTC) → already
    *     TimestampType, pass through.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(
          expr("ts DIV 1000 - CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END")))
      case _: TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
