package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomFilter

class BloomFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("no false negatives: every inserted key passes the probe") {
    val keys = spark.range(0, 2000).toDF("k")
    val bf = BloomFilter.buildLong(keys, "k", expectedKeys = 2000)
    val misses = keys.filter(!BloomFilter.mightContain(col("k"), bf)).count()
    assert(misses == 0)
  }

  test("false-positive rate stays near the configured fpp") {
    val keys = spark.range(0, 10000).toDF("k")
    val bf = BloomFilter.buildLong(keys, "k", expectedKeys = 10000, fpp = 0.01)
    // disjoint probe domain: any hit is a false positive
    val probes = spark.range(1000000, 1100000).toDF("k")
    val fp = probes.filter(BloomFilter.mightContain(col("k"), bf)).count()
    val rate = fp.toDouble / 100000
    // pow2 rounding can land m anywhere in [optimal, 2*optimal), so the
    // realized rate is bounded by the CONFIGURED fpp, not far under it
    assert(rate <= 0.02, s"false-positive rate $rate")
  }

  test("q45 equals the plain join (bloom pre-filter is transparent)") {
    val bloom = ScaleQueries.q45BloomPrejoin(spark, TestSpark.Sf)
      .as[(Long, Long, Long)].collect().toSeq
    val dims = Tables.orders(spark, TestSpark.Sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("okey"), col("o_orderdate"))
    val plain = Tables.lineitem(spark, TestSpark.Sf)
      .select(col("l_orderkey").as("okey"), col("l_extendedprice"))
      .join(dims, "okey")
      .groupBy(year(col("o_orderdate")).cast("long").as("oyear"))
      .agg(count(lit(1)).as("n_lines"), Exact.eSum(col("l_extendedprice"), 2).as("revenue_e2"))
      .orderBy("oyear")
      .as[(Long, Long, Long)].collect().toSeq
    assert(bloom == plain)
  }

  test("pre-filter passes all matching facts and prunes most others") {
    val sf = TestSpark.Sf
    val dims = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("okey"))
    val bf = BloomFilter.buildLong(dims, "okey", expectedKeys = math.max(1L, dims.count()))
    val facts = Tables.lineitem(spark, sf).select(col("l_orderkey").as("okey"))
    val total = facts.count()
    val kept = facts.filter(BloomFilter.mightContain(col("okey"), bf)).count()
    val matched = facts.join(dims, "okey").count()
    // sound (no true match dropped) and effective (≈ selectivity + fpp)
    assert(kept >= matched)
    assert(kept <= (total * 0.35).toLong, s"kept $kept of $total")
  }
}
