package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.PairBlocks

class PairBlocksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("triangle blocking yields each unordered pair exactly once") {
    val df = Seq.tabulate(100)(i => (i.toLong, s"g${i % 3}", i * 1.5))
      .toDF("id", "grp", "v")
    val pairs = PairBlocks.selfJoinPairs(df, "id", Seq("grp"), Seq("v"), nBlocks = 4)
      .select(least($"id1", $"id2"), greatest($"id1", $"id2"))
      .as[(Long, Long)].collect().toSeq

    // no duplicates in any order
    assert(pairs.size == pairs.toSet.size)
    // exactly the plain self-join pair set
    val expected = (for {
      i <- 0L until 100L; j <- (i + 1) until 100L if i % 3 == j % 3
    } yield (i, j)).toSet
    assert(pairs.toSet == expected)
  }

  test("payload columns arrive suffixed and usable") {
    val df = Seq((1L, "g", 2.0), (2L, "g", 3.0)).toDF("id", "grp", "v")
    val r = PairBlocks.selfJoinPairs(df, "id", Seq("grp"), Seq("v"), nBlocks = 2)
      .select($"v1" + $"v2").as[Double].collect()
    assert(r.toSeq == Seq(5.0))
  }

  test("approx_count_distinct stays within 5% of exact (HLL variant of q21)") {
    val ev = Tables.events(spark, TestSpark.Sf)
    val (approx, exact) = ev.agg(
      approx_count_distinct("user_id").cast("double"),
      countDistinct("user_id").cast("double")).as[(Double, Double)].head()
    assert(math.abs(approx - exact) / exact <= 0.05, s"approx=$approx exact=$exact")
  }
}
