package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrainingDataSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("t08 hash split is deterministic, in-range, and roughly 80/10/10") {
    val r1 = TrainingDataQueries.t08HashSplit(spark, TestSpark.Sf)
      .as[(Long, Long, String)].collect()
    val r2 = TrainingDataQueries.t08HashSplit(spark, TestSpark.Sf)
      .as[(Long, Long, String)].collect()
    assert(r1.toSeq == r2.toSeq) // content-hash split: rerun can't reshuffle docs
    assert(r1.forall { case (_, b, _) => b >= 0 && b < 10 })
    val bySplit = r1.groupBy(_._3).view.mapValues(_.length).toMap
    val n = r1.length.toDouble
    // md5 is uniform: train ~80%, valid/test ~10% each (±10 pts at n=500)
    assert(bySplit("train") / n > 0.70 && bySplit("train") / n < 0.90, bySplit)
    assert(bySplit("valid") > 0 && bySplit("test") > 0, bySplit)
  }

  test("t08 split is a pure projection (no exchange before the sort)") {
    val plan = TrainingDataQueries.t08HashSplit(spark, TestSpark.Sf)
      .queryExecution.executedPlan.toString
    // only the final presentation orderBy may shuffle; no join/agg exchange
    assert(!plan.contains("HashAggregate") && !plan.contains("Join"), plan.take(800))
  }

  test("d08 chunks tile each document with len-32 stride-24 windows") {
    val docs = Tables.documents(spark, TestSpark.Sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    val chunks = TrainingDataQueries.d08Chunk(spark, TestSpark.Sf)
      .select(col("doc_id"), col("chunk_id"), col("n_tok"))
      .as[(Long, Long, Long)].collect()
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet == docs.keySet)
    for ((id, cs) <- byDoc) {
      val n = docs(id)
      val expect = 1L + math.max(0L, math.ceil((n - 32).toDouble / 24).toLong)
      assert(cs.length == expect, s"doc $id: ${cs.length} chunks for $n tokens")
      val sorted = cs.sortBy(_._2)
      // all but the last chunk are full; the last covers the tail exactly
      sorted.init.foreach { case (_, _, t) => assert(t == 32) }
      val (_, lastId, lastTok) = sorted.last
      assert(lastTok == n - lastId * 24, s"doc $id: tail $lastTok of $n tokens")
    }
  }

  test("d08 chunk text round-trips: concatenating stride prefixes rebuilds the doc") {
    val doc = Tables.documents(spark, TestSpark.Sf)
      .filter(col("doc_id") === 1).select("text").as[String].head()
    val chunks = TrainingDataQueries.d08Chunk(spark, TestSpark.Sf)
      .filter(col("doc_id") === 1).orderBy("chunk_id")
      .select("chunk").as[String].collect()
    val toks = doc.split(" ", -1)
    // stride-prefix of every chunk + full tail of the last = original
    val rebuilt = chunks.init.map(_.split(" ", -1).take(24)).flatten ++
      chunks.last.split(" ", -1)
    assert(rebuilt.toSeq == toks.toSeq)
  }

  test("t09 keeps at most 3 salient terms per doc, rank-contiguous") {
    val r = TrainingDataQueries.t09SalientTerms(spark, TestSpark.Sf)
      .select(col("doc_id"), col("rnk"), col("tf"))
      .as[(Long, Long, Long)].collect()
    val byDoc = r.groupBy(_._1)
    assert(byDoc.values.forall(_.length <= 3))
    byDoc.values.foreach { rows =>
      val rnks = rows.map(_._2).sorted.toSeq
      assert(rnks == (1L to rnks.length).toSeq)
      // tf is non-increasing along the ranking
      val byRnk = rows.sortBy(_._2).map(_._3).toSeq
      assert(byRnk.zip(byRnk.tail).forall { case (a, b) => a >= b })
    }
  }

  test("t09 plan pushes the per-doc top-k below the shuffle (WindowGroupLimit)") {
    val plan = TrainingDataQueries.t09SalientTerms(spark, TestSpark.Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }

  test("d09 contamination pairs cross the split and share real 5-grams") {
    val split = TrainingDataQueries.t08HashSplit(spark, TestSpark.Sf)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val pairs = TrainingDataQueries.d09Contamination(spark, TestSpark.Sf)
      .as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty) // the synthetic corpus embeds near-duplicates
    pairs.foreach { case (te, tr, n) =>
      assert(split(te) == "test" && split(tr) == "train", s"($te,$tr)")
      assert(n >= 1)
    }
  }

  test("d09 joins on gram fingerprints, never doc x doc") {
    val plan = TrainingDataQueries.d09Contamination(spark, TestSpark.Sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      plan.take(800))
  }
}
