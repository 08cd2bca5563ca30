package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Binary

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binary payload round-trips and metadata matches the stub decoder") {
    val docs = Tables.documents(spark, TestSpark.Sf).limit(50)
    val withPayload = docs.withColumn("payload", Binary.payloadOf(col("text")))

    // expression path (codegen'd, used by m01)
    val exprMeta = withPayload
      .select(col("doc_id") +: Binary.stubMetaColumns(col("payload")): _*)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

    // mapPartitions path (the real-decoder plumbing)
    val ds = withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
    val decoded = Binary.decodePartitions(ds, Binary.StubDecoder)
      .collect().sortBy(_._1)
      .map { case (id, m) => (id, m.nBytes, m.width.toLong, m.height.toLong, m.channels.toLong) }
      .toSeq

    assert(exprMeta == decoded)
    assert(exprMeta.forall { case (_, n, w, h, c) =>
      w == n % 640 && h == (n * 3) % 480 && c == 3L })
  }

  test("frame sampler (flatMap plumbing) and m02 column plan compute identical frames") {
    val ds = Tables.documents(spark, TestSpark.Sf).limit(100)
      .withColumn("payload", Binary.payloadOf(col("text")))
      .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
    val sampled = Binary.sampleFramesPartitions(ds, Binary.StubFrameSampler)
      .collect()
      .map { case (id, fid, frame) => (id, fid.toLong, frame.length.toLong) }
      .sortBy(t => (t._1, t._2)).toSeq
    val columnPlan = LlmQueries.m02FrameSample(spark, TestSpark.Sf)
      .filter(col("doc_id").isin(sampled.map(_._1).distinct: _*))
      .as[(Long, Long, Long)].collect().toSeq
    assert(sampled == columnPlan)
    // frames tile the payload exactly: per-doc lengths sum to n_bytes
    val bytesByDoc = ds.collect().map { case (id, p) => id -> p.length.toLong }.toMap
    sampled.groupBy(_._1).foreach { case (id, fs) =>
      assert(fs.map(_._3).sum == bytesByDoc(id), s"doc $id frame lengths don't tile")
    }
  }

  test("stub feature extraction yields deterministic fixed-width unit-range vectors") {
    val ds = Tables.documents(spark, TestSpark.Sf).limit(50)
      .withColumn("payload", Binary.payloadOf(col("text")))
      .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
    val ex = new Binary.StubFeatureExtractor(8)
    val a = Binary.extractFeaturesPartitions(ds, ex).collect().sortBy(_._1)
    val b = Binary.extractFeaturesPartitions(ds.repartition(7), ex).collect().sortBy(_._1)
    assert(a.map(_._1).toSeq == b.map(_._1).toSeq)
    assert(a.zip(b).forall { case ((_, x), (_, y)) => x.toSeq == y.toSeq })
    assert(a.forall { case (_, f) => f.length == 8 && f.forall(v => v >= 0f && v < 1f) })
  }

  test("resize stub honors the w*h*channels byte budget and is a no-op under it") {
    val big = Array.fill[Byte](100)(7)
    val resized = Binary.resizeStub(big, w = 4, h = 4, channels = 3) // budget 48
    assert(resized.length == 48 && resized.toSeq == big.take(48).toSeq)
    assert(Binary.resizeStub(big, 10, 10).toSeq == big.toSeq) // budget 300 >= 100
  }

  test("m03 perceptual near-dup finds the strongly-similar payloads (measured recall)") {
    import org.apache.spark.sql.functions._
    val got = LlmQueries.m03PerceptualNearDup(spark, TestSpark.Sf)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // strong ground truth: exact jaccard >= 0.9 pairs from the oracled d04
    val strong = LlmQueries.d04NgramJaccard(spark, TestSpark.Sf)
      .filter(col("inter") * 10 >= col("uni") * 9)
      .select("doc_id1", "doc_id2").as[(Long, Long)].collect().toSet
    assert(strong.nonEmpty)
    val hit = strong.count(got)
    println(s"[m03] recall ${hit}/${strong.size}")
    assert(hit * 10 >= strong.size * 9, s"recall ${hit}/${strong.size} below 0.9")
  }

  test("m03 signature survives a local edit (the perceptual property)") {
    import graft.functions.CdcChunks.cdcChunks
    import org.apache.spark.sql.functions._
    import graft.dedup.MinHash
    val texts = Tables.documents(spark, TestSpark.Sf)
      .orderBy("doc_id").limit(20).select("text").as[String].collect()
    val edited = texts.map(t =>
      t.substring(0, t.length / 2) + " spliced " + t.substring(t.length / 2))
    val all = (texts ++ edited).toSeq.toDF("text")
      .select(MinHash.signature(array_distinct(cdcChunks(col("text"), modulus = 4)),
        64, 0x5eedL).as("sig"))
      .as[Seq[Long]].collect()
    val (orig, ed) = all.splitAt(texts.length)
    val matches = orig.zip(ed).map { case (a, b) =>
      a.zip(b).count { case (x, y) => x == y } }
    println(s"[m03] edit sig matches/64: min ${matches.min}, avg ${matches.sum / matches.length}")
    // a ~1.6% splice leaves the chunk set ~97% identical, so the
    // estimated-jaccard signature agreement stays far above the 0.7
    // retrieval threshold (random pairs agree on ~0 of 64)
    assert(matches.min * 10 >= 64 * 8, s"min matches ${matches.min}")
  }
}
