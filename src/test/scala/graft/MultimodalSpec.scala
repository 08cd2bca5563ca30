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
}
