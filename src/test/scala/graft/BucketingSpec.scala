package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed tables join without an exchange") {
    val orders = Tables.orders(spark, TestSpark.Sf)
    val customer = Tables.customer(spark, TestSpark.Sf)
    Bucketing.writeBucketed(orders, "graft_orders_b", "o_custkey", 8)
    Bucketing.writeBucketed(
      customer.withColumnRenamed("c_custkey", "o_custkey"), "graft_customer_b", "o_custkey", 8)

    val joined = Bucketing.table(spark, "graft_orders_b")
      .join(Bucketing.table(spark, "graft_customer_b"), "o_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)

    // result parity with the plain join
    val expected = orders.join(
      customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey").count()
    assert(joined.count() == expected)

    spark.sql("DROP TABLE IF EXISTS graft_orders_b")
    spark.sql("DROP TABLE IF EXISTS graft_customer_b")
  }

  test("streaming stateful running counts accumulate across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val input = MemoryStream[(Long, Double)]
    val events = input.toDF().toDF("user_id", "value")
    val query = graft.streaming.EventStream.runningUserAgg(events)
      .writeStream.format("memory").queryName("running_agg")
      .outputMode("update").start()
    try {
      input.addData((1L, 10.0), (1L, 5.0), (2L, 1.0))
      query.processAllAvailable()
      input.addData((1L, 2.0))
      query.processAllAvailable()
      val rows = spark.table("running_agg")
        .groupBy("user_id").max("n_events", "total_value")
        .orderBy("user_id")
        .as[(Long, Long, Double)].collect().toSeq
      // user 1: 3 events totaling 17 across two batches (state carried)
      assert(rows == Seq((1L, 3L, 17.0), (2L, 1L, 1.0)))
    } finally query.stop()
  }

  test("state API v2 (transformWithState) carries the same running state as v1") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // the v2 operator requires the RocksDB state store provider; a
    // production session sets this once at startup
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, Double)]
      val events = input.toDF().toDF("user_id", "value")
      val query = graft.streaming.EventStream.runningUserAggV2(events)
        .writeStream.format("memory").queryName("running_agg_v2")
        .outputMode("append").start()
      try {
        input.addData((1L, 10.0), (1L, 5.0), (2L, 1.0))
        query.processAllAvailable()
        input.addData((1L, 2.0), (3L, 7.0))
        query.processAllAvailable()
        val rows = spark.table("running_agg_v2")
          .groupBy("user_id").max("n_events", "total_value")
          .orderBy("user_id")
          .as[(Long, Long, Double)].collect().toSeq
        // identical end state to the v1 twin's contract: per-user
        // ValueState accumulates across micro-batches
        assert(rows == Seq((1L, 3L, 17.0), (2L, 1L, 1.0), (3L, 1L, 7.0)))
      } finally query.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
