package graft

import org.scalatest.funsuite.AnyFunSuite

/** s12's integer-exact k-means against a sequential Scala Lloyd
  * reference over the same quantized vectors — same seeds, same
  * argmin tie-break, same floor-div centroid means — plus the plan
  * shape (broadcast centroids, no pair join). */
class KMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def quantized(): Seq[(Long, Array[Long])] = {
    import spark.implicits._
    Tables.embeddings(spark, TestSpark.Sf)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
      .map { case (id, v) =>
        (id, v.map(x => math.round((x + 1.0) * 1000000.0)).toArray)
      }
  }

  private def referenceAssign(vs: Seq[(Long, Array[Long])],
                              k: Int, iterations: Int): Map[Long, Long] = {
    val dim = vs.head._2.length
    def dist(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var cents: Seq[(Long, Array[Long])] =
      vs.take(k).zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }
    def assign(): Map[Long, Long] =
      vs.map { case (id, v) =>
        id -> cents.map { case (cid, cv) => (dist(v, cv), cid) }.min._2
      }.toMap
    for (_ <- 1 to iterations) {
      val byC = assign().toSeq.groupBy(_._2)
      cents = byC.toSeq.sortBy(_._1).map { case (cid, members) =>
        val vecs = members.map(m => vs.find(_._1 == m._1).get._2)
        val n = vecs.size.toLong
        (cid, Array.tabulate(dim)(i =>
          java.lang.Math.floorDiv(vecs.map(_(i)).sum, n)))
      }
    }
    assign()
  }

  test("s12 k-means matches a sequential Lloyd reference exactly") {
    import spark.implicits._
    val got = LlmQueries.s12Kmeans(spark, TestSpark.Sf)
      .as[(Long, Long)].collect().toMap
    val vs = quantized()
    val want = referenceAssign(vs, k = 8, iterations = 2)
    assert(got.size == vs.size, "one assignment per vector")
    assert(got == want,
      s"diverging ids: ${(got.toSet diff want.toSet).take(5)}")
    assert(got.values.toSet.subsetOf((0L until 8L).toSet))
    assert(got.values.toSet.size > 1, "degenerate single cluster")
  }

  test("s12 plan: centroids broadcast, no pair join, one vector scan") {
    val p = LlmQueries.s12Kmeans(spark, TestSpark.Sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"centroid side must broadcast:\n${p.take(800)}")
    // the only acceptable nested-loop is the k-row broadcast of
    // centroids — an unbroadcast cartesian is the n² vector-vector
    // shape the kernel exists to avoid
    assert(!p.contains("CartesianProduct"), s"vector-vector cartesian:\n${p.take(800)}")
  }
}
