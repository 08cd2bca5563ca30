package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.DotProductInt.dotInt

/** Integer-exact Lloyd k-means over quantized embedding vectors — the
  * corpus-clustering step a training-data pipeline runs before mixture
  * balancing (cluster → reweight/cap per cluster) and the batch twin of
  * the float k-means the IVF coarse quantizer fits on a sample
  * ([[Ann]]). Everything here is exact 64-bit integer arithmetic on
  * NON-NEGATIVE quantized components, so truncating and flooring
  * division agree and a DuckDB oracle can unroll the same iterations
  * bit-for-bit (the d14/d18/d25 regime) — float k-means is not
  * oracle-checkable, THIS is.
  *
  * Determinism: seeds are the k lowest-id vectors; assignment argmin
  * tie-breaks on centroid id via one min(struct(dist, cid)) aggregate;
  * centroid components are floor(sum/n) on non-negative sums; empty
  * clusters drop out identically on both engines. Fixed iteration
  * budget, per-round localCheckpoint to hold the plan constant.
  *
  * Scale shape: per iteration one broadcast of k centroids against the
  * vector table (n·k distance rows, map-side-combinable argmin — the
  * standard distributed Lloyd step; NEVER an n×n pair join), one
  * id-keyed join-back, and one 64× posexplode for the component sums.
  * All linear in n for fixed (k, dim); distances go through the
  * codegen'd [[graft.functions.DotProductInt]] (‖q−c‖² = ‖q‖² + ‖c‖²
  * − 2·q·c), so the hot loop carries no interpreted lambdas.
  *
  * Overflow bounds (dim 64, components ≤ 2²¹ from the e6 quantization
  * of unit-ish floats): ‖v‖² ≤ 64·2⁴² ≈ 2⁴⁸; component sums ≤ 2²¹·n —
  * safe through n ≈ 2⁴² vectors. */
object KMeansExact {

  /** Final centroids after `iterations` Lloyd updates:
    * (cid, cv array<int>, nc = ‖cv‖²). The separate entry point exists
    * for serving paths — [[assignRowLocal]] scores a STREAM of vectors
    * against a fitted centroid set with zero stream state. */
  def fit(vecs: DataFrame, idCol: String, vecCol: String,
          k: Int, iterations: Int): DataFrame = {
    require(k >= 1 && k <= 4096, s"k in [1,4096], got $k")
    require(iterations >= 0 && iterations <= 64,
      s"iterations in [0,64], got $iterations")
    val q = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nq", dotInt(col("v"), col("v")))
      .localCheckpoint(eager = false)

    // seed: the k lowest-id vectors, cid = seed rank. The global
    // window runs over k pre-limited rows, not the table.
    def withNorm(c: DataFrame): DataFrame =
      c.withColumn("nc", dotInt(col("cv"), col("cv")))
    var cents = withNorm(
      q.orderBy("id").limit(k)
        .select(col("id"), col("v"))
        .withColumn("cid", row_number().over(Window.orderBy("id")).cast("long") - 1L)
        .select(col("cid"), col("v").as("cv")))
      .localCheckpoint(eager = false)

    def assignTo(c: DataFrame): DataFrame =
      q.crossJoin(broadcast(c))
        .withColumn("dist",
          col("nq") + col("nc") - lit(2L) * dotInt(col("v"), col("cv")))
        .groupBy("id")
        .agg(min(struct(col("dist"), col("cid"))).as("m"))
        .select(col("id"), col("m.cid").as("cluster"))

    for (_ <- 1 to iterations) {
      val sums = assignTo(cents)
        .join(q, Seq("id"))
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos")
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        // non-negative components ⇒ `div` (truncate) == floor — the
        // cross-engine convention every integer oracle here relies on
        .withColumn("comp", expr("CAST(s div n AS INT)"))
      cents = withNorm(
        sums.groupBy(col("cluster").as("cid"))
          .agg(expr(
            "transform(array_sort(collect_list(struct(pos, comp))), p -> p.comp)")
            .as("cv")))
        .localCheckpoint(eager = false)
    }
    cents
  }

  /** @param vecs   (idCol, vecCol: array<int> NON-NEGATIVE components)
    * @return (id, cluster) — final assignment after `iterations`
    *         centroid updates, one row per input vector */
  def assign(vecs: DataFrame, idCol: String, vecCol: String,
             k: Int, iterations: Int): DataFrame = {
    val cents = fit(vecs, idCol, vecCol, k, iterations)
    val q = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nq", dotInt(col("v"), col("v")))
    q.crossJoin(broadcast(cents))
      .withColumn("dist",
        col("nq") + col("nc") - lit(2L) * dotInt(col("v"), col("cv")))
      .groupBy("id")
      .agg(min(struct(col("dist"), col("cid"))).as("m"))
      .select(col("id"), col("m.cid").as("cluster"))
  }

  /** Row-local assignment against a FITTED (driver-collected) centroid
    * set — `least()` over k (dist, cid) structs, each dist through the
    * codegen'd integer dot product. Stateless and aggregation-free, so
    * it attaches to a `readStream` frame unchanged (the serving path:
    * score arriving embeddings against last night's centroids). k is
    * small by construction (a coarse quantizer), so the unrolled
    * expression stays far from the codegen-size cliff the LSH kernels
    * hit. Exact same argmin + cid tie-break as [[assign]]. */
  def assignRowLocal(vecs: DataFrame, idCol: String, vecCol: String,
                     centroids: Seq[(Long, Seq[Int])]): DataFrame = {
    require(centroids.nonEmpty && centroids.size <= 256,
      s"row-local scoring wants a small centroid set, got ${centroids.size}")
    import org.apache.spark.sql.functions.typedlit
    val v = col(vecCol)
    val nq = dotInt(v, v)
    val arms = centroids.map { case (cid, cv) =>
      val nc = cv.map(x => x.toLong * x.toLong).sum
      struct((nq + lit(nc) - lit(2L) * dotInt(v, typedlit(cv))).as("dist"),
        lit(cid).as("cid"))
    }
    val m = if (arms.size == 1) arms.head else least(arms: _*)
    vecs.select(col(idCol).as("id"), m.getField("cid").as("cluster"))
  }
}
