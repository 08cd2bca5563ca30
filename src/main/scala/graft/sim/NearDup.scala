package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Library entry point for embedding near-duplicate detection: all
  * unordered pairs at cosine ≥ τ.
  *
  * The DEFAULT is the LSH scale path ([[Ann.lshNearDupPairsAuto]]):
  * corpus-derived bucket width and table count, candidate volume
  * O(n·occupancy·nTables), exact-cosine verification (precision 1.0,
  * recall ≥ the configured target). The all-pairs plan is behind an
  * explicit `exact = true` escape hatch because it is quadratic per
  * block — right for oracle fixtures and small corpora, wrong as a
  * default a caller can reach by accident at 10⁹ vectors.
  */
object NearDup {

  /** Near-dup pairs of `vecCol` (array<double>) at cosine ≥ `tau`.
    * Output: (id1, id2) with id1 < id2 — plus the `blockCols` when
    * `exact = true` (the exact path compares only within equal
    * `blockCols` groups; the LSH path is global and takes none). */
  def pairs(vecs: DataFrame, idCol: String, vecCol: String, tau: Double,
            dim: Int, seed: Long = 0xd07L, exact: Boolean = false,
            blockCols: Seq[String] = Nil, nBlocks: Int = 8,
            occupancy: Long = 32L, recall: Double = 0.95): DataFrame =
    if (exact) exactPairs(vecs, idCol, vecCol, tau, blockCols, nBlocks)
    else {
      require(blockCols.isEmpty,
        "blockCols only apply to the exact path (LSH candidates are global)")
      Ann.lshNearDupPairsAuto(vecs, idCol, vecCol, tau, dim, seed, occupancy, recall)
    }

  /** All-pairs within `blockCols` groups via the triangle-blocked
    * self-join ([[PairBlocks]] — hash blocks keep a low-cardinality
    * key from funnelling into few reducers). Quadratic in block
    * population: the oracle-checkable twin of the LSH path. */
  def exactPairs(vecs: DataFrame, idCol: String, vecCol: String, tau: Double,
                 blockCols: Seq[String], nBlocks: Int = 8): DataFrame = {
    // zero-norm guard: Spark orders NaN above every real value, so a
    // zero vector's NaN cosine would pass ≥ τ (the DuckDB twin is
    // consistent for a different reason — its list_cosine_similarity
    // returns −1.0 for zero vectors; never rely on its NaN ordering)
    val e = vecs
      .select(col(idCol) +: (blockCols.map(col) :+ col(vecCol).as("__v")): _*)
      .withColumn("__nrm", norm(col("__v")))
      .filter(col("__nrm") > 0)
    PairBlocks.selfJoinPairs(e, idCol, blockCols, Seq("__v", "__nrm"), nBlocks)
      .filter(cosinePrenormed(dot(col("__v1"), col("__v2")),
        col("__nrm1"), col("__nrm2")) >= tau)
      .select(Seq(
        least(col(idCol + "1"), col(idCol + "2")).as("id1"),
        greatest(col(idCol + "1"), col(idCol + "2")).as("id2")) ++
        blockCols.map(col): _*)
  }
}
