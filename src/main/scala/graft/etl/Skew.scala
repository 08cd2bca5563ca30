package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for pathological join keys (SURVEY.md §5).
  *
  * AQE's skew-join handles most cases at runtime; explicit salting is
  * for the worst offenders (a handful of keys holding >10% of rows —
  * e.g. the `'Unknown'` artist bucket the reference's imputation
  * produces). The fact side gets a random salt in [0, n); the
  * dimension side is exploded n× so every (key, salt) pair matches.
  */
object Skew {

  /** Only fact-preserving join types are sound: an unmatched DIM row
    * exists `nSalts` times (once per salt), so right/full outer joins
    * would emit it `nSalts` times instead of once. */
  private val SoundJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")

  private def checkJoinType(joinType: String): Unit =
    require(SoundJoinTypes(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin: '$joinType' would duplicate unmatched dim rows nSalts times; " +
      "only inner/left/semi/anti joins are sound with an exploded dim side")

  /** Salted equi-join: `facts ⋈ dims` on `key`, with `dims` exploded
    * `nSalts`×. Use only when `dims` is too big to broadcast and the
    * key histogram is known-skewed. */
  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String,
                 nSalts: Int, joinType: String = "inner"): DataFrame = {
    checkJoinType(joinType)
    val salted = facts.withColumn("__salt",
      (rand(seed = 42) * nSalts).cast("int"))
    val exploded = dims.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    salted.join(exploded, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Deterministic variant: salt derived from a unique row id, so
    * results are reproducible run-to-run (preferred in tested
    * pipelines over `rand`). */
  def saltedJoinBy(facts: DataFrame, dims: DataFrame, key: String,
                   saltSource: Column, nSalts: Int,
                   joinType: String = "inner"): DataFrame = {
    checkJoinType(joinType)
    val salted = facts.withColumn("__salt", pmod(xxhash64(saltSource), lit(nSalts)).cast("int"))
    val exploded = dims.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    salted.join(exploded, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
