package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-based imputation — the reference fills missing `artist` by
  * joining `nominee_norm` against the Spotify album/track tables and
  * copying the matched artist, falling back to `'Unknown'`
  * (dags/etl_grammy_spotify.py:124-168). The reference does this with
  * a merge plus a driver-side `iterrows()` write-back loop; here it is
  * a single left join + `coalesce`, fully distributed.
  */
object Impute {

  /** Fill `targetCol` where null from `lookup[valueCol]` matched on
    * `df[keyCol] == lookup[lookupKey]`, else `fallback`.
    *
    * `lookup` must be 1-row-per-key (pre-deduplicate with
    * [[Dedup.topPerKey]]); small lookups should be wrapped in
    * `broadcast()` by the caller so the join is a broadcast-hash join
    * (no shuffle of the fact side).
    */
  def fromLookup(
      df: DataFrame,
      lookup: DataFrame,
      keyCol: String,
      lookupKey: String,
      targetCol: String,
      valueCol: String,
      fallback: Option[String] = None): DataFrame = {
    val lk = lookup.select(col(lookupKey).as("__lk_key"), col(valueCol).as("__lk_val"))
    val joined = df.join(lk, df(keyCol) === col("__lk_key"), "left")
    val filled = fallback match {
      case Some(f) => coalesce(col(targetCol), col("__lk_val"), lit(f))
      case None    => coalesce(col(targetCol), col("__lk_val"))
    }
    joined.withColumn(targetCol, filled).drop("__lk_key", "__lk_val")
  }

  /** Conditional masked copy — `df.loc[mask, target] = df.loc[mask, src]`
    * (reference dags/etl_grammy_spotify.py:173-180) as a `when`. */
  def conditionalCopy(df: DataFrame, cond: Column, target: String, src: Column): DataFrame =
    df.withColumn(target, when(cond, src).otherwise(col(target)))
}
