package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keep-one-per-key deduplication — the reference's
  * `sort_values('popularity', ascending=False).drop_duplicates(subset=…)`
  * (dags/etl_grammy_spotify.py:151-154, 216-219).
  *
  * Implemented as `row_number()` over a window instead of a global
  * sort + scan: one shuffle on the key columns, no global ordering,
  * and ties broken deterministically by the caller-supplied ordering.
  * At 100 TB this shuffles each row once, keyed by the dedup key; AQE
  * splits skewed keys.
  */
object Dedup {

  private val RowNum = "__graft_rn"

  /** One row per `keys`, the first under `ordering` (include a unique
    * id as the last ordering column for determinism). */
  def topPerKey(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn(RowNum, row_number().over(w))
      .filter(col(RowNum) === 1)
      .drop(RowNum)
  }

  /** Exact duplicate groups by full value of `keyCol`: one surviving
    * id (min) plus the duplicate count. At scale, group on a 64-bit
    * hash of the value first so the shuffle carries 8 bytes per row,
    * not the full document body. */
  def exactGroups(df: DataFrame, keyCol: Column, idCol: Column): DataFrame =
    df.groupBy(keyCol.as("dup_key"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_dups"))
}
