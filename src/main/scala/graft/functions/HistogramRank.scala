package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scale-safe per-group dense ranking — the histogram-derived
  * replacement for `rank/ntile/percent_rank/cume_dist` windows over
  * LOW-cardinality partition keys (the q50 failure shape: a rank
  * window over a 5-value key buffer-sorts a fifth of the table in one
  * task; at 100× the query serializes regardless of cluster size).
  *
  * Same regime as [[ExactPercentile]]:
  *
  *   1. `row_number` only within (group, value) — a HIGH-cardinality
  *      partition key, so every window task is tiny (ties for one
  *      exact value);
  *   2. a count-by-value histogram per group with a cumulative count
  *      of strictly-smaller values — the only per-group pass, and it
  *      runs over the HISTOGRAM, whose size is bounded by the distinct
  *      value domain, not the row count;
  *   3. global tie-free rank r = cum_before + row_number, and the
  *      group size n, joined back (group totals are a tiny aggregate —
  *      AQE broadcasts it).
  *
  * From (r, n) every rank statistic is pure integer arithmetic:
  * percent_rank = (r−1)/(n−1), cume_dist = r/n, and `ntile(k)` is
  * [[ntileExpr]] — all exactly mirrorable in ANSI SQL, no float.
  */
object HistogramRank {

  /** Adds tie-free rank `rCol` (1-based, ordered by `value` then
    * `ties`) and group-size `nCol` to `df`. `ties` must make the
    * (value, ties) combination unique within each group.
    */
  def withRank(df: DataFrame, group: Seq[String], value: String,
               ties: Seq[String], rCol: String = "r",
               nCol: String = "n"): DataFrame = {
    require(ties.nonEmpty, "ties columns required for a tie-free rank")
    val wv = Window.partitionBy((group :+ value).map(col): _*)
      .orderBy(ties.map(col): _*)
    val rn = df.withColumn("_hr_rn", row_number().over(wv).cast(LongType))
    val hist = df.groupBy((group :+ value).map(col): _*)
      .agg(count(lit(1)).as("_hr_cnt"))
    val wh = Window.partitionBy(group.map(col): _*).orderBy(value)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.select(
      (group :+ value).map(col) :+
        coalesce(sum("_hr_cnt").over(wh), lit(0L)).as("_hr_cum"): _*)
    val tot = hist.groupBy(group.map(col): _*)
      .agg(sum("_hr_cnt").as(nCol))
    rn.join(cum, group :+ value)
      .join(tot, group)
      .withColumn(rCol, col("_hr_cum") + col("_hr_rn"))
      .drop("_hr_rn", "_hr_cum")
  }

  /** `ntile(k)` of rank `r` in a group of `n` rows as a SQL
    * expression string (first buckets one row larger — Spark/ANSI
    * semantics), pure integer. The DuckDB mirror is the same text
    * with `div` → `//`. */
  def ntileExpr(k: Int, r: String = "r", n: String = "n"): String =
    s"""CASE WHEN $r <= ($n % $k) * (($n div $k) + 1)
       |     THEN ($r + ($n div $k)) div (($n div $k) + 1)
       |     ELSE ($n % $k) + ($r - ($n % $k) * (($n div $k) + 1) + ($n div $k) - 1)
       |                      div ($n div $k)
       |END""".stripMargin

  /** Half-up ×1000 of the exact rational a/b: floor(a/b + ½) =
    * (2a + b) div 2b. */
  def milliExpr(a: String, b: String): String =
    s"(2 * ($a) * 1000 + ($b)) div (2 * ($b))"
}
