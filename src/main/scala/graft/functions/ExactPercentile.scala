package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Exact

/** Exact interpolated percentiles (DuckDB `quantile_cont` semantics)
  * via a count-by-value histogram — the scale-safe replacement for
  * Spark's `percentile` aggregate.
  *
  * Why not `percentile`: Spark's exact percentile buffers EVERY value
  * of a group in one reducer's memory (an `OpenHashMap` merged on a
  * single task), so a 100× scale-up of a 3-group aggregation is an
  * unsplittable multi-GB sort per group → OOM. This helper never holds
  * a group in memory:
  *
  *   1. `groupBy(group, value)` → counts. Linear shuffle with map-side
  *      partial aggregation; output size is bounded by the DISTINCT
  *      VALUE DOMAIN (cents of a bounded price, char lengths), not by
  *      row count — at 100 TB this is the same few-million-row frame
  *      it is at sf0.1.
  *   2. One window over the distinct values per group: running count
  *      (`cum`) and group total (`n`). Per-group task size = distinct
  *      values, again domain-bounded.
  *   3. The rank of the interpolation's lower/upper neighbor is exact
  *      integer arithmetic (`h = (n-1)·num/den`); each neighbor value
  *      is a conditional `min` in a tiny final `groupBy(group)`.
  *
  * Everything is integer-exact end to end: values enter as
  * `floor(x·10^valPow + 0.5)` scaled longs ([[graft.Exact.e]]) and the
  * interpolated quantile leaves as a ×10^outPow long. A `require`
  * guarantees the interpolation fraction times the output scale is an
  * integer for every representable rank (den/gcd(num,den) must divide
  * the rescale factor), so there is no float rounding anywhere —
  * matching the oracle's `FLOOR(quantile_cont(x,p)·10^outPow + 0.5)`
  * bit for bit (the oracle's double math is within ~1e-13 relative of
  * this exact integer, far from any floor boundary).
  */
object ExactPercentile {

  /** One requested percentile: output column name, p = num/den. */
  final case class Pct(name: String, num: Int, den: Int)

  @annotation.tailrec
  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)

  /** Per-group exact interpolated quantiles of `value`.
    *
    * @param value  source column (double/integer), scaled internally by
    *               10^valPow into an exact long
    * @param valPow input decimal places (2 for cent-valued money, 0 for
    *               integer lengths); values must be exact at this scale
    * @param outPow output scale: each result column is the quantile
    *               ×10^outPow as BIGINT (outPow ≥ valPow)
    */
  def quantiles(df: DataFrame, groupCols: Seq[String], value: Column,
                valPow: Int, outPow: Int, pcts: Seq[Pct]): DataFrame = {
    val grp = groupCols.map(col)
    // percentile/quantile_cont semantics IGNORE nulls — a null value
    // must not occupy a rank (it would sort first in the cum window
    // and shift every quantile); a group whose values are ALL null
    // simply vanishes (no histogram rows), which callers joining the
    // result back must treat as "no band", not "band [0,0]"
    val counts = df
      .filter(value.isNotNull)
      .groupBy(grp :+ Exact.e(value, valPow).as("v"): _*)
      .agg(count(lit(1)).as("cnt"))
    quantilesOfCounts(counts, groupCols, valPow, outPow, pcts)
  }

  /** The histogram→quantile half of [[quantiles]], exposed so a
    * PERSISTED count-by-value histogram ([[graft.sources.SketchStore]])
    * feeds the identical arithmetic: the histogram is an exact
    * mergeable summary (counts add), so quantiles over any UNION of
    * stored batches come from summing their histograms — never from
    * re-scanning the batches. `counts` must carry `groupCols`, an
    * already-scaled long value column `v` (10^valPow), and `cnt`. */
  def quantilesOfCounts(countsIn: DataFrame, groupCols: Seq[String],
                        valPow: Int, outPow: Int, pcts: Seq[Pct]): DataFrame = {
    require(outPow >= valPow, s"outPow $outPow < valPow $valPow")
    val mul = math.pow(10d, (outPow - valPow).toDouble).toLong
    pcts.foreach { p =>
      require(p.num >= 0 && p.num <= p.den && p.den > 0, s"bad pct $p")
      // exactness precondition: rem = ((n-1)·num) mod den is always a
      // multiple of g = gcd(num, den), so rem·mul/den is an integer iff
      // (den/g) | mul — checked here so a bad (p, scale) combination
      // fails at plan time, not with a silently-truncated quantile
      val g = gcd(p.num.toLong, p.den.toLong)
      require(mul % (p.den / g) == 0,
        s"fraction ${p.num}/${p.den} not exact at output scale 10^$outPow " +
          s"for values at 10^$valPow")
    }

    val grp = groupCols.map(col)
    val counts = countsIn
    // running + total counts share one hash-partition on the group key;
    // the ordered frame sorts distinct values only (domain-bounded)
    val wOrd = Window.partitionBy(grp: _*).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(grp: _*)
    val ranked = counts
      .withColumn("cum", sum("cnt").over(wOrd))
      .withColumn("n", sum("cnt").over(wAll))

    // per-row candidate markers for each percentile's two neighbors
    val withCand = pcts.foldLeft(ranked) { (d, p) =>
      val hNum = (col("n") - 1) * p.num.toLong
      // integer div/mod via double floor: operands stay < 2^52 until
      // n ~ 4.5e15/num rows per group — far beyond 100 TB row counts
      val lo = floor(hNum / p.den.toLong).cast(LongType)
      val rem = hNum - lo * p.den.toLong
      val hiIdx = when(rem === 0L, lo).otherwise(lo + 1L)
      d.withColumn(s"${p.name}__lo", when(col("cum") > lo, col("v")))
        .withColumn(s"${p.name}__hi", when(col("cum") > hiIdx, col("v")))
        .withColumn(s"${p.name}__rem", rem)
    }

    val aggs = pcts.map { p =>
      val vLo = min(s"${p.name}__lo")
      val vHi = min(s"${p.name}__hi")
      val rem = min(s"${p.name}__rem") // constant within the group
      // q·10^outPow = vLo·mul + rem/den·(vHi−vLo)·mul — exact by the
      // require above; the double division is of an exactly-divisible
      // product < 2^52, hence exact
      (vLo * mul + floor(rem * (vHi - vLo) * mul / p.den.toLong).cast(LongType))
        .cast(LongType).as(p.name)
    }
    withCand.groupBy(grp: _*).agg(aggs.head, aggs.tail: _*)
  }
}
