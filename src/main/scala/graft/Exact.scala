package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-exact scaled-integer outputs for oracle-checked queries.
  *
  * Why this exists (round-3 lesson): the correctness gate stringifies the
  * Spark parquet result via Arrow (DECIMAL → `Decimal('123.40')` → "123.40")
  * but the DuckDB oracle via its pandas bridge (DECIMAL → float64 → "123.4"),
  * so ANY decimal output column hash-mismatches whenever a value carries a
  * trailing zero digit. Oracle-checked queries must therefore never emit
  * DECIMAL; computed monetary/statistical values are emitted as ×10^s
  * BIGINT instead (suffix `_e{s}` on the column name).
  *
  * Why `floor(x * 10^s + 0.5)` and not `round`/decimal casts: Spark rounds
  * the shortest decimal representation of a double (BigDecimal HALF_UP)
  * while DuckDB rounds the binary value, so they disagree on .5-boundary
  * doubles. `*`, `+` and `floor` are all single correctly-rounded IEEE-754
  * operations, identical on the JVM and in C++ — given bit-identical input
  * doubles (same parquet bytes, textually-parallel arithmetic) the scaled
  * integer is bit-identical on both engines, and SUM over BIGINT is
  * order-independent, so partition/merge order can't flip the result.
  *
  * The DuckDB mirror of `eSum(c, s)` is
  * `CAST(SUM(CAST(FLOOR(c * 10^s.0 + 0.5) AS BIGINT)) AS BIGINT)`
  * (the outer cast matters: DuckDB SUM(BIGINT) is HUGEINT, which its
  * pandas bridge would otherwise render as float64).
  *
  * Range: summands up to ~1e11 (charge ×10^6) over ~10^6 rows stay far
  * below 2^63; at true 100 TB scale monetary totals would be carried as
  * DECIMAL internally and only formatted at the edge — this helper is
  * specifically the *oracle output* convention.
  */
object Exact {

  // exact literals, not Math.pow: pow's contract allows 1 ulp of error,
  // and the DuckDB mirrors are written against exact decimal literals —
  // any slack here would shift every scaled sum at once
  private val Pow10: Array[Double] = Array(
    1.0, 10.0, 100.0, 1000.0, 10000.0, 100000.0, 1000000.0, 10000000.0,
    100000000.0, 1000000000.0, 10000000000.0, 100000000000.0,
    1000000000000.0, 10000000000000.0, 100000000000000.0, 1000000000000000.0)

  private[graft] def pow10(s: Int): Double = Pow10(s)

  /** `floor(c * 10^s + 0.5)` as BIGINT — deterministic scaled integer. */
  def e(c: Column, s: Int): Column = floor(c * lit(pow10(s)) + lit(0.5))

  /** Order-independent scaled-integer sum of a double column. */
  def eSum(c: Column, s: Int): Column = sum(e(c, s))
}
