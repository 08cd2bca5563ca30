package graft.dedup

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Exact edit-distance self-join via q-gram prefix filtering (the
  * Ed-Join family: Xiao, Wang, Lin VLDB'08; count bound from Gravano
  * et al. VLDB'01) — all pairs with levenshtein ≤ k, candidate-bounded
  * by gram rarity instead of length-band population.
  *
  * Principle: one edit operation changes at most q of a string's
  * (overlapping, non-positional) q-grams, so ed(s1,s2) ≤ k ⇒ their
  * gram multisets share ≥ max(g1,g2) − q·k occurrences (gᵢ = lenᵢ −
  * q + 1). Order all gram occurrences by a global rarity order
  * (ascending corpus frequency): a qualifying pair must then share a
  * gram among each side's first q·k + 1 occurrences — the "prefix".
  * Joining on prefix grams alone is LOSSLESS for every pair whose
  * longer side has more than q·k grams; the remaining short strings
  * (len ≤ q·k + q − 1, a fixed bounded-length subdomain) pair in
  * their own block. PPJoin's positional filter and the length filter
  * (|len diff| ≤ k) prune candidates before the dedup shuffle.
  *
  * Scale shape vs round-3 q32 (length-band probes): band population
  * grows linearly with distinct strings of that length — the band
  * join is Θ(Σ band²), quadratic. Here candidates are
  * Θ(Σ_gram df_prefix(gram)²) over the RAREST grams, which the
  * frequency ordering minimizes; every stage is a linear shuffle
  * (explode → count → per-string window → equi-join).
  */
object EdJoin {

  /** All unordered distinct-value pairs (s1 < s2) of `strCol` with
    * levenshtein(s1, s2) ≤ maxDist. Output: (n1, n2, dist). */
  def selfJoin(df: DataFrame, strCol: String, maxDist: Int, q: Int = 3): DataFrame = {
    require(maxDist >= 1 && q >= 2)
    val qk = q * maxDist
    val names = df.select(col(strCol).as("s")).filter(col("s").isNotNull).distinct()
      .withColumn("len", length(col("s")).cast(LongType))

    // short block: strings with ≤ q·k grams can lose EVERY gram to k
    // edits (zero overlap at ed ≤ k), so the prefix argument does not
    // apply — pair them directly. Bounded-length subdomain: population
    // is capped by the string domain, not the corpus.
    val shortMax = qk + q - 1 // g = len − q + 1 ≤ q·k
    val short = names.filter(col("len") <= shortMax)
    // length-probe equi key (ed ≥ |len diff|): one side probes the
    // 2k+1 admissible partner lengths so the join is hash-based, not
    // a nested loop — sound, and each pair meets exactly once
    val shortPairs = short
      .select(col("s").as("n1"), col("len").as("len1"),
        explode(sequence(col("len") - maxDist, col("len") + maxDist)).as("pl"))
      .join(short.select(col("s").as("n2"), col("len").as("len2")),
        col("pl") === col("len2") && col("n1") < col("n2"))
      .select("n1", "n2")

    // gram occurrences (non-positional multiset): one row per start
    // offset — all codegen'd builtins, no higher-order lambdas
    val grams = names.filter(col("len") >= q)
      .select(col("s"), col("len"),
        explode(sequence(lit(1), (col("len") - q + 1).cast(IntegerType))).as("pos"))
      .withColumn("g", col("s").substr(col("pos"), lit(q)))
    val freq = grams.groupBy("g").agg(count(lit(1)).as("df"))

    // per-string rarity rank; prefix = q·k + 1 rarest occurrences
    val byRarity = Window.partitionBy("s")
      .orderBy(col("df").asc, col("g").asc, col("pos").asc)
    val pref = grams.join(freq, "g")
      .withColumn("rk", row_number().over(byRarity).cast(LongType))
      .filter(col("rk") <= qk + 1)
      .select(col("s"), col("len"), col("g"), col("rk"))

    // distinct per-side gram names: `a("g") === b("g")` on two
    // projections of ONE frame resolves correctly but logs Spark's
    // "trivially true equals predicate" warning on every analysis —
    // renaming keeps the log clean for warnings that matter
    val a = pref.select(col("s").as("n1"), col("len").as("len1"),
      col("g").as("ga"), col("rk").as("rk1"))
    val b = pref.select(col("s").as("n2"), col("len").as("len2"),
      col("g").as("gb"), col("rk").as("rk2"))
    // gᵢ = lenᵢ − q + 1; required multiset overlap t = max(g1,g2) − q·k
    // (≥ 1 because the longer side exceeds the short block). Positional
    // filter: a match at rarity ranks (rk1, rk2) caps the achievable
    // overlap at min(g1 − rk1, g2 − rk2) + 1.
    val g1 = col("len1") - (q - 1)
    val g2 = col("len2") - (q - 1)
    val candLong = a.join(b,
        col("ga") === col("gb") && col("n1") < col("n2") &&
        abs(col("len1") - col("len2")) <= maxDist &&
        greatest(col("len1"), col("len2")) > lit(shortMax.toLong) &&
        least(g1 - col("rk1"), g2 - col("rk2")) + 1 >= greatest(g1, g2) - qk)
      .select("n1", "n2")
      .distinct()

    candLong.unionByName(shortPairs)
      .withColumn("dist", levenshtein(col("n1"), col("n2")).cast(LongType))
      .filter(col("dist") <= maxDist)
      .select("n1", "n2", "dist")
  }
}
