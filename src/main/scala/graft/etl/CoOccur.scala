package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded co-occurrence pair expansion — the shared kernel for
  * market-basket mining (q53) and word co-occurrence over documents.
  *
  * The naive shape (per-basket self-join) is O(k²) PER BASKET: one hot
  * basket — a stopword-heavy document with k ≈ 10⁴–10⁵ distinct items —
  * emits k² pairs that all land on ONE join key. AQE can split the
  * shuffle partition but not the row explosion itself, so the operator
  * MUST bound k before the join.
  *
  * Bound semantics (deterministic, oracle-mirrorable): each basket
  * keeps its `maxItems` FIRST distinct items in item sort order; the
  * rest are dropped from pairing. Sort-order truncation (vs. "top-k by
  * salience") is chosen because it needs no auxiliary frequency frame
  * and is exactly reproducible in ANSI SQL (`row_number() OVER
  * (PARTITION BY basket ORDER BY item) <= k`). Callers that want
  * salience-ranked truncation can pre-rank and pre-filter upstream —
  * the cap here is the safety net that makes the expansion
  * corpus-linear: ≤ maxItems²/2 pairs per basket, whatever the data.
  *
  * Scale shape: the distinct() and the row_number window both key on
  * the HIGH-cardinality basket id (splittable everywhere); the pair
  * self-join shuffles on the basket id once; map-side partial
  * aggregation applies to any downstream pair count.
  */
object CoOccur {

  /** Unordered distinct item pairs (a < b) co-occurring under one
    * basket key. Output columns: (`basket`, `a`, `b`).
    *
    * @param maxItems per-basket distinct-item cap (first `maxItems` in
    *                 item sort order participate in pairing)
    */
  def pairs(baskets: DataFrame, basketCol: String, itemCol: String,
            maxItems: Int = 64): DataFrame = {
    require(maxItems >= 2, s"maxItems must be >= 2: $maxItems")
    val ob = baskets
      .select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    val w = Window.partitionBy("basket").orderBy("item")
    val capped = ob
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxItems)
      .drop("rn")
    val l = capped.toDF("basket", "a")
    val r = capped.toDF("basket", "b")
    l.join(r, "basket").filter(col("a") < col("b"))
  }
}
