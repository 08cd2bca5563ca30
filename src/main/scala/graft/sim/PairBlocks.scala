package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Block-matrix (triangle) all-pairs self-join.
  *
  * A naive self-join on a low-cardinality blocking key (e.g. 10
  * labels, 5 languages) shuffles into that many partitions — at 100 TB
  * ten reducers do all the work. This helper superimposes `nBlocks`
  * hash blocks on top of the caller's equality keys: each row lands in
  * block b = hash(id) mod B; the left role replicates a row to
  * block-pair keys (b, y) for y ≥ b, the right role to (x, b) for
  * x ≤ b. Every unordered row pair then meets on exactly one
  * (blockLow, blockHigh) key:
  *
  *  - same-block pairs (b, b): both orderings meet → deduped by
  *    requiring id1 < id2;
  *  - cross-block pairs (i ≠ j): exactly one meeting, with the
  *    lower-block row in the left role — the id ORDER of the output is
  *    therefore arbitrary for cross-block pairs. Consumers compute
  *    their (symmetric) pair function and canonicalize with
  *    `least(id1, id2)` / `greatest(id1, id2)`.
  *
  * Cost: each side replicated ≈ (B+1)/2 ×; parallelism gained ≈
  * B(B+1)/2 × over the plain equality join. Choose B so one block of
  * one equality group fits a task.
  */
object PairBlocks {

  /** Pairs of rows agreeing on `eqCols`, each unordered pair exactly
    * once. Output columns: `<idCol>1`, `<idCol>2`, `eqCols` (left
    * copy), payload columns suffixed `1` / `2`. */
  def selfJoinPairs(df: DataFrame, idCol: String, eqCols: Seq[String],
                    payload: Seq[String], nBlocks: Int): DataFrame = {
    val base = df.select((idCol +: (eqCols ++ payload)).map(col): _*)
      .withColumn("__blk", pmod(xxhash64(col(idCol)), lit(nBlocks)).cast("int"))

    val left = base
      .withColumn("__bhi", explode(sequence(col("__blk"), lit(nBlocks - 1))))
      .withColumnRenamed("__blk", "__blo")
    val right = base
      .withColumn("__blo2", explode(sequence(lit(0), col("__blk"))))
      .withColumnRenamed("__blk", "__bhi2")

    val l = (idCol +: payload).foldLeft(left)((d, c) => d.withColumnRenamed(c, c + "1"))
    val r = (idCol +: (eqCols ++ payload)).foldLeft(right)((d, c) =>
      d.withColumnRenamed(c, if (eqCols.contains(c)) c + "__r" else c + "2"))

    val eqCond = (eqCols.map(c => col(c) === col(c + "__r")) ++ Seq(
      col("__blo") === col("__blo2"), col("__bhi") === col("__bhi2"),
      col("__blo") =!= col("__bhi") || col(idCol + "1") < col(idCol + "2")))
      .reduce(_ && _)

    l.join(r, eqCond)
      .drop("__blo", "__bhi", "__blo2", "__bhi2")
      .drop(eqCols.map(_ + "__r"): _*)
  }
}
