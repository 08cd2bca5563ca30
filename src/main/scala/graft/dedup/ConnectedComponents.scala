package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — turns
  * pairwise matches into dedup CLUSTERS so each group keeps one
  * canonical document (the min id).
  *
  * Algorithm: iterative min-label propagation to a fixpoint. Each
  * round is one join + one aggregate (both on the 8-byte id — never
  * document payloads), with `localCheckpoint` truncating lineage so
  * plans stay constant-size across iterations. Rounds needed = graph
  * diameter; near-dup graphs are overwhelmingly tiny star/clique
  * components, so 3–4 rounds converge. (For adversarial long-chain
  * graphs switch to the large-star/small-star formulation
  * [Kiveris et al., "Connected Components in MapReduce and Beyond"],
  * which converges in O(log n) rounds with the same per-round shape.)
  */
object ConnectedComponents {

  /** @param edges DataFrame with two id columns (an undirected edge
    *              list; self-loops and duplicates tolerated)
    * @return (id, comp) — comp is the min id reachable from id
    */
  def run(edges: DataFrame, idCols: (String, String) = ("id1", "id2"),
          maxIter: Int = 15): DataFrame = {
    val sym = edges
      .select(col(idCols._1).as("src"), col(idCols._2).as("dst"))
      .union(edges.select(col(idCols._2).as("src"), col(idCols._1).as("dst")))
      .distinct()
      .localCheckpoint()

    var comp = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()

    // convergence check: labels only ever decrease, so Σcomp is
    // strictly decreasing until the fixpoint — one cheap aggregate per
    // round instead of a join + count
    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum("comp")).head().getLong(0)

    var prevSum = checksum(comp)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val viaNeighbor = sym.join(comp, sym("src") === comp("id"))
        .select(col("dst").as("id"), col("comp"))
      val next = viaNeighbor.union(comp.select("id", "comp"))
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint()
      val nextSum = checksum(next)
      comp = next
      converged = nextSum == prevSum
      prevSum = nextSum
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    comp
  }
}
