package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-budget k-core peeling (Matula & Beck 1983): repeatedly delete
  * every node whose current degree is below k; what survives converges
  * to the k-core — the standard graph-density filter before community
  * or cohesion analysis (here: which products sit inside a densely
  * recurring co-purchase neighborhood; on a document similarity graph:
  * which docs are corroborated by a dense near-dup cluster rather than
  * one chance pair).
  *
  * The round count is a FIXED budget, not a convergence loop — the
  * driver never inspects data (d14 PageRank's convention), every
  * quantity is an integer count, and one round is one degree
  * aggregation plus two semi-joins, all linear in |E| and shuffled on
  * node id — so a DuckDB oracle can unroll the exact same rounds and
  * hash-compare the result. Peeling converges in ≤ |V| rounds in
  * theory but in ~10 on real degree distributions; "after R rounds"
  * is deterministic on both engines either way.
  *
  * Lineage: each round's edge frame is checkpointed so the plan stays
  * constant-size across rounds (the [[PageRank]] /
  * [[graft.dedup.ConnectedComponents]] regime). Pass `checkpointDir`
  * on a real cluster for executor-loss-tolerant `checkpoint()`; local
  * runs default to `localCheckpoint`.
  */
object KCore {

  /** @param edges deduplicated unordered pairs in columns (a, b),
    *              each edge listed once (a < b by convention)
    * @param k     minimum within-subgraph degree to survive a round
    * @param rounds fixed peel budget
    * @return (v, deg) — every endpoint of a surviving edge with its
    *         degree in the peeled graph
    */
  def peel(edges: DataFrame, k: Int, rounds: Int,
           checkpointDir: Option[String] = None,
           probe: Option[Convergence] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(rounds >= 0 && rounds <= 64, s"rounds in [0,64], got $rounds")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)
    def result(e: DataFrame): DataFrame =
      e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
    var e = cut(edges.select("a", "b"))
    // probe cost: counts on the checkpointed edge frame only — the
    // deleted-edge probe is the round-over-round count delta
    var prevCnt = probe.map(_ => e.count())
    for (_ <- 1 to rounds) {
      val keep = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select("v")
      e = cut(
        e.join(keep.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
          .join(keep.withColumnRenamed("v", "b"), Seq("b"), "left_semi"))
      val done = probe.exists { p =>
        val cnt = e.count()
        val deleted = prevCnt.get - cnt
        p.record(deleted)
        prevCnt = Some(cnt)
        // a round that deletes nothing is the fixed point: every
        // surviving endpoint already meets the degree bar, so all
        // later rounds delete nothing either
        deleted == 0L
      }
      if (done) return result(e)
    }
    result(e)
  }
}
