package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over an undirected edge list, in INTEGER
  * arithmetic.
  *
  * Corpus use: rank documents inside a near-duplicate similarity graph
  * (centrality picks the canonical representative of a dup cluster —
  * the doc most corroborated by its neighbors), or domains inside a
  * link graph for CommonCrawl-style quality weighting.
  *
  * Every quantity is a scaled long — rank mass starts at
  * `scale div N` per node and each step applies
  * `r' = (15·(scale div N)) div 100 + (85·Σ_in (r div deg)) div 100`
  * (d = 0.85 as the exact fraction 85/100, floor division
  * throughout). Rationale as with t14/q54: integer ops are
  * bit-identical on every engine, so a fixed iteration count yields an
  * EXACTLY reproducible fixed point prefix — a float PageRank differs
  * in the last ulps across engines/aggregation orders and cannot be
  * hash-compared. Floor-division mass leakage (< deg ulps per node
  * per step at the e12 scale) only ever shrinks ranks and is identical
  * on both engines.
  *
  * Scale shape: the per-iteration work is one equi-join of the rank
  * frame onto the edge list plus one partial-aggregated sum — both
  * linear in |E| and shuffled on node id; hot nodes are AQE skew-join
  * territory. The symmetrized edge list is localCheckpoint-ed once and
  * reused by every iteration; each iteration's result is
  * (lazily) checkpointed so the plan stays constant-size, the same
  * lineage regime as [[graft.dedup.ConnectedComponents]]. Iterations
  * are a fixed budget (default 5), not a convergence loop — the
  * driver never inspects data.
  *
  * Checkpoint durability: `localCheckpoint` stores blocks on
  * executors — fast, but one lost executor truncates an
  * unrecoverable lineage and fails the job. On a real cluster pass
  * `checkpointDir` (HDFS/object-store URI): iterations then go
  * through RELIABLE `df.checkpoint()`, which survives executor loss.
  * Local runs default to `localCheckpoint` (no dir needed, no HDFS
  * round-trip per iteration).
  */
object PageRank {

  /** @param edges undirected pairs (each listed once); symmetrized and
    *              deduplicated here
    * @param checkpointDir when set, use reliable `checkpoint()` into
    *              this directory (executor-loss-tolerant) instead of
    *              `localCheckpoint`
    * @return (id, rank_e12) — rank scaled by `scale`, summing to ≤
    *         `scale` (floor leakage only)
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iterations: Int = 5, scale: Long = 1000000000000L,
          checkpointDir: Option[String] = None,
          probe: Option[Convergence] = None): DataFrame = {
    require(iterations >= 1 && iterations <= 64, s"iterations in [1,64], got $iterations")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def cut(df: DataFrame, eager: Boolean): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager) else df.localCheckpoint(eager)
    // symmetrize once; checkpoint so all iterations reuse one
    // materialization instead of recomputing the (possibly expensive)
    // upstream edge query per step
    val sym = cut(edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct(), eager = true)
    val deg = sym.groupBy("a").agg(count(lit(1)).as("d"))
    val cnt = deg.agg(count(lit(1)).as("nn"))
    // rank frame carries (id, d, nn, r): degree and N ride along so no
    // iteration re-joins the degree table
    var rank = deg.crossJoin(broadcast(cnt))
      .select(col("a").as("id"), col("d"), col("nn"),
        expr(s"$scale div nn").as("r"))
    for (_ <- 1 to iterations) {
      val contrib = rank
        .select(col("id"), expr("r div d").as("c"))
        .join(sym, col("id") === col("a"))
        .groupBy(col("b")).agg(sum("c").as("s"))
      val next = cut(rank.join(contrib, rank("id") === contrib("b"), "left")
        .select(rank("id"), rank("d"), rank("nn"),
          (expr(s"(15 * ($scale div nn)) div 100") +
           expr("(85 * coalesce(s, cast(0 as bigint))) div 100")).as("r")),
        eager = false)
      // convergence probe (opt-in): both frames are checkpointed, so
      // the diff is one |V|-linear join-count, no |E| work; a 0-change
      // round is the integer fixed point — every later round is
      // bit-identical, so stopping early is output-invariant
      val done = probe.exists { p =>
        val ch = next.join(rank.select(col("id"), col("r").as("pr")), "id")
          .filter(col("r") =!= col("pr")).count()
        p.record(ch)
        ch == 0L
      }
      rank = next
      if (done) return rank.select(col("id"), col("r").as("rank_e12"))
    }
    rank.select(col("id"), col("r").as("rank_e12"))
  }
}
