package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) made
  * deterministic: every node starts labeled with its own id; each
  * round, every node adopts the most frequent label among its
  * neighbors, ties broken by SMALLEST label. Classic asynchronous LPA
  * is run-order-dependent; the synchronous update + total tie order
  * makes the result a pure function of the graph, so a fixed round
  * budget is oracle-unrollable (the d14/d18 convention) — and the
  * deterministic variant is what a reproducible data pipeline wants
  * anyway (community = candidate near-dup/topic group).
  *
  * One round = one |E|-linear equi-join of the symmetrized edge list
  * against the label frame, a (node, label) partial-count aggregation,
  * and a min-of-struct ((−cnt, label)) argmax per node — map-side
  * combinable, no rank window, skew lands in the (node, label) partial
  * agg where a hot node's counts collapse before the final exchange.
  * Labels checkpoint per round so the plan stays constant-size
  * ([[PageRank]]'s regime, optional reliable `checkpointDir`).
  */
object LabelProp {

  /** @param edges undirected pairs in (a, b), each edge once
    * @param rounds fixed synchronous-update budget
    * @return (v, label) — final community label per node
    */
  def run(edges: DataFrame, rounds: Int,
          checkpointDir: Option[String] = None,
          probe: Option[Convergence] = None): DataFrame = {
    require(rounds >= 0 && rounds <= 64, s"rounds in [0,64], got $rounds")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)
    val sym = cut(edges.select(col("a"), col("b"))
      .unionAll(edges.select(col("b").as("a"), col("a").as("b"))))
    var lab = cut(sym.select(col("a").as("v")).distinct()
      .select(col("v"), col("v").as("label")))
    for (_ <- 1 to rounds) {
      val nbr = sym.join(lab, sym("b") === lab("v"))
        .select(sym("a").as("v"), lab("label"))
      val next = cut(nbr.groupBy("v", "label").agg(count(lit(1)).as("cnt"))
        .groupBy("v")
        .agg(min(struct((col("cnt") * -1).as("nc"), col("label"))).as("m"))
        .select(col("v"), col("m.label").as("label")))
      // opt-in convergence probe: |V|-linear diff of two checkpointed
      // label frames; a 0-change round is the synchronous-update fixed
      // point (the next frame is a pure function of this one), so
      // stopping early returns the identical labeling. NOTE synchronous
      // LPA can 2-cycle on bipartite structure — such graphs simply
      // never record a 0 round and run their full budget.
      val done = probe.exists { p =>
        val ch = next.join(lab.select(col("v"), col("label").as("pl")), "v")
          .filter(col("label") =!= col("pl")).count()
        p.record(ch)
        ch == 0L
      }
      lab = next
      if (done) return lab
    }
    lab
  }
}
