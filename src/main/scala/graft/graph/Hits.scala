package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (Kleinberg, JACM'99) on a directed bipartite edge list —
  * mutually-recursive hub/authority scores: an authority is pointed
  * at by good hubs, a hub points at good authorities. On a
  * customer→product graph the authorities are the products demanded
  * by broadly-active customers (a popularity signal that, unlike raw
  * degree, discounts narrow repeat buyers); on a query→document click
  * graph it's the classic retrieval use.
  *
  * Integer-exact and oracle-unrollable (the d14/d18/d20 regime):
  * every iteration is two |E|-linear join+aggregate passes
  * (h-mass → authorities, a-mass → hubs) followed by an integer
  * re-normalization to `scale` via one 1-ROW broadcast sum each —
  * floor division, so both engines agree bit-for-bit. Overflow bound:
  * after every normalization the scores sum to ≤ scale, so a raw
  * aggregate is ≤ scale·maxOutdeg and the renormalization product is
  * ≤ scale²·maxOutdeg — under 2⁶³ for the default scale 10⁶ up to
  * maxOutdeg 10⁶ (raise scale only with a proven degree bound; the
  * e6 resolution is ample for ranking). Fixed iteration
  * budget; per-iteration checkpoint holds the plan constant, with
  * the optional reliable `checkpointDir` shared by all graft graph
  * ops. */
object Hits {

  /** @param edges distinct directed pairs (src, dst)
    * @return (dst, auth_e6) — authority scores over `dst` nodes,
    *         scaled to sum ≤ `scale` */
  def authorities(edges: DataFrame, iterations: Int = 3,
                  scale: Long = 1000000L,
                  checkpointDir: Option[String] = None,
                  probe: Option[Convergence] = None): DataFrame = {
    require(iterations >= 1 && iterations <= 64, s"iterations in [1,64], got $iterations")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)
    val e = cut(edges.select(col("src"), col("dst")).distinct())
    var hub = e.select(col("src")).distinct().select(col("src"), lit(1L).as("h"))
    var auth: DataFrame = null
    var prevAuth: DataFrame = null
    for (_ <- 1 to iterations) {
      // the cut sits on the RAW aggregate, which is referenced twice
      // (the broadcast 1-row sum AND the renormalization stream side):
      // a barrier on the normalized frame instead would leave the |E|
      // join + aggregate to run once per reference
      val aRaw = cut(e.join(hub, Seq("src"))
        .groupBy("dst").agg(sum("h").as("ar")))
      val aSum = aRaw.agg(sum("ar").as("s"))
      auth = aRaw.crossJoin(broadcast(aSum))
        .select(col("dst"), expr(s"ar * $scale div s").as("a"))
      val hRaw = cut(e.join(auth, Seq("dst"))
        .groupBy("src").agg(sum("a").as("hr")))
      val hSum = hRaw.agg(sum("hr").as("s"))
      // opt-in convergence probe on the normalized authority scores
      // (derived from the checkpointed aRaw — cheap): equal scores ⇒
      // the hub update and every later iteration reproduce themselves
      // exactly (integer arithmetic), so stopping early is
      // output-invariant. First iteration has no predecessor and
      // records the full row count.
      val done = probe.exists { p =>
        val ch =
          if (prevAuth == null) auth.count()
          else auth.join(prevAuth.select(col("dst"), col("a").as("pa")), "dst")
            .filter(col("a") =!= col("pa")).count()
        p.record(ch)
        ch == 0L
      }
      prevAuth = auth
      if (done) return auth.select(col("dst"), col("a").as("auth_e6"))
      hub = hRaw.crossJoin(broadcast(hSum))
        .select(col("src"), expr(s"hr * $scale div s").as("h"))
    }
    auth.select(col("dst"), col("a").as("auth_e6"))
  }
}
