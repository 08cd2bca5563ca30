package graft

import org.apache.spark.sql.SparkSession

/** Scratch main for plan experiments (not part of the library API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.headOption match {
      case Some("hotcell") =>
        // corpus-scale hot-cell measurement for the GEOCHECK ledger:
        // build a sqrt(n)-cell index over a dir's embeddings and
        // print the capacity signal (usage: Probe hotcell <sfDir>)
        import org.apache.spark.sql.functions._
        val dir = args(1)
        val e = Tables.embeddings(spark, dir)
          .select(col("vec_id").as("id"),
            graft.functions.VectorFunctions.toDouble(col("embedding")).as("vec"))
        val nv = e.count()
        val cells = math.max(2, math.ceil(math.sqrt(nv.toDouble)).toInt)
        val idx = java.nio.file.Files.createTempDirectory("probe_hotcell").toString
        sim.AnnIndex.build(e, nCells = cells, seed = 42L, dir = idx)
        val sig = sim.AnnIndex.hotCellSignal(spark, idx)
        println(s"[probe] hotcell $dir nCells=$cells " +
          s"nVec=${sig.nVec} maxCell=${sig.maxCell} target=${sig.target} " +
          s"hot=${sig.hot} suggested=${sig.suggestedNCells}")
        // r15: the automated remedy, measured at the same corpus scale
        // — run the split loop to its fixpoint and report the restored
        // signal (GEOCHECK hot_cell_gate post-split entry)
        if (sig.hot) {
          val t0 = System.nanoTime()
          val reps = Iterator.continually(sim.AnnIndex.splitHotCells(spark, idx))
            .take(5).takeWhile(_.splitCells > 0).toVector
          val sec = (System.nanoTime() - t0) / 1e9
          val post = sim.AnnIndex.hotCellSignal(spark, idx)
          println(f"[probe] hotcell-split $dir passes=${reps.size} " +
            f"split=${reps.map(_.splitCells).sum} " +
            f"newCells=${reps.map(_.newCells).sum} " +
            f"refused=${reps.map(_.refused).sum} sec=$sec%.1f " +
            s"postMaxCell=${post.maxCell} postTarget=${post.target} " +
            s"postNCells=${spark.read.parquet(s"$idx/centroids").count()} " +
            s"postHot=${post.hot}")
        }
      case Some("knngraph") =>
        // attribute the IVF graph build's cost: quantizer fit vs the
        // cell self-join + window (usage: Probe knngraph <sfDir>)
        import org.apache.spark.sql.functions._
        val dir = args(1)
        val e = graft.Tables.embeddings(spark, dir)
          .select(col("vec_id").as("id"),
            graft.functions.VectorFunctions.toDouble(col("embedding")).as("vec"))
        val live = e.withColumn("nrm0",
            graft.functions.VectorFunctions.norm(col("vec")))
          .filter(col("nrm0") > 0)
        val n = live.count()
        val nCells = math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt)
        val t0 = System.nanoTime()
        val cs = sim.Ann.fitCentroids(live, n, nCells, 42L, 100000L)
        val tFit = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        sim.Ann.knnGraph(e, k = 5, seed = 42L)
          .write.mode("overwrite").format("noop").save()
        val tAll = (System.nanoTime() - t1) / 1e9
        println(f"[probe] knngraph $dir n=$n nCells=$nCells " +
          f"fit=$tFit%.1f s total=$tAll%.1f s join+window=${tAll - tFit}%.1f s")
        // candidate volume + cell-population skew of the same build —
        // served from the timed fit above (refitting here doubled the
        // probe's own wall time on large dirs; the fit is seeded, so
        // the reused centroids are the ones knnGraph derives anyway)
        import graft.functions.CentroidCells.centroidCells
        val nProbe = math.max(3, math.ceil(math.sqrt(nCells.toDouble)).toInt)
        val cells = live.withColumn("cell",
          element_at(centroidCells(col("vec"), col("nrm0"), cs, 1), 1))
        val pops = cells.groupBy("cell").agg(count(lit(1)).as("m"))
        val probes = live.select(
          explode(centroidCells(col("vec"), col("nrm0"), cs, nProbe)).as("cell"))
        val cand = probes.join(pops, "cell").agg(sum("m")).head().getLong(0)
        val mx = pops.agg(max("m")).head().getLong(0)
        println(s"[probe] knngraph candidates=$cand nProbe=$nProbe maxCell=$mx " +
          s"meanCell=${n / nCells}")
        // which half is slow: the cell join + dot, or the qid window?
        import graft.functions.VectorFunctions.{cosinePrenormed, dot => vdot}
        val cside = cells.select(col("id").as("neighbor_id"),
          col("vec").as("cvec"), col("nrm0").as("cnrm"), col("cell"))
        val qside = live.select(col("id").as("qid"), col("vec").as("qvec"),
            col("nrm0").as("qnrm"))
          .withColumn("cell",
            explode(centroidCells(col("qvec"), col("qnrm"), cs, nProbe)))
        val scored = cside.join(qside, Seq("cell"))
          .filter(col("neighbor_id") =!= col("qid"))
          .withColumn("sim", cosinePrenormed(
            vdot(col("qvec"), col("cvec")), col("qnrm"), col("cnrm")))
        val t2 = System.nanoTime()
        val s = scored.agg(sum("sim")).head().getDouble(0)
        println(f"[probe] knngraph join+dot only: " +
          f"${(System.nanoTime() - t2) / 1e9}%.1f s (simsum=$s%.1f)")
        val plan = sim.Ann.knnGraph(e, k = 5, seed = 42L)
          .queryExecution.executedPlan.toString
        println(s"[probe] knngraph WindowGroupLimit in plan: " +
          plan.contains("WindowGroupLimit"))
        println(plan.split('\n').take(40).mkString("[probe-plan] ",
          "\n[probe-plan] ", ""))
      case _ =>
        // driver-contract smoke: entry() must return rows on sf0.001
        val n = SparkEntry.entry(spark).count()
        println(s"[probe] entry rows: $n")
        require(n > 0, "entry must return rows")
        println(s"[probe] queries: ${SparkEntry.queries.size}, oracles: ${SparkEntry.oracleSql.size}")
        val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
        require(missing.isEmpty, s"oracles without queries: $missing")
    }
    spark.stop()
  }
}
