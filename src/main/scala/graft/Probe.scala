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
