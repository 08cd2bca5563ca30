package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables for shuffle-free co-located joins (SURVEY.md §5).
  *
  * Writing both sides of a recurring join bucketed (and sorted) by
  * the join key means every subsequent join is exchange-free: each
  * task reads matching bucket files from both tables. At 100 TB this
  * converts the nightly fact⋈fact join from a full shuffle into a
  * local merge per bucket — the single biggest recurring saving a
  * pipeline can bank.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, sorted: Boolean = true,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    val spark = df.sparkSession
    if (mode == SaveMode.Overwrite) {
      // a previous session's managed-table directory survives in the
      // warehouse while the (in-memory) catalog entry does not;
      // saveAsTable then refuses the non-empty location — drop both.
      // Quote each identifier PART (backticking "db.tbl" whole would
      // target a table literally named "db.tbl"), and mirror the
      // warehouse layout (<db>.db/<table> for qualified names).
      val parts = table.split('.')
      spark.sql(s"DROP TABLE IF EXISTS ${parts.map(p => s"`$p`").mkString(".")}")
      val rel =
        if (parts.length == 2) s"${parts(0).toLowerCase}.db/${parts(1).toLowerCase}"
        else table.toLowerCase
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), rel)
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(wh, true)
    }
    // co-partition the write with the bucket layout: without this,
    // EVERY input task writes a file per bucket it sees (tasks ×
    // nBuckets small files); with it, each task owns one bucket →
    // nBuckets files total and an already-clustered sort
    val w = df.repartition(nBuckets, org.apache.spark.sql.functions.col(bucketCol))
      .write.mode(mode).bucketBy(nBuckets, bucketCol)
    (if (sorted) w.sortBy(bucketCol) else w).saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
