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
      // Resolve the stale directory from the CATALOG when the table is
      // registered (an external/custom-LOCATION table lives outside the
      // conventional warehouse path); fall back to the conventional
      // <db>.db/<table> layout only when the catalog has no entry.
      val parts = table.split('.')
      val ident = parts.length match {
        case 2 => org.apache.spark.sql.catalyst.TableIdentifier(parts(1), Some(parts(0)))
        case _ => org.apache.spark.sql.catalyst.TableIdentifier(table)
      }
      val catalog = spark.sessionState.catalog
      val location =
        if (catalog.tableExists(ident))
          new org.apache.hadoop.fs.Path(catalog.getTableMetadata(ident).location)
        else {
          val rel =
            if (parts.length == 2) s"${parts(0).toLowerCase}.db/${parts(1).toLowerCase}"
            else table.toLowerCase
          new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"), rel)
        }
      spark.sql(s"DROP TABLE IF EXISTS ${parts.map(p => s"`$p`").mkString(".")}")
      val fs = location.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(location, true)
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
