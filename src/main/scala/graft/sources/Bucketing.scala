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
    val w = df.write.mode(mode).bucketBy(nBuckets, bucketCol)
    (if (sorted) w.sortBy(bucketCol) else w).saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
