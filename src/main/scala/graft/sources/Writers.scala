package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SaveMode}

/** Sinks mirroring the reference's load stage
  * (dags/etl_grammy_spotify.py:305-379: CSV file + `to_sql` replace).
  */
object Writers {

  /** Partitioned parquet — the scale-native sink. `partitionBy` on a
    * low-cardinality column gives partition pruning to every
    * downstream reader; `maxRecordsPerFile` bounds file sizes. */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
              mode: SaveMode = SaveMode.Overwrite,
              maxRecordsPerFile: Long = 5000000L): Unit = {
    val w = df.write.mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** CSV with header (the reference's final artifact shape). */
  def csv(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  /** JDBC writer builder (`to_sql(if_exists="replace")` analog).
    * Returned unfired: no database in this environment. Batched
    * inserts + `truncate` (instead of drop/create) are the options
    * that matter under load. */
  def jdbc(df: DataFrame, url: String, table: String,
           props: Map[String, String] = Map.empty): DataFrameWriter[Row] = {
    val base = df.write.format("jdbc")
      .mode(SaveMode.Overwrite)
      .option("url", url)
      .option("dbtable", table)
      .option("truncate", "true")
      .option("batchsize", "10000")
    props.foldLeft(base) { case (w, (k, v)) => w.option(k, v) }
  }
}
