package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SaveMode}

/** Sinks mirroring the reference's load stage
  * (dags/etl_grammy_spotify.py:305-379: CSV file + `to_sql` replace,
  * plus the cloud-storage artifact upload at :330-357).
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

  /** Publish a final artifact to any Hadoop-FS URI with no-loss
    * replace — the public-knowledge analog of the reference's Drive
    * upload (dags/etl_grammy_spotify.py:330-357): write to a hidden
    * sibling temp dir, move the old artifact aside, rename the new
    * one in, drop the old. Each rename is atomic on HDFS/POSIX, and
    * the PREVIOUS artifact is never deleted before the new one is in
    * place: a crash mid-publish leaves it recoverable under
    * `.name.previous` (readers may see the path briefly absent, never
    * a half-written or lost artifact — HDFS cannot atomically replace
    * a non-empty directory in one rename; on object stores front this
    * with a manifest/versioned prefix). Idempotent: re-publishing
    * replaces. */
  def publish(df: DataFrame, uri: String, format: String = "parquet"): Unit = {
    val target = new Path(uri)
    val fs = target.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val tmp = new Path(target.getParent, s".${target.getName}.inprogress")
    val prev = new Path(target.getParent, s".${target.getName}.previous")
    fs.delete(tmp, true)
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true") // no-op for parquet, header for csv
      .format(format).save(tmp.toString)
    fs.delete(prev, true)
    if (fs.exists(target) && !fs.rename(target, prev))
      throw new java.io.IOException(s"publish: rename $target -> $prev failed")
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(
        s"publish: rename $tmp -> $target failed (previous artifact at $prev)")
    fs.delete(prev, true)
  }

  /** JDBC writer builder (`to_sql(if_exists="replace")` analog),
    * fired against embedded Derby in SourcesSpec. Batched inserts +
    * `truncate` (instead of drop/create) are the options that matter
    * under load. */
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
