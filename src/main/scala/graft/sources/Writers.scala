package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

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

  /** Small-file compaction — the OPTIMIZE analog for plain parquet
    * tables. Streaming sinks and fine-grained partitioned writes
    * accumulate files far below the scan sweet spot; at 100 TB the
    * scan's task count and the listing cost are proportional to FILE
    * COUNT, so periodic compaction to ~targetFileBytes files is table
    * maintenance, not an optimization. The table is read, coalesced
    * to ⌈bytes/target⌉ output partitions, fully materialized into a
    * hidden sibling dir, and swapped in via the same no-loss rename
    * protocol as [[publish]] — readers never observe a half-compacted
    * table, and the previous layout survives at `.name.previous`
    * until the swap completes. With `partitionBy`, rows are
    * hash-distributed on the partition columns so each partition dir
    * compacts to one file per value (sizes then follow value skew —
    * split hot partitions upstream). Returns (filesBefore,
    * filesAfter) for maintenance-job observability. */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024,
              partitionBy: Seq[String] = Nil): (Int, Int) = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: Path): Seq[FileStatus] = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[FileStatus]
      while (it.hasNext) {
        val st = it.next()
        val n = st.getPath.getName
        if (st.isFile && !n.startsWith("_") && !n.startsWith(".")) buf += st
      }
      buf.toSeq
    }
    val before = dataFiles(target)
    val nOut = math.max(1,
      math.ceil(before.map(_.getLen).sum.toDouble / targetFileBytes).toInt)
    val df0 = spark.read.parquet(path)
    val df = if (partitionBy.nonEmpty) df0.repartition(nOut, partitionBy.map(col): _*)
             else df0.repartition(nOut)
    val tmp = new Path(target.getParent, s".${target.getName}.compact-inprogress")
    val prev = new Path(target.getParent, s".${target.getName}.previous")
    fs.delete(tmp, true)
    parquet(df, tmp.toString, partitionBy) // materialized BEFORE any rename
    fs.delete(prev, true)
    if (fs.exists(target) && !fs.rename(target, prev))
      throw new java.io.IOException(s"compact: rename $target -> $prev failed")
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(
        s"compact: rename $tmp -> $target failed (previous layout at $prev)")
    fs.delete(prev, true)
    (before.size, dataFiles(target).size)
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
