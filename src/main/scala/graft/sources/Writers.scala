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

  /** Partition-level backfill — overwrite ONLY the partitions present
    * in `df`, leaving every other partition of the table untouched
    * (Spark's dynamic partitionOverwriteMode, scoped to this one
    * write instead of mutating session config). This is the
    * production backfill story at 100 TB: re-running one bad day of
    * an events table must never clobber the other 3649 days, and
    * static-mode `Overwrite` does exactly that clobbering. The write
    * commits per-partition through the normal FileOutputCommitter
    * protocol, so a crashed backfill leaves untouched partitions
    * intact and re-running it is idempotent. */
  def overwritePartitions(df: DataFrame, path: String,
                          partitionBy: Seq[String],
                          maxRecordsPerFile: Long = 5000000L): Unit = {
    require(partitionBy.nonEmpty, "overwritePartitions needs partition columns")
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .partitionBy(partitionBy: _*)
      .parquet(path)
  }

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

  /** #240: deterministic sharded corpus export — materialize a shard
    * plan ([[graft.TrainingDataQueries.t39ShardPlan]]'s shape: `shard`
    * + `seq` + `doc_id` + `n_tok` + payload columns) as a
    * shard-partitioned parquet table WITH a per-shard `_manifest`:
    * (shard, n_docs, n_tokens, content_md5), where content_md5 chains
    * the docs' text digests in `seq` order — the checkable receipt a
    * training job verifies before (and audits after) consuming a
    * shard, and the unit of retry when one transfer corrupts. The
    * manifest lives INSIDE the artifact under the `_`-prefix (invisible
    * to Spark's file index, travels with the data), and the whole
    * artifact swaps in via [[publish]]'s no-loss rename protocol —
    * re-export is idempotent, readers never see data without its
    * manifest. Per-shard digest state is bounded by the token budget
    * (a configuration constant), so the collect inside the manifest
    * aggregate is shard-sized however large the corpus. Returns
    * (nShards, nDocs). */
  def writeShards(plan: DataFrame, dir: String): (Long, Long) = {
    import org.apache.spark.sql.functions._
    val spark = plan.sparkSession
    val target = new Path(dir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(target.getParent, s".${target.getName}.inprogress")
    val prev = new Path(target.getParent, s".${target.getName}.previous")
    fs.delete(tmp, true)
    plan.repartition(col("shard")).sortWithinPartitions("seq")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard").parquet(tmp.toString)
    // manifest from the WRITTEN files — it certifies what landed, not
    // what was asked for. The explicit schema keeps a ZERO-row plan
    // sound: a partitioned write of an empty frame lands only
    // _SUCCESS, and a schema-less read of that directory cannot infer
    // one (an empty split must publish an empty-but-readable
    // artifact, not abort the export after siblings already swapped)
    val written = spark.read.schema(plan.schema).parquet(tmp.toString)
    val manifest = written
      .withColumn("__h", md5(col("text").cast("binary")))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        md5(concat_ws("",
          transform(array_sort(collect_list(struct(col("seq"), col("__h")))),
            x => x.getField("__h"))).cast("binary")).as("content_md5"))
    manifest.repartition(1).write.mode(SaveMode.Overwrite)
      .parquet(new Path(tmp, "_manifest").toString)
    val (nShards, nDocs) = {
      // coalesce: sum over an empty manifest is NULL, not 0
      val r = manifest.agg(count(lit(1)),
        coalesce(sum("n_docs"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    fs.delete(prev, true)
    if (fs.exists(target) && !fs.rename(target, prev))
      throw new java.io.IOException(s"writeShards: rename $target -> $prev failed")
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(
        s"writeShards: rename $tmp -> $target failed (previous artifact at $prev)")
    fs.delete(prev, true)
    (nShards, nDocs)
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

  /** Size-aware small-file compaction — rewrites ONLY the small-file
    * tail. [[compact]] rewrites every byte of the table; at 100 TB a
    * maintenance pass that rewrites 100 TB to fix 1% small files is
    * not runnable. This variant walks each leaf directory (per
    * partition dir for partitioned tables), merges just the data
    * files smaller than `minFileBytes` into ~`targetFileBytes` peers,
    * and leaves every large file untouched — bytes rewritten are
    * proportional to the small-file TAIL, not the table.
    *
    * Swap protocol (per directory, no table-root rename — the
    * whole-table-missing window of [[compact]]'s swap does not exist
    * here):
    *   1. merged output of the small files is fully materialized into
    *      a hidden sibling dir;
    *   2. a `_graft_compaction_pending` marker naming the staging dir
    *      (`tmp=` line) and listing the doomed originals is written
    *      into the live dir (underscore-prefixed → invisible to
    *      readers);
    *   3. merged files move in (rename; part-file names are
    *      job-unique);
    *   4. originals are deleted, then the marker, then the staging
    *      dir.
    * A crash never loses rows: before step 2 the originals are intact
    * (tmp dir is garbage); from step 2 on, recovery FIRST completes
    * step 3 from the named staging dir (renames skip files already
    * moved — the r15 fix: deleting the listed originals while their
    * replacements still sat in the hidden staging dir was a
    * loss window) and only then deletes the redundant originals —
    * the next `compactSmallFiles` run (or
    * [[finishPendingCompaction]]) does both in that order.
    * Readers racing step 3–4 can transiently see duplicated rows
    * (bounded by the small tail); strict readers should snapshot via
    * [[publish]] or schedule compaction in a maintenance window —
    * plain parquet directories have no atomic multi-file commit
    * (that's a table format's transaction log).
    *
    * @return (filesRewritten, filesCreated) across all directories
    */
  def compactSmallFiles(spark: SparkSession, path: String,
                        minFileBytes: Long,
                        targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(minFileBytes > 0, s"minFileBytes must be positive: $minFileBytes")
    require(targetFileBytes >= minFileBytes,
      s"targetFileBytes $targetFileBytes < minFileBytes $minFileBytes")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    finishPendingCompaction(spark, path)
    // leaf dirs = parents of data files (partition dirs, or the root)
    val byDir = {
      val it = fs.listFiles(root, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[FileStatus]
      while (it.hasNext) {
        val st = it.next()
        val n = st.getPath.getName
        if (st.isFile && !n.startsWith("_") && !n.startsWith(".")) buf += st
      }
      buf.toSeq.groupBy(_.getPath.getParent)
    }
    var rewritten = 0; var created = 0
    byDir.foreach { case (dir, files) =>
      val smalls = files.filter(_.getLen < minFileBytes)
      if (smalls.size >= 2) { // one small file alone has no merge peer
        val smallBytes = smalls.map(_.getLen).sum
        val nOut = math.max(1, math.ceil(smallBytes.toDouble / targetFileBytes).toInt)
        val tmp = new Path(dir.getParent, s".${dir.getName}.compact-small-inprogress")
        fs.delete(tmp, true)
        // coalesce, not repartition: merging needs no shuffle
        spark.read.parquet(smalls.map(_.getPath.toString): _*)
          .coalesce(nOut)
          .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        val merged = fs.listStatus(tmp).filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        val marker = new Path(dir, "_graft_compaction_pending")
        val out = fs.create(marker, true)
        out.write((s"tmp=${tmp.getName}" +: smalls.map(_.getPath.getName))
          .mkString("\n").getBytes("UTF-8"))
        out.close()
        merged.foreach { st =>
          if (!fs.rename(st.getPath, new Path(dir, st.getPath.getName)))
            throw new java.io.IOException(
              s"compactSmallFiles: rename ${st.getPath} into $dir failed")
        }
        smalls.foreach(st => fs.delete(st.getPath, false))
        fs.delete(marker, false)
        fs.delete(tmp, true)
        rewritten += smalls.size
        created += merged.length
      }
    }
    (rewritten, created)
  }

  /** Complete any compaction swap interrupted after its commit
    * marker: for every `_graft_compaction_pending` marker under
    * `path`, FIRST move any still-staged merged files in from the
    * marker's named staging dir (renames skip files already moved —
    * without this, deleting the originals while their replacements
    * sat in the hidden staging dir silently lost the small tail's
    * rows in the marker→merge-in crash window), then delete the
    * listed originals that still exist, then the marker and staging
    * dir. Idempotent; called automatically at the start of
    * [[compactSmallFiles]]. Markers from pre-`tmp=` versions (no
    * staging line) behave as before. */
  def finishPendingCompaction(spark: SparkSession, path: String): Int = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    val markers = {
      val it = fs.listFiles(root, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName == "_graft_compaction_pending")
          buf += st.getPath
      }
      buf.toSeq
    }
    markers.foreach { m =>
      val in = fs.open(m)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
                  finally in.close()
      val dir = m.getParent
      val tmp = lines.find(_.startsWith("tmp="))
        .map(l => new Path(dir.getParent, l.stripPrefix("tmp=")))
      tmp.filter(fs.exists).foreach { t =>
        fs.listStatus(t).foreach { st =>
          val n = st.getPath.getName
          if (st.isFile && !n.startsWith("_") && !n.startsWith(".")) {
            val to = new Path(dir, n)
            if (!fs.exists(to) && !fs.rename(st.getPath, to) && !fs.exists(to))
              throw new java.io.IOException(
                s"finishPendingCompaction: rename ${st.getPath} -> $to failed")
          }
        }
      }
      lines.filter(l => l.nonEmpty && !l.startsWith("tmp=")).foreach { n =>
        val doomed = new Path(dir, n)
        if (fs.exists(doomed)) fs.delete(doomed, false)
      }
      fs.delete(m, false)
      tmp.foreach(t => fs.delete(t, true))
    }
    markers.size
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
