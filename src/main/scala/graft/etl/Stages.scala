package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Staged checkpoints for multi-hour pipelines — the restart story the
  * reference gets from Airflow task boundaries (extract → transform →
  * load with persisted intermediates, dags/etl_grammy_spotify.py:28-35),
  * without an orchestrator.
  *
  * A stage materializes its DataFrame to parquet exactly once per
  * (root, name): if a prior run already committed the stage (Spark's
  * `_SUCCESS` marker present), the build closure is skipped entirely
  * and the stage is served from disk. A killed 100 TB run therefore
  * resumes at the first uncommitted stage instead of hour zero — and a
  * half-written directory (no `_SUCCESS`) is rebuilt, never trusted.
  *
  * Within one job, staging also acts as a lineage barrier: downstream
  * branches re-read the parquet instead of recomputing the plan (the
  * durable cousin of `localCheckpoint`).
  */
object Stages {

  /** Serve `name` from `root` if committed, else build → write → read
    * back. The returned frame always reads from the materialized
    * parquet, so every consumer shares one copy of the work.
    *
    * Commit protocol (same shape as [[graft.sources.Writers.publish]]):
    * build into a hidden `.name.inprogress` sibling, then rename into
    * place — a single atomic move on HDFS/POSIX. A killed run leaves
    * either the committed directory or only temp debris, never a
    * half-written stage at the final path; concurrent racers can both
    * build, but the loser's rename fails against the winner's committed
    * directory and it serves the winner's output instead of mixing
    * files. (One writer per (root, name) is still the intended
    * deployment — the race tolerance is a safety net, not a scheduler.) */
  /** Abandoned temp dirs younger than this are left alone by the
    * winner's sweep: a CONCURRENT racer's build dir is live and
    * actively written — deleting it would fail the racer's parquet
    * job with task errors instead of the documented "loser serves the
    * winner's output". Debris from genuinely killed runs ages past
    * this and gets cleaned by the next winner. */
  private val SweepMinAgeMs: Long = 24L * 60 * 60 * 1000

  /** `partitionCols`: written with `partitionBy` so consumers prune on
    * the partition axis (the day-partitioned drift histograms) —
    * commit protocol unchanged (partitioned writes still emit one
    * root-level `_SUCCESS`). */
  def stage(spark: SparkSession, root: String, name: String,
            partitionCols: Seq[String] = Nil)
           (build: => DataFrame): DataFrame = {
    val dir = new Path(root, name)
    val success = new Path(dir, "_SUCCESS")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(success)) {
      // stale half-written debris from a pre-rename-protocol run:
      // re-check the commit marker immediately before deleting so the
      // window in which a racer's just-committed stage could be hit
      // is as small as the filesystem allows (one writer per
      // (root, name) is the intended deployment; races are tolerated,
      // not scheduled)
      if (fs.exists(dir) && !fs.exists(success)) fs.delete(dir, true)
      val tmp = new Path(root, s".$name.inprogress-${java.util.UUID.randomUUID}")
      try {
        val w = build.write
        (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
          .parquet(tmp.toString)
        // rename only while the target is absent: Hadoop rename ONTO an
        // existing directory does not fail — it nests tmp inside it (and
        // reports success), which would silently duplicate the stage
        var committed = !fs.exists(dir) && fs.rename(tmp, dir)
        if (committed && fs.exists(new Path(dir, tmp.getName))) {
          // lost the exists→rename race: a winner committed in between and
          // our rename nested tmp inside their stage — undo and defer
          fs.delete(new Path(dir, tmp.getName), true)
          committed = false
        }
        if (committed) {
          // winner sweeps temp dirs abandoned by KILLED runs — never a
          // concurrent racer's live build (age gate, see SweepMinAgeMs;
          // our own tmp is already gone via the rename). "Now" comes
          // from the FILESYSTEM's clock (mtime of a freshly-touched
          // marker), not the driver's: on object stores or skewed
          // hosts, System.currentTimeMillis() would silently shrink
          // the 24h margin and could sweep a live racer's tmp.
          val clockMarker = new Path(root,
            s".$name.sweepclock-${java.util.UUID.randomUUID}")
          val fsNow =
            try {
              fs.create(clockMarker, true).close()
              fs.getFileStatus(clockMarker).getModificationTime
            } finally fs.delete(clockMarker, false)
          val cutoff = fsNow - SweepMinAgeMs
          Option(fs.globStatus(new Path(root, s".$name.inprogress-*")))
            .foreach(_.filter(_.getModificationTime < cutoff)
              .foreach(st => fs.delete(st.getPath, true)))
        } else {
          // another writer committed first (or the rename failed): keep
          // their stage if it's complete, otherwise surface the failure
          fs.delete(tmp, true)
          if (!fs.exists(success))
            throw new java.io.IOException(s"stage commit failed: $tmp -> $dir")
        }
      } catch {
        case e: Exception =>
          // the build itself can die because an (old-protocol) winner
          // swept our live tmp — if a committed stage exists by now,
          // serving it IS the documented loser behavior; otherwise the
          // failure is real
          fs.delete(tmp, true)
          if (!fs.exists(success)) throw e
      }
    }
    spark.read.parquet(dir.toString)
  }

  /** Drop a committed stage so the next run rebuilds it (e.g. after a
    * code change that invalidates the intermediate). */
  def invalidate(spark: SparkSession, root: String, name: String): Unit = {
    val dir = new Path(root, name)
    dir.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(dir, true)
  }

  /** Order- and partitioning-independent content digest of a frame —
    * the staleness key for [[stageDurable]]. Commutative combine
    * (count + bit_xor of per-row xxhash64 over ALL columns), so the
    * digest is a one-scan map-side-combinable aggregate that never
    * depends on physical layout; any one-row change, insert, or delete
    * flips it (the count term also catches the xor-cancelling case of
    * inserting an existing row twice). This is a change DETECTOR for
    * cache invalidation, not a cryptographic commitment. */
  def contentDigest(df: DataFrame): String = {
    import org.apache.spark.sql.functions._
    val row = df
      .select(xxhash64(df.columns.map(col).toSeq: _*).as("h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x"))
      .head()
    f"${row.getLong(0)}%x-${row.getLong(1)}%016x"
  }

  /** [[stage]] with a content-digest staleness guard for CROSS-RUN
    * reuse on a durable root (the per-JVM [[graft.StageRoots]] policy
    * trades reuse for freshness; this trades nothing): the digest of
    * the stage's INPUT corpus is part of the stage directory name, so
    * an unchanged corpus is served from the committed artifact of any
    * previous run, while a corpus change — one doc edited, added or
    * dropped — addresses a directory that does not exist yet and
    * rebuilds. A stale artifact can never be served by construction;
    * there is no mtime heuristic to race.
    *
    * Superseded digests (committed siblings of the same stage under an
    * older corpus digest) are swept once they age past the same 24 h
    * gate the in-progress sweep uses — old enough that no live run
    * still holds a reader over them. */
  def stageDurable(spark: SparkSession, root: String, name: String,
                   digest: String, partitionCols: Seq[String] = Nil)
                  (build: => DataFrame): DataFrame = {
    require(!digest.isEmpty && digest.matches("[A-Za-z0-9_-]+"),
      s"digest must be a path-safe token: '$digest'")
    val out = stage(spark, root, s"$name-$digest", partitionCols)(build)
    try {
      val rootPath = new Path(root)
      val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val clockMarker = new Path(root,
        s".$name.sweepclock-${java.util.UUID.randomUUID}")
      val fsNow =
        try {
          fs.create(clockMarker, true).close()
          fs.getFileStatus(clockMarker).getModificationTime
        } finally fs.delete(clockMarker, false)
      val cutoff = fsNow - SweepMinAgeMs
      Option(fs.globStatus(new Path(root, s"$name-*")))
        .foreach(_.filter { st =>
          st.getPath.getName != s"$name-$digest" &&
            st.getModificationTime < cutoff
        }.foreach(st => fs.delete(st.getPath, true)))
    } catch { case scala.util.control.NonFatal(_) => () } // sweep is best-effort
    out
  }
}
