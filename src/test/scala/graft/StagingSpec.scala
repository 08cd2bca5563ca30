package graft

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

/** The shared-artifact contract for the near-dup graph family: the
  * expensive pair graph and its cluster table are built ONCE per run
  * as `_SUCCESS`-gated staged parquet, and every consumer — d06's
  * output, t23's leakage-safe split, d15's canonical pick — reads the
  * materialized artifact instead of re-deriving the set-sim join
  * (one edge-generation job, not one per consumer).
  */
class StagingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("t23 split consumes the staged cluster artifact; d06 reuses it") {
    StageRoots.reset()
    val split = TrainingDataQueries.t23LeakageSafeSplit(spark, TestSpark.Sf)
    val rows = split.collect()
    assert(rows.length == 500)

    val root = StageRoots.rootFor(TestSpark.Sf)
    assert(new File(s"$root/neardup_pairs/_SUCCESS").exists,
      "pair graph not staged")
    assert(new File(s"$root/dedup_clusters/_SUCCESS").exists,
      "cluster table not staged")

    // constructing t23 again (or d06, d15) must read ONLY the staged
    // parquet for its cluster input — no second edge-generation job.
    // inputFiles proves the scan set: the cluster side of the plan
    // reads from the stage dir, and d06's whole plan reads nothing
    // except the staged artifact.
    val d06Inputs = LlmQueries.d06DedupClusters(spark, TestSpark.Sf).inputFiles
    assert(d06Inputs.nonEmpty &&
      d06Inputs.forall(_.contains("dedup_clusters")),
      s"d06 reads beyond the staged artifact: ${d06Inputs.mkString(",")}")

    val splitInputs = TrainingDataQueries
      .t23LeakageSafeSplit(spark, TestSpark.Sf).inputFiles
    assert(splitInputs.exists(_.contains("dedup_clusters")),
      "t23 does not read the staged cluster artifact")
    assert(!splitInputs.exists(_.contains("neardup_pairs")),
      "t23 re-reads the pair graph — the cluster artifact should suffice")

    // identical output when served from the artifact
    assert(TrainingDataQueries.t23LeakageSafeSplit(spark, TestSpark.Sf)
      .collect().toSeq == rows.toSeq)
  }

  test("q112/q114 drift-panel histogram is staged: second read serves the committed artifact without rewrite") {
    val ks1 = AnalyticsQueries.q112KsFromArtifacts(spark, TestSpark.Sf).collect()
    val art = new File(s"${StageRoots.rootFor(TestSpark.Sf)}/ks_hists")
    assert(new File(art, "_SUCCESS").exists, "histogram artifact not staged")
    def listing(f: File): Set[(String, Long)] = {
      def walk(x: File): Seq[File] =
        if (x.isDirectory) x.listFiles.toSeq.flatMap(walk) else Seq(x)
      walk(f).map(x => (x.getPath, x.lastModified)).toSet
    }
    val snap = listing(art)
    // a second panel read — AND the sibling AUC consumer sharing the
    // artifact — must serve the committed parquet untouched: same
    // files, same mtimes, no re-aggregation of the event log
    val ks2 = AnalyticsQueries.q112KsFromArtifacts(spark, TestSpark.Sf)
    assert(ks2.collect().toSeq == ks1.toSeq)
    assert(ks2.inputFiles.nonEmpty && ks2.inputFiles.forall(_.contains("ks_hists")),
      s"q112 reads beyond the staged artifact: ${ks2.inputFiles.mkString(",")}")
    val auc = AnalyticsQueries.q114AucFromArtifacts(spark, TestSpark.Sf)
    auc.collect()
    assert(auc.inputFiles.nonEmpty && auc.inputFiles.forall(_.contains("ks_hists")),
      s"q114 reads beyond the staged artifact: ${auc.inputFiles.mkString(",")}")
    assert(listing(art) == snap, "staged histogram artifact was rewritten")
  }

  test("drift window split is a parameter: a shifted split moves the whole triad consistently") {
    import spark.implicits._
    // the r11 verdict's item 2: the reference/current boundary must be
    // an argument the queries pin, not a literal buried in the helper —
    // and ONE split definition must serve all three statistics, so a
    // shifted boundary moves KS, AUC and W₁ together (same windows)
    // instead of silently forking one of them
    val art = AnalyticsQueries.ksHistArtifact(spark, TestSpark.Sf)
    def triad(refEnd: String, curStart: String) = {
      val c = AnalyticsQueries.driftWindowCounts(art, refEnd, curStart)
      def m(df: org.apache.spark.sql.DataFrame, stat: String) =
        df.select("event_type", "n_ref", "n_cur", stat)
          .as[(String, Long, Long, Long)].collect()
          .map(r => r._1 -> r).toMap
      (m(AnalyticsQueries.ksFromCounts(c), "ks_ppm"),
        m(AnalyticsQueries.aucFromCounts(c), "auc_ppm"),
        m(AnalyticsQueries.w1FromCounts(c), "w1_centi_cents"))
    }
    val (ks0, auc0, w10) = triad("2024-01-15", "2024-01-16") // canonical
    val (ks1, auc1, w11) = triad("2024-01-10", "2024-01-11") // shifted
    for ((ks, auc, w1) <- Seq((ks0, auc0, w10), (ks1, auc1, w11));
         t <- ks.keys) {
      assert((ks(t)._2, ks(t)._3) == (auc(t)._2, auc(t)._3) &&
        (ks(t)._2, ks(t)._3) == (w1(t)._2, w1(t)._3),
        s"window sizes diverged across the triad for $t")
    }
    // the shifted boundary moved mass from ref to cur for every type…
    ks1.foreach { case (t, (_, nRef, nCur, _)) =>
      assert(nRef < ks0(t)._2 && nCur > ks0(t)._3,
        s"split shift did not move $t's windows")
    }
    // …and every statistic responded somewhere
    assert(ks1.exists { case (t, v) => v._4 != ks0(t)._4 }, "KS blind to the split")
    assert(auc1.exists { case (t, v) => v._4 != auc0(t)._4 }, "AUC blind to the split")
    assert(w11.exists { case (t, v) => v._4 != w10(t)._4 }, "W1 blind to the split")
  }

  test("reset() isolates runs — a fresh root rebuilds from scratch") {
    StageRoots.reset()
    val root = StageRoots.rootFor(TestSpark.Sf)
    assert(!new File(s"$root/neardup_pairs/_SUCCESS").exists)
    // first consumer after reset triggers a fresh build at the new root
    LlmQueries.d04NgramJaccard(spark, TestSpark.Sf).limit(1).collect()
    assert(new File(s"$root/neardup_pairs/_SUCCESS").exists)
  }
}
