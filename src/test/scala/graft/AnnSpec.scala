package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._
import graft.sim.Ann

class AnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = Tables.embeddings(spark, TestSpark.Sf)
    .select(col("vec_id").as("id"), toDouble(col("embedding")).as("vec"))

  test("brute-force top-k returns k ranked neighbors per query") {
    val r = Ann.bruteForceTopK(emb, emb.filter(col("id") < 4), k = 5)
      .groupBy("qid").agg(count(lit(1)).as("n"), max("rank").as("mx"))
      .as[(Long, Long, Long)].collect()
    assert(r.length == 4 && r.forall(t => t._2 == 5 && t._3 == 5))
  }

  test("brute-force rank-1 neighbor is the true nearest (vs local compute)") {
    val vecs = emb.as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val top1 = Ann.bruteForceTopK(emb, emb.filter(col("id") === 0), k = 1)
      .select("neighbor_id").as[Long].head()
    val expected = vecs.removed(0L).maxBy { case (_, v) => cos(vecs(0L), v) }._1
    assert(top1 == expected)
  }

  test("LSH ANN recall@10 vs brute force is quantified") {
    val brute = Ann.bruteForceTopK(emb, emb.filter(col("id") < 8), k = 10)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    // 16 buckets on a 500-vector corpus → ~30 candidates per query
    val lsh = Ann.lshTopK(emb, emb.filter(col("id") < 8), k = 10, nBits = 4, dim = 64, seed = 7L)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(lsh.nonEmpty)
    val recall = brute.count(lsh).toDouble / brute.size
    // 8-table OR'd sign-LSH: a true neighbor at cos 0.4 shares a
    // bucket in ≥1 table with p ≈ 1 − (1 − 0.63^4)^8 ≈ 0.75; pin the
    // floor at ~0.85× the measured value with this seed so a recall
    // regression in bucketing or scoring trips the suite, not the
    // driver
    info(s"direct LSH recall@10 = $recall")
    assert(recall >= 0.58, s"recall@10 $recall (measured 0.6875 r10)")
  }

  test("multi-table LSH near-dup pairs: exact precision, quantified recall") {
    val truth = emb.toDF("id1v", "v1").join(emb.toDF("id2v", "v2"),
        col("id1v") < col("id2v"))
      .filter(cosinePrenormed(dot(col("v1"), col("v2")),
        sqrt(dot(col("v1"), col("v1"))), sqrt(dot(col("v2"), col("v2")))) >= 0.44)
      .select(col("id1v"), col("id2v")).as[(Long, Long)].collect().toSet
    val found = LlmQueries.d07EmbedNearDupLsh(spark, TestSpark.Sf)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    // every emitted pair is cosine-verified → found ⊆ truth always
    assert(found.subsetOf(truth), s"false positives: ${found.diff(truth)}")
    val recall = truth.count(found).toDouble / truth.size
    // deterministic seed; per-pair miss ≈ (1 − p^4)^24 ≈ 1% at τ=0.44
    assert(recall >= 0.9, s"recall $recall truth=${truth.size} found=${found.size}")
  }

  test("int8-rerank ANN recall@10 vs exact brute force") {
    val brute = Ann.bruteForceTopK(emb, emb.filter(col("id") < 8), k = 10)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val rr = Ann.int8RerankTopK(emb, emb.filter(col("id") < 8), k = 10)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(rr.nonEmpty)
    val recall = brute.count(rr).toDouble / brute.size
    // per-component int8 error ≤ 0.4% of amax; a 3× candidate buffer
    // absorbs approximate-rank inversions near the top-k boundary
    assert(recall >= 0.9, s"recall@10 $recall")
  }

  test("IVF ANN recalls most true neighbors with multi-probe") {
    val brute = Ann.bruteForceTopK(emb, emb.filter(col("id") < 8), k = 10)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Ann.ivfTopK(emb, emb.filter(col("id") < 8), k = 10,
      nCells = 8, nProbe = 3, seed = 42L)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    val recall = brute.count(ivf).toDouble / brute.size
    info(s"fixed 3/8-probe recall@10 = $recall")
    // ~0.85× the measured 0.85 (r10) — 3/8 cells probed
    assert(recall >= 0.72, s"recall $recall (measured 0.85 r10)")
  }

  test("filtered ANN: recall vs exact filtered brute force; beats post-filtering") {
    val embL = Tables.embeddings(spark, TestSpark.Sf)
      .select(col("vec_id").as("id"), toDouble(col("embedding")).as("vec"),
        col("label"))
    val queries = emb.filter(col("id") < 8)
    val kept = embL.filter(col("label") === 3).select("id", "vec")
    // ground truth: exact top-k among ONLY the predicate's survivors
    val brute = Ann.bruteForceTopK(kept, queries, k = 10)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val filtered = Ann.filteredIvfTopKAuto(embL, queries, k = 10,
        pred = col("label") === 3, seed = 42L, recall = 0.9)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    // every result satisfies the predicate (pre-filter, not best-effort)
    val keptIds = kept.select("id").as[Long].collect().toSet
    assert(filtered.forall { case (_, nb) => keptIds(nb) },
      "filtered search returned a vector outside the predicate")
    val recall = brute.count(filtered).toDouble / brute.size
    info(s"filtered ANN recall@10 = $recall")
    assert(recall >= 0.85, s"filtered recall@10 $recall (measured 1.0 r10)")
    // the naive composition: unfiltered calibrated search, THEN filter.
    // With ~1/L selectivity it keeps only the truth rows that happened
    // to rank in the unfiltered top-10 — strictly fewer than the
    // pre-filtered path finds (the reason this operator exists)
    val post = Ann.ivfTopKAuto(embL.select("id", "vec"), queries, k = 10,
        seed = 42L, recall = 0.9)
      .join(kept.select(col("id").as("neighbor_id")), Seq("neighbor_id"), "left_semi")
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    info(s"post-filter finds ${post.size} vs pre-filter ${filtered.size} (truth ${brute.size})")
    assert(post.size < filtered.size,
      s"post-filtering (${post.size}) should trail pre-filtering (${filtered.size})")
  }

  test("index probeFiltered: predicate-pure, recall vs exact filtered brute force") {
    import graft.sim.AnnIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_f").toString
    val embL = Tables.embeddings(spark, TestSpark.Sf)
      .select(col("vec_id").as("id"), toDouble(col("embedding")).as("vec"),
        col("label"))
    AnnIndex.build(embL, nCells = 23, seed = 42L, dir)
    val queries = emb.filter(col("id") < 8)
    val kept = embL.filter(col("label") === 3).select("id", "vec")
    val brute = Ann.bruteForceTopK(kept, queries, k = 10)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = AnnIndex.probeFiltered(spark, dir, queries, k = 10,
        pred = col("label") === 3)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val keptIds = kept.select("id").as[Long].collect().toSet
    assert(got.forall { case (_, nb) => keptIds(nb) },
      "filtered probe returned a vector outside the predicate")
    val recall = brute.count(got).toDouble / brute.size
    info(s"index probeFiltered recall@10 = $recall")
    assert(recall >= 0.85,
      s"filtered index recall@10 $recall (measured 1.0 r10)")
    // metadata columns in the cell files don't disturb the plain probe
    val plain = AnnIndex.probe(spark, dir, queries, k = 10)
    assert(plain.count() == 8 * 10)
  }

  test("MMR: lambda=1 reduces to plain top-k; lower lambda buys measured diversity") {
    val queries = emb.filter(col("id") < 8)
    val plain = Ann.bruteForceTopK(emb, queries, k = 10)
      .select("qid", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    // the correctness anchor: with no redundancy penalty the greedy IS
    // the relevance sort — ranks and ids must match exactly
    val atOne = Ann.mmrTopK(emb, queries, k = 10, fetchK = 30, lambda = 1.0)
      .as[(Long, Long, Long)].collect().toSet
    assert(atOne == plain, "MMR at lambda=1 diverged from plain top-k")

    val mmr = Ann.mmrTopK(emb, queries, k = 10, fetchK = 30, lambda = 0.7)
      .as[(Long, Long, Long)].collect()
    assert(mmr.groupBy(_._1).forall(_._2.length == 10))
    // rank 1 is always the most relevant candidate (sel starts empty)
    val top1 = mmr.filter(_._2 == 1L).map(t => (t._1, t._3)).toSet
    val plainTop1 = plain.filter(_._2 == 1L).map(t => (t._1, t._3))
    assert(top1 == plainTop1, "MMR rank-1 != most relevant")

    // diversity: mean pairwise cosine within each query's selected set
    // must drop vs the plain top-k (the reason the operator exists)
    val vecs = emb.as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def meanPairSim(sel: Map[Long, Array[Long]]): Double = {
      val sims = sel.values.flatMap { ids =>
        for (i <- ids.indices; j <- ids.indices if i < j)
          yield cos(vecs(ids(i)), vecs(ids(j)))
      }
      sims.sum / sims.size
    }
    val simPlain = meanPairSim(
      plain.toArray.groupBy(_._1).view.mapValues(_.map(_._3)).toMap)
    val simMmr = meanPairSim(mmr.groupBy(_._1).view.mapValues(_.map(_._3)).toMap)
    info(f"mean pairwise sim: plain=$simPlain%.4f mmr=$simMmr%.4f")
    assert(simMmr < simPlain,
      f"MMR did not diversify: $simMmr%.4f >= $simPlain%.4f")
  }

  test("index probeMmr: lambda=1 equals the calibrated index probe top-k") {
    import graft.sim.AnnIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_mmr").toString
    AnnIndex.build(emb, nCells = 23, seed = 42L, dir)
    val queries = emb.filter(col("id") < 8)
    val plain = AnnIndex.probe(spark, dir, queries, k = 10)
      .as[(Long, Long, Long)].collect().toSet
    val atOne = AnnIndex.probeMmr(spark, dir, queries, k = 10, fetchK = 30,
        lambda = 1.0)
      .as[(Long, Long, Long)].collect().toSet
    assert(atOne == plain, "index MMR at lambda=1 diverged from index probe")
    val mmr = AnnIndex.probeMmr(spark, dir, queries, k = 10, fetchK = 30,
      lambda = 0.7)
    assert(mmr.count() == 8 * 10)
  }

  test("probeSweep: recall monotone in probes, full probe hits 1.0") {
    import graft.sim.AnnIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_sw").toString
    AnnIndex.build(emb, nCells = 23, seed = 42L, dir)
    val sweep = AnnIndex.probeSweep(spark, dir, k = 10, sampleMod = 25)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    info(sweep.map { case (p, r, _) => s"$p probes -> ${r / 10000.0}%" }
      .mkString(", "))
    assert(sweep.nonEmpty && sweep.forall(_._3 == 23L))
    // recall never decreases as the probe budget grows
    sweep.sliding(2).foreach {
      case Seq((p1, r1, _), (p2, r2, _)) =>
        assert(r2 >= r1, s"recall fell $r1 -> $r2 from $p1 -> $p2 probes")
      case _ =>
    }
    // probing every cell IS brute force
    assert(sweep.last._1 == 23L && sweep.last._2 == 1000000L,
      s"full probe recall ${sweep.last._2} != 1.0")
  }

  test("mmrSweep: relevance falls and diversity rises monotonically as lambda drops") {
    val sweep = Ann.mmrSweep(emb, emb.filter(col("id") < 8), k = 10, fetchK = 30)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(-_._1)
    info(sweep.map { case (l, r, s) =>
      s"λ=${l / 1000.0}: rel=${r / 1000.0} sim=${s / 1000.0}" }.mkString(", "))
    assert(sweep.map(_._1) == Seq(1000L, 700L, 500L, 300L))
    // directional contract (1-milli tolerance for the rounding step):
    // pushing λ down never buys relevance and never loses diversity
    sweep.sliding(2).foreach {
      case Seq((_, r1, s1), (_, r2, s2)) =>
        assert(r2 <= r1 + 1, s"relevance rose as lambda fell: $r1 -> $r2")
        assert(s2 <= s1 + 1, s"pairwise sim rose as lambda fell: $s1 -> $s2")
      case _ =>
    }
    // the λ=1 anchor IS the plain top-k's mean relevance
    val plain = Ann.bruteForceTopK(emb, emb.filter(col("id") < 8), k = 10)
    val rels = plain.join(
        emb.select(col("id").as("neighbor_id"), col("vec").as("nvec")),
        "neighbor_id")
      .join(emb.select(col("id").as("qid"), col("vec").as("qvec")), "qid")
      .select((dot(col("qvec"), col("nvec")) /
        (sqrt(dot(col("qvec"), col("qvec"))) * sqrt(dot(col("nvec"), col("nvec")))))
        .as("rel"))
      .as[Double].collect()
    val want = math.round(rels.sum / rels.length * 1000)
    assert(sweep.head._2 == want, s"λ=1 rel ${sweep.head._2} != top-k mean $want")
  }

  test("index probeMmrSweep: lambda=1 anchors to the index probe; directional contract holds") {
    import graft.sim.AnnIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_msw").toString
    AnnIndex.build(emb, nCells = 23, seed = 42L, dir)
    val queries = emb.filter(col("id") < 8)
    val sweep = AnnIndex.probeMmrSweep(spark, dir, queries, k = 10, fetchK = 30)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(-_._1)
    info(sweep.map { case (l, r, s) =>
      s"λ=${l / 1000.0}: rel=${r / 1000.0} sim=${s / 1000.0}" }.mkString(", "))
    assert(sweep.map(_._1) == Seq(1000L, 700L, 500L, 300L))
    // same directional contract as the brute-candidate sweep (1-milli
    // rounding tolerance): λ down never buys relevance, never loses
    // diversity
    sweep.sliding(2).foreach {
      case Seq((_, r1, s1), (_, r2, s2)) =>
        assert(r2 <= r1 + 1, s"relevance rose as lambda fell: $r1 -> $r2")
        assert(s2 <= s1 + 1, s"pairwise sim rose as lambda fell: $s1 -> $s2")
      case _ =>
    }
    // the λ=1 anchor IS the plain index probe's mean relevance at
    // k=10 — the serving path inherits MMR's correctness anchor
    val plain = AnnIndex.probe(spark, dir, queries, k = 10)
    val rels = plain.join(
        emb.select(col("id").as("neighbor_id"), col("vec").as("nvec")),
        "neighbor_id")
      .join(emb.select(col("id").as("qid"), col("vec").as("qvec")), "qid")
      .select((dot(col("qvec"), col("nvec")) /
        (sqrt(dot(col("qvec"), col("qvec"))) * sqrt(dot(col("nvec"), col("nvec")))))
        .as("rel"))
      .as[Double].collect()
    val want = math.round(rels.sum / rels.length * 1000)
    assert(sweep.head._2 == want,
      s"λ=1 rel ${sweep.head._2} != index probe mean $want")
  }

  test("index stats: health panel matches direct computation; append and dead cells reflected") {
    import graft.sim.AnnIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_st").toString
    AnnIndex.build(emb, nCells = 23, seed = 42L, dir)
    def panel() = AnnIndex.stats(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    val (nCells, nPop, nVec, minC, p50C, maxC, imb) = panel()
    // direct recompute from the cell files + centroid table
    val per = spark.read.parquet(s"$dir/cells").groupBy("cell").count()
      .select("count").as[Long].collect().sorted
    assert(nCells == 23L && nPop == per.length && nVec == per.sum)
    assert(maxC == per.last && minC <= p50C && p50C <= maxC)
    assert(imb == maxC * 1000 * nCells / nVec && imb >= 1000,
      s"imbalance $imb inconsistent (max $maxC, cells $nCells, n $nVec)")
    // append grows the vector count without touching the cell count
    AnnIndex.append(
      emb.select((col("id") + 500000L).as("id"), col("vec")), dir)
    val (nCells2, nPop2, nVec2, _, _, _, _) = panel()
    assert(nCells2 == nCells && nPop2 == nPop && nVec2 == 2 * nVec,
      s"append not reflected: $nVec -> $nVec2, cells $nCells -> $nCells2")
    // dead cells must surface: drop one populated cell's partition —
    // the census must still count it (from the centroid table), with
    // min_cell falling to 0 and imbalance priced over the TRUE mean
    val someCell = spark.read.parquet(s"$dir/cells")
      .select("cell").distinct().as[Int].collect().min
    val cellDir = new java.io.File(s"$dir/cells/cell=$someCell")
    assert(cellDir.isDirectory, s"expected partition dir $cellDir")
    cellDir.listFiles().foreach(_.delete()); cellDir.delete()
    val (nCells3, nPop3, nVec3, min3, _, max3, imb3) = panel()
    assert(nCells3 == nCells && nPop3 == nPop - 1 && nVec3 < nVec2)
    assert(min3 == 0L, s"dead cell invisible: min_cell $min3")
    assert(imb3 == max3 * 1000 * nCells / nVec3,
      "imbalance must use the TRUE cell count, not the populated one")
  }

  test("probesForRecall calibration: derived nProbe meets its recall target") {
    // the round-8 fix for the one quality-weak component: instead of a
    // fixed nProbe, solve the probe budget from a recall target against
    // the MEASURED cell geometry (tablesForRecall's data-adaptive twin)
    // and verify the resulting operating point actually delivers it
    val brute = Ann.bruteForceTopK(emb, emb.filter(col("id") < 8), k = 10)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Ann.ivfTopKAuto(emb, emb.filter(col("id") < 8), k = 10,
      seed = 42L, recall = 0.9)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.count(ivf).toDouble / brute.size
    info(s"calibrated ivfTopKAuto(recall=0.9) recall@10 = $recall")
    assert(recall >= 0.8, s"calibrated recall@10 $recall below 0.8")
    // monotone in the target: asking for more recall never probes less
    val live = emb.withColumn("nrm0", sqrt(dot(col("vec"), col("vec"))))
      .filter(col("nrm0") > 0)
    val n = live.count()
    val cents = Ann.fitCentroids(live, n, nCells = 23, seed = 42L,
      fitSampleCap = 100000L)
    val sample = Ann.calibrationSample(live, n)
    val p50 = Ann.probesForRecall(sample, cents, recall = 0.5, kCal = 10)
    val p90 = Ann.probesForRecall(sample, cents, recall = 0.9, kCal = 10)
    val p99 = Ann.probesForRecall(sample, cents, recall = 0.99, kCal = 10)
    info(s"derived nProbe at R=0.5/0.9/0.99 over 23 cells: $p50/$p90/$p99")
    assert(p50 <= p90 && p90 <= p99, s"$p50/$p90/$p99 not monotone")
    assert(p99 <= 23, "probe count must never exceed the cell count")
  }

  test("persisted IVF index probes identically to the in-memory IVF path") {
    import graft.sim.AnnIndex
    val dir = java.nio.file.Files.createTempDirectory("ann_idx").toString
    AnnIndex.build(emb, nCells = 8, seed = 42L, dir = dir)
    val probed = AnnIndex.probe(spark, dir, emb.filter(col("id") < 8),
        k = 10, nProbe = 3)
      .as[(Long, Long, Long)].collect().toSet
    val direct = Ann.ivfTopK(emb, emb.filter(col("id") < 8), k = 10,
        nCells = 8, nProbe = 3, seed = 42L)
      .as[(Long, Long, Long)].collect().toSet
    assert(probed.nonEmpty && probed == direct,
      s"persisted-index probe diverged: ${probed.diff(direct).take(3)} vs ${direct.diff(probed).take(3)}")
    // the on-disk layout is cell-partitioned — the prunable unit a
    // probe's nProbe/nCells scan fraction comes from
    val cellDirs = new java.io.File(s"$dir/cells").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.length == 8, cellDirs.map(_.getName).mkString(","))
  }

  test("persisted index default probe runs at the build-time calibrated operating point") {
    import graft.sim.AnnIndex
    val dir = java.nio.file.Files.createTempDirectory("ann_cal").toString
    AnnIndex.build(emb, nCells = 23, seed = 42L, dir = dir, recall = 0.9)
    // the calibration is persisted beside the centroids
    val meta = spark.read.parquet(s"$dir/meta")
      .select("recall_target", "n_probe").head()
    val storedProbe = meta.getInt(1)
    assert(meta.getDouble(0) == 0.9 && storedProbe >= 3 && storedProbe <= 23)
    info(s"stored calibrated n_probe = $storedProbe over 23 cells")
    // default probe == explicit probe at the stored operating point
    val deflt = AnnIndex.probe(spark, dir, emb.filter(col("id") < 8), k = 10)
      .as[(Long, Long, Long)].collect().toSet
    val explicit = AnnIndex.probe(spark, dir, emb.filter(col("id") < 8),
        k = 10, nProbe = storedProbe)
      .as[(Long, Long, Long)].collect().toSet
    assert(deflt == explicit)
    // and it actually delivers near the certified recall
    val brute = Ann.bruteForceTopK(emb, emb.filter(col("id") < 8), k = 10)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = deflt.map { case (q, _, nb) => (q, nb) }
    val recall = brute.count(got).toDouble / brute.size
    info(s"calibrated index probe recall@10 = $recall")
    assert(recall >= 0.8, s"recall $recall")
  }

  test("index append: new vectors are findable without a refit, no torn cells") {
    import graft.sim.AnnIndex
    val dir = java.nio.file.Files.createTempDirectory("ann_app").toString
    val half1 = emb.filter(col("id") % 2 === 0)
    val half2 = emb.filter(col("id") % 2 === 1)
    AnnIndex.build(half1, nCells = 8, seed = 42L, dir = dir)
    AnnIndex.append(half2, dir)
    val cells = spark.read.parquet(s"$dir/cells")
    assert(cells.count() == emb.count(), "append lost or duplicated rows")
    assert(cells.select("id").distinct().count() == cells.count())
    // an appended vector probed under a fresh qid must find itself at
    // rank 1 (same centroids assign the identical vector to the same
    // cell, and nothing scores above cosine 1)
    val probeQ = emb.filter(col("id").isin(1L, 3L, 5L))
      .withColumn("id", col("id") + 1000000L)
    val r = AnnIndex.probe(spark, dir, probeQ, k = 1, nProbe = 1)
      .as[(Long, Long, Long)].collect()
    assert(r.length == 3, r.mkString(","))
    r.foreach { case (qid, _, nid) =>
      assert(nid == qid - 1000000L, s"query $qid found $nid, not itself") }
  }

  test("index maintenance: healthy audit is a no-op; a tripped floor rebuilds and recalibrates") {
    import graft.sim.AnnIndex
    val dir = java.nio.file.Files.createTempDirectory("ann_maint").toString
    AnnIndex.build(emb, nCells = 23, seed = 42L, dir = dir, recall = 0.9)
    val queries = emb.filter(col("id") < 8)
    val probe0 = AnnIndex.probe(spark, dir, queries, k = 10)
      .as[(Long, Long, Long)].collect().toSet
    // a freshly calibrated index passes its own stored target → no-op
    val (r1, rebuilt1) = AnnIndex.maintain(spark, dir)
    assert(!rebuilt1, s"healthy index rebuilt (recall $r1)")
    assert(r1 >= 800000L, s"audit recall $r1 below calibration neighborhood")
    val probe1 = AnnIndex.probe(spark, dir, queries, k = 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(probe1 == probe0, "no-op maintenance changed probe results")
    // an unattainable floor trips the decision: the audit value is the
    // SAME measurement, and the action path refits + recalibrates
    val (r2, rebuilt2) = AnnIndex.maintain(spark, dir, floorPpm = 1000001L)
    assert(rebuilt2 && r2 == r1, s"forced pass: recall $r2 vs $r1, rebuilt $rebuilt2")
    // rebuilt meta reflects the CURRENT corpus (√n cells, fresh probe
    // calibration at the stored target), and the index still serves
    val meta = spark.read.parquet(s"$dir/meta")
      .select("recall_target", "n", "n_cells").as[(Double, Long, Int)].head()
    val n = emb.withColumn("nrm", norm(col("vec"))).filter(col("nrm") > 0).count()
    assert(meta._1 == 0.9 && meta._2 == n, s"meta $meta vs n=$n")
    assert(meta._3 == math.max(2, math.ceil(math.sqrt(n.toDouble)).toInt))
    val (r3, rebuilt3) = AnnIndex.maintain(spark, dir)
    assert(!rebuilt3 && r3 >= 800000L, s"rebuilt index audit $r3")
  }

  test("index compaction merges appended segments; probes are unchanged") {
    import graft.sim.AnnIndex
    val dir = java.nio.file.Files.createTempDirectory("ann_cmp").toString
    AnnIndex.build(emb.filter(col("id") % 4 === 0), nCells = 8, seed = 42L, dir = dir)
    // three append batches → ≥ 3 segment files per touched cell
    (1 to 3).foreach(m => AnnIndex.append(emb.filter(col("id") % 4 === m), dir))
    def dataFiles(): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (!f.getName.startsWith("_") && !f.getName.startsWith(".")) Seq(f)
        else Nil
      walk(new java.io.File(s"$dir/cells"))
    }
    val before = dataFiles()
    val queries = emb.filter(col("id") < 8)
    val probeBefore = AnnIndex.probe(spark, dir, queries, k = 10)
      .as[(Long, Long, Long)].collect().toSet
    val (rewritten, created) = AnnIndex.compact(spark, dir)
    val after = dataFiles()
    // every append-fragmented cell collapses to fewer, larger files
    assert(rewritten > 0 && created < rewritten, s"rewrote $rewritten into $created")
    assert(after.size < before.size, s"files ${before.size} -> ${after.size}")
    // cell partition values survive (pruned probes still resolve), and
    // the probe result is IDENTICAL — compaction moves bytes, not rows
    val probeAfter = AnnIndex.probe(spark, dir, queries, k = 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(probeAfter == probeBefore, "compaction changed probe results")
    // idempotent: a second pass finds nothing left to merge
    val (r2, _) = AnnIndex.compact(spark, dir)
    assert(r2 == 0, s"second compaction rewrote $r2 files")
  }

  test("PQ ANN (s06) recall@10 vs brute force is quantified") {
    val brute = LlmQueries.s01AnnBruteForce(spark, TestSpark.Sf)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = LlmQueries.s06AnnPq(spark, TestSpark.Sf)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(pq.nonEmpty)
    // 16 centroids per 8-dim subspace is a coarse quantizer; the 8×
    // candidate buffer + exact rerank restores most of the true top-10
    val recall = brute.count(pq).toDouble / brute.size
    info(s"s06 recall@10 = $recall")
    assert(recall >= 0.62, s"s06 recall@10 $recall (measured 0.7375 r10)")
  }

  test("IVF-PQ ANN (s07) recall@10 vs brute force is quantified") {
    val brute = LlmQueries.s01AnnBruteForce(spark, TestSpark.Sf)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivfpq = LlmQueries.s07AnnIvfPq(spark, TestSpark.Sf)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivfpq.nonEmpty)
    // compounded approximation (IVF coverage × residual-PQ ordering):
    // round 8: nProbe + candMult are calibrated from the fit sample
    // against a 0.9 overall recall target (√0.9 per stage); measured
    // 0.9125 at sf0.001 — the floor leaves slack for codebook drift
    // under testdata regeneration, not for a return to the old 0.475
    // operating point
    val recall = brute.count(ivfpq).toDouble / brute.size
    info(s"s07 recall@10 = $recall")
    assert(recall >= 0.77, s"s07 recall@10 $recall (measured 0.9125 r10)")
  }

  test("SemDeDup (d13): kept set is pairwise non-dup per cell; drop recall quantified") {
    val tau = 0.44
    val flags = graft.sim.SemDeDup
      .dedupFlags(emb.select(col("id").as("vec_id"), col("vec").as("v")),
        "vec_id", "v", tau = tau, seed = 0xd13L)
      .as[(Long, Seq[Long], Boolean)].collect()
    val vecs = emb.as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // invariant (exact, by construction): two kept vectors
    // co-clustered in ANY table are never near-duplicates
    val keptRows = flags.filter(_._3)
    val nTables = flags.head._2.length
    for {
      t <- 0 until nTables
      (cell, rows) <- keptRows.groupBy(_._2(t))
      Array(x, y) <- rows.map(_._1).sorted.combinations(2)
    } assert(cos(vecs(x), vecs(y)) < tau, s"kept near-dup pair ($x,$y) in table $t cell $cell")
    // approximation (quantified): how many exact global near-dup pairs
    // were visible (co-clustered in ≥1 table)? Boundary-split pairs
    // are the miss; OR-ing tables compounds per-table recall.
    val cellsOf = flags.map(f => f._1 -> f._2).toMap
    val ids = vecs.keys.toSeq.sorted
    val truePairs = for {
      i <- ids; j <- ids if i < j && cos(vecs(i), vecs(j)) >= tau
    } yield (i, j)
    assert(truePairs.nonEmpty)
    val seen = truePairs.count { case (i, j) =>
      cellsOf(i).zip(cellsOf(j)).exists { case (a, b) => a == b }
    }
    val recall = seen.toDouble / truePairs.size
    info(s"d13 co-cluster pair recall = $recall (${truePairs.size} true pairs)")
    assert(recall >= 0.6, s"co-cluster recall $recall (measured 0.7 r10)")
  }

  test("s29 hamming ANN: planted duplicate at rank 1, hamming non-decreasing, recall vs s01 quantified") {
    // a planted exact duplicate shares every sign bit -> hamming 0 ->
    // rank 1 under the (hamming, neighbor_id) ordering
    val dupVec = emb.filter(col("id") === 0).select("vec").as[Seq[Double]].head()
    val planted = emb.union(Seq((100000L, dupVec)).toDF("id", "vec"))
    val top = Ann.bruteForceHammingTopK(planted, planted.filter(col("id") === 0), k = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(top.head._3 == 100000L && top.head._4 == 0L, top.toSeq.toString)
    // per query, hamming is non-decreasing in rank (the ordering contract)
    val all = Ann.bruteForceHammingTopK(emb, emb.filter(col("id") < 8), k = 10)
      .as[(Long, Long, Long, Long)].collect()
    for ((_, rows) <- all.groupBy(_._1)) {
      val byRank = rows.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b }, rows.toSeq.toString)
    }
    // 1 bit/dim keeps usable neighborhood signal vs the float truth --
    // quantified, floor set loosely (BQ is a coarse filter tier whose
    // serving shape is rerank-through-int8/float, not a final ranking)
    val brute = LlmQueries.s01AnnBruteForce(spark, TestSpark.Sf)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val ham = all.map(t => (t._1, t._3)).toSet
    val recall = brute.count(ham).toDouble / brute.size
    info(s"s29 hamming recall@10 vs s01 = $recall")
    // measured 0.25 on the isotropic-gaussian driver corpus -- the
    // WORST case for 1-bit signs (real embedding clusters concentrate
    // mass and recall rises); floor at random-chance-clearing 0.15
    assert(recall >= 0.15, s"s29 recall $recall collapsed below the coarse-filter floor")
  }

  test("auto-parameterized s02/s03 query paths keep quantified recall vs s01") {
    val brute = LlmQueries.s01AnnBruteForce(spark, TestSpark.Sf)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = LlmQueries.s02AnnLsh(spark, TestSpark.Sf)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = LlmQueries.s03AnnIvf(spark, TestSpark.Sf)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(lsh.nonEmpty && ivf.nonEmpty)
    // derived configs at n=500: LSH 4 bits / 7 tables (bound ≈ 0.7 at
    // cos 0.5); IVF probes calibrated against a 0.9 recall target
    // (round 8 — was fixed √nCells probes measuring ~0.4)
    val rLsh = brute.count(lsh).toDouble / brute.size
    val rIvf = brute.count(ivf).toDouble / brute.size
    info(s"s02 recall@10 = $rLsh, s03 recall@10 = $rIvf")
    // floors at ~0.85× the r10 measured values (0.6375 / 0.95), so a
    // recall regression trips the suite, not the driver
    assert(rLsh >= 0.54, s"s02 recall@10 $rLsh (measured 0.6375 r10)")
    assert(rIvf >= 0.80, s"s03 recall@10 $rIvf (measured 0.95 r10)")
  }

  test("LSH near-dup candidate volume stays O(n · nTables) across corpus sizes") {
    // The round-3 scale-killer: FIXED nBits ⇒ bucket population n/2^b ⇒
    // Σ bucket² quadratic in n. Occupancy-scaled bits must keep the
    // per-(row·table) candidate rate roughly constant as the corpus
    // grows. Two real corpora: 500 vectors (sf0.001) and 2000 (sf0.1).
    def candRate(sf: String): (Long, Double) = {
      val e = Tables.embeddings(spark, sf)
        .select(col("vec_id").as("id"), toDouble(col("embedding")).as("v"))
        .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
        .filter(col("nrm") > 0)
      val n = e.count()
      val bits = Ann.bitsForOccupancy(n)
      val tables = Ann.tablesForRecall(0.44, bits, 0.99)
      val cands = Ann.lshCandidates(e, bits, tables, dim = 64, seed = 0xd07L).count()
      (n, cands.toDouble / (n.toDouble * tables))
    }
    val (n1, r1) = candRate("/root/testdata/sf0.001")
    val (n2, r2) = candRate("/root/testdata/sf0.1")
    assert(n2 > n1)
    // distinct() de-dups across tables, and real embeddings cluster, so
    // the rate is not exactly flat — but a quadratic path would scale it
    // by ~n2/n1 (4×). Allow 2× slack; also pin an absolute ceiling of
    // one occupancy's worth of candidates per (row, table).
    assert(r2 <= r1 * 2.0, s"candidate rate grew superlinearly: $r1 -> $r2")
    assert(r1 <= 32.0 && r2 <= 32.0, s"rates $r1 / $r2 exceed occupancy bound")
  }

  test("occupancy/recall parameter derivations are sane and monotone") {
    assert(Ann.bitsForOccupancy(500) == 4)        // floor at minBits
    assert(Ann.bitsForOccupancy(2000) == 6)
    assert(Ann.bitsForOccupancy(1L << 40) == 28)  // capped
    assert(Ann.bitsForOccupancy(64000, 32) == 11)
    // recall-0.99 at τ=0.44 over 4-bit tables is the round-3 hand
    // config (24–25 tables) — the derivation reproduces it
    val t4 = Ann.tablesForRecall(0.44, 4, 0.99)
    assert(t4 >= 24 && t4 <= 26, s"t4=$t4")
    // tighter τ prunes harder per plane → fewer tables at equal width
    assert(Ann.tablesForRecall(0.8, 4, 0.99) < t4)
    // a config whose table count explodes must fail loudly, not ship
    assertThrows[IllegalArgumentException] {
      Ann.tablesForRecall(0.44, 28, 0.99)
    }
  }

  test("bucketId is deterministic across evaluations") {
    val planes = Ann.hyperplanes(8, 64, 7L)
    val a = emb.select(Ann.bucketId(col("vec"), planes)).as[Long].collect()
    val b = emb.select(Ann.bucketId(col("vec"), planes)).as[Long].collect()
    assert(a.toSeq == b.toSeq && a.toSet.size > 1)
  }

  test("s08 BM25 top-20 matches a local integer recomputation, ranked and term-matched") {
    val got = LlmQueries.s08Bm25(spark, TestSpark.Sf)
      .as[(Long, Long)].collect().toSeq
    val terms = Seq("vector", "stream", "hash")
    val docs = Tables.documents(spark, TestSpark.Sf)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) =>
        val lo = t.toLowerCase
        val dl = """[a-z0-9]+""".r.findAllIn(lo).length.toLong
        val tfs = terms.map(w => ("""\b""" + w + """\b""").r.findAllIn(lo).length.toLong)
        (id, dl, tfs)
      }
    val nn = docs.length.toLong
    val s = docs.map(_._2).sum
    val dfs = terms.indices.map(i => docs.count(_._3(i) > 0).toLong)
    val expect = docs.flatMap { case (id, dl, tfs) =>
      val score = terms.indices.map { i =>
        if (tfs(i) == 0) BigInt(0)
        else BigInt(nn * 1000 / dfs(i)) * 44 * s * tfs(i) /
          (BigInt(20) * s * tfs(i) + BigInt(6) * s + BigInt(18) * nn * dl)
      }.map(_.toLong).sum
      if (tfs.exists(_ > 0)) Some((id, score)) else None
    }.sortBy { case (id, sc) => (-sc, id) }.take(20)
    assert(got == expect.toSeq, s"got=${got.take(3)} want=${expect.take(3)}")
  }

  test("s09 reranks exactly the s08 candidates by true cosine to the query doc") {
    val got = LlmQueries.s09HybridRerank(spark, TestSpark.Sf)
      .as[(Long, Long, Long)].collect().toSeq
    val cands = LlmQueries.s08Bm25(spark, TestSpark.Sf)
      .as[(Long, Long)].collect().toMap
    val vecs = Tables.embeddings(spark, TestSpark.Sf)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.lazyZip(b).map(_ * _).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val q = vecs(0L)
    val expect = cands.keySet.filter(_ != 0L)
      .filter(id => vecs(id).exists(_ != 0))
      .toSeq.map(id => (id, cos(q, vecs(id))))
      .sortBy { case (id, s) => (-s, id) }.take(10).zipWithIndex
      .map { case ((id, _), i) => (i + 1L, id, cands(id)) }
    assert(got == expect, s"got=${got.take(3)} want=${expect.take(3)}")
  }

  test("kNN graph recall@5 vs the exact brute-force graph is quantified") {
    val exact = Ann.bruteForceTopK(emb, emb, k = 5)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val graph = Ann.knnGraph(emb, k = 5, seed = 42L)
      .select("id", "rank", "neighbor_id").as[(Long, Long, Long)].collect()
    // structure: every live doc present, ranks are 1..m with m <= 5
    val byId = graph.groupBy(_._1)
    assert(byId.size == exact.map(_._1).size)
    byId.values.foreach { rows =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq)
      assert(rows.length <= 5)
    }
    val got = graph.map(r => (r._1, r._3)).toSet
    val recall = exact.count(got).toDouble / exact.size
    assert(recall >= 0.55, s"recall@5 $recall")
  }

  test("kNN graph with an opt-in recall target calibrates probes and meets it") {
    val exact = Ann.bruteForceTopK(emb, emb, k = 5)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val graph = Ann.knnGraph(emb, k = 5, seed = 42L, recallTarget = Some(0.9))
      .select("id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(graph).toDouble / exact.size
    info(s"calibrated knnGraph(recall=0.9) recall@5 = $recall")
    // same contract as ivfTopKAuto: the calibrated point must clear a
    // floor well above the fixed-probe default's 0.55
    assert(recall >= 0.77,
      s"calibrated knnGraph recall@5 $recall (measured 0.9092 r10)")
  }

  test("IVF-PQ code-size sweep: recall is quantified per (m, ksub) and more code bits buy recall") {
    // fixed rerank buffer (candMult=4) so the sweep isolates CODE
    // quality — the auto-calibrated buffer would otherwise compensate
    // a coarse code with a deeper exact rerank and flatten the curve
    val queries = emb.filter(pmod(col("id"), lit(25)) === 0)
    val exact = Ann.bruteForceTopK(emb, queries, k = 10)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(m: Int, ksub: Int): Double = {
      val got = Ann.ivfPqTopK(emb, queries, k = 10, seed = 42L,
          m = m, ksub = ksub, candMult = 4)
        .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
      exact.count(got).toDouble / exact.size
    }
    val sweep = Seq((2, 16), (4, 16), (8, 16), (8, 64))
      .map { case (m, ks) => (m, ks, recallOf(m, ks)) }
    sweep.foreach { case (m, ks, r) =>
      info(f"ivfPq m=$m ksub=$ks (${m * (32 - Integer.numberOfLeadingZeros(ks - 1))}%d bits/vec) recall@10 = $r%.3f")
    }
    val byBits = sweep.map { case (m, ks, r) =>
      (m * (32 - Integer.numberOfLeadingZeros(ks - 1)), r)
    }
    // the smallest code budget must still be usable, the largest good
    assert(byBits.head._2 >= 0.3, s"m=2,ksub=16 recall ${byBits.head._2}")
    assert(byBits.last._2 >= 0.6, s"m=8,ksub=64 recall ${byBits.last._2}")
    // more code bits never cost much: max over smaller budgets minus
    // slack (PQ training noise) bounds each larger budget from below
    byBits.sliding(2).foreach { case Seq((b1, r1), (b2, r2)) =>
      assert(r2 >= r1 - 0.1, s"recall fell $r1 -> $r2 going $b1 -> $b2 bits")
    }
  }

  test("s14 recall audit equals an independent recall computation and holds the calibration floor") {
    val row = LlmQueries.s14AnnRecallAudit(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long)].head()
    val (nq, nTrue, nHit, ppm) = row
    // independent recomputation over the same deterministic sample
    val e = Tables.embeddings(spark, TestSpark.Sf)
      .select(col("vec_id").as("id"), toDouble(col("embedding")).as("vec"))
    val sample = e.filter(pmod(col("id"), lit(25)) === 0)
    val exact = Ann.bruteForceTopK(e, sample, k = 10)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Ann.ivfTopKAuto(e, sample, k = 10, seed = 42L)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(nq == exact.map(_._1).size && nTrue == exact.size.toLong)
    assert(nHit == exact.count(approx).toLong, s"audit $nHit vs ${exact.count(approx)}")
    assert(ppm == nHit * 1000000L / nTrue)
    info(s"s14 audit: $nHit/$nTrue hits over $nq queries = ${ppm} ppm")
    // the audit's whole point: it must certify the calibrated target's
    // neighborhood (0.9 target; floor leaves drift headroom, not a
    // return to the old fixed-probe 0.4 regime)
    assert(ppm >= 800000L, s"recall audit $ppm ppm below floor")
  }

  test("kNN graph under adversarial skew: 90%-one-blob corpus completes with bounded candidate volume") {
    import graft.functions.CentroidCells.centroidCells
    // the documented hot-cell claim, made testable: a degenerate corpus
    // where 90% of vectors land in one region must not turn the cell
    // self-join quadratic. The defense is data-adaptivity — Lloyd
    // allocates centroids where the mass is, splitting the blob across
    // many cells — and this spec MEASURES the resulting candidate
    // volume instead of trusting the argument.
    val n = 500
    val dim = 16
    def corpus(eps: Double) = {
      val rnd = new scala.util.Random(1234L)
      val blobDir = Array.fill(dim)(rnd.nextGaussian())
      (0 until n).map { i =>
        if (i < 450) (i.toLong,
          blobDir.toIndexedSeq.map(x => x + rnd.nextGaussian() * eps))
        else (i.toLong, Seq.fill(dim)(rnd.nextGaussian()))
      }.toDF("id", "vec")
    }
    /** (max cell population, candidate volume) under knnGraph's sizing. */
    def measure(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val live = df.withColumn("nrm0", sqrt(dot(col("vec"), col("vec"))))
        .filter(col("nrm0") > 0)
      val nCells = math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt)     // 23
      val nProbe = math.max(3, math.ceil(math.sqrt(nCells.toDouble)).toInt) // 5
      val cents = Ann.fitCentroids(live, n, nCells, seed = 42L, fitSampleCap = 100000L)
      val pops = live
        .select(element_at(centroidCells(col("vec"), col("nrm0"), cents, 1), 1).as("cell"))
        .groupBy("cell").count().as[(Int, Long)].collect().toMap
      val candVol = live
        .select(explode(centroidCells(col("vec"), col("nrm0"), cents, nProbe)).as("cell"))
        .groupBy("cell").count()
        .as[(Int, Long)].collect()
        .map { case (cell, probes) => probes * pops.getOrElse(cell, 0L) }.sum
      (pops.values.max, candVol)
    }
    val allPairs = n.toLong * n
    val balanced = 5L * n * n / 23

    // DEGENERATE: 450 near-identical vectors. Even here the graph must
    // complete with correct structure, and the candidate volume is
    // bounded by (hot mass)² + background — the blob's self-pairs are
    // irreducible for ANY method that compares within regions (they
    // really are each other's neighbors); the engineering claim is the
    // volume never explodes past that floor toward n² · nProbe, and
    // the hot cells land in one exchange where AQE skew-split applies.
    val degenerate = corpus(eps = 0.05)
    val graph = Ann.knnGraph(degenerate, k = 5, seed = 42L)
      .as[(Long, Long, Long)].collect()
    val byId = graph.groupBy(_._1)
    assert(byId.size == n, s"${byId.size} of $n docs have neighbors")
    byId.values.foreach { rows =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq && rows.length <= 5)
    }
    val (maxPopD, volD) = measure(degenerate)
    info(s"degenerate: max cell pop $maxPopD/$n, candidate volume $volD " +
      s"(blob floor ${450L * 450}, all-pairs $allPairs)")
    assert(volD <= 450L * 450 + 3 * balanced,
      s"degenerate volume $volD exploded past the blob floor")

    // CLUSTERED (the realistic skew): same blob, loosened — Lloyd must
    // SPLIT it across cells, keeping the volume near the balanced ideal
    val (maxPopC, volC) = measure(corpus(eps = 0.5))
    info(s"clustered: max cell pop $maxPopC/$n, candidate volume $volC " +
      s"(balanced ideal $balanced)")
    assert(maxPopC <= n / 3, s"loosened blob not split: max pop $maxPopC")
    assert(volC <= 4 * balanced,
      s"clustered volume $volC exceeds 4x the balanced ideal $balanced")
  }

  test("index upsert: exact replacement, re-append resurfaces, replay self-heals, purge reclaims") {
    import graft.sim.AnnIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_ups").toString
    AnnIndex.build(emb, nCells = 23, seed = 42L, dir)
    val queries = emb.filter(col("id") < 8)
    // the re-embedding: reversed vectors — same norm, different direction
    val changed = emb.filter(col("id") % 11 === 5)
      .select(col("id"), reverse(col("vec")).as("vec"))
    val post = emb.filter(col("id") % 11 =!= 5).unionByName(changed)
    val n1 = changed.count()
    AnnIndex.upsert(changed, dir)
    def fullProbe() = AnnIndex.probe(spark, dir, queries, k = 10, nProbe = 23)
      .select("qid", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    val got = fullProbe()
    // the sharp contract: full probe after upsert ≡ exact brute force
    // over the post-CDC corpus, rank for rank — each id's NEW version
    // ranks, its old version never does (and never ranks beside it)
    val brute = Ann.bruteForceTopK(post, queries, k = 10)
      .select("qid", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute, "post-upsert probe diverged from post-CDC brute force")
    // replayed upsert (the stamp's at-least-once window) self-heals:
    // its delete retires the first run's append before re-appending
    AnnIndex.upsert(changed, dir)
    assert(fullProbe() == got, "replayed upsert changed probe results")
    // a deleted id RE-APPENDED (plain ingest, same vector) resurfaces
    // immediately — versioned tombstones never swallow newer writes
    val dels = emb.filter(col("id") % 13 === 0 && col("id") % 11 =!= 5)
    val n2 = dels.count()
    AnnIndex.delete(dels.select("id"), dir)
    AnnIndex.append(dels, dir)
    assert(fullProbe() == got, "re-appended ids did not resurface exactly")
    // census prices live versions only
    val nLive = AnnIndex.stats(spark, dir).select("n_vectors").as[Long].head()
    assert(nLive == 500L, s"census counts retired versions: $nLive")
    // physical reclamation: exactly the retired versions go (changed's
    // gen-0 + the replay-retired gen-1 copies, dels' gen-0 copies)
    val purged = AnnIndex.purge(spark, dir)
    assert(purged == 2 * n1 + n2, s"purged $purged, expected ${2 * n1 + n2}")
    assert(fullProbe() == got, "purge changed probe results")
  }

  test("index delete: exact masking, idempotence, physical purge") {
    import graft.sim.AnnIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_del").toString
    AnnIndex.build(emb, nCells = 23, seed = 42L, dir)
    val forget = emb.filter(col("id") % 13 === 0)
    val forgetIds = forget.select("id").as[Long].collect().toSet
    val queries = emb.filter(col("id") < 8)
    AnnIndex.delete(forget.select("id"), dir)
    // the sharp contract: probing EVERY cell is brute force, so the
    // full probe after a delete must equal exact brute-force top-k
    // over corpus-minus-forgotten, rank for rank
    def fullProbe() = AnnIndex.probe(spark, dir, queries, k = 10, nProbe = 23)
      .select("qid", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    val got = fullProbe()
    assert(got.forall { case (_, _, nb) => !forgetIds(nb) },
      "a tombstoned id occupied a rank")
    val brute = Ann.bruteForceTopK(
        emb.filter(col("id") % 13 =!= 0), queries, k = 10)
      .select("qid", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute,
      "full probe after delete diverged from brute force minus forgotten")
    // stats census prices the LIVE population
    val nLive = AnnIndex.stats(spark, dir)
      .select("n_vectors").as[Long].head()
    assert(nLive == 500 - forgetIds.size, s"census counts ghosts: $nLive")
    // replaying the forget set merges nothing
    AnnIndex.delete(forget.select("id"), dir)
    assert(fullProbe() == got, "re-sent forget set changed results")
    // purge: physical removal, probes bit-identical, and the APPLIED
    // mask files cleared (file-snapshot semantics: purge deletes
    // exactly the tombstone part files it anti-joined, never the
    // whole dir — a mask appended by a concurrent delete() during the
    // rewrite must survive to re-mask the new cells table)
    val purged = AnnIndex.purge(spark, dir)
    assert(purged == forgetIds.size.toLong,
      s"purged $purged rows, expected ${forgetIds.size}")
    assert(fullProbe() == got, "purge changed probe results")
    val leftover = Option(new java.io.File(s"$dir/tombstones").list())
      .toSeq.flatten.filter(f =>
        f.endsWith(".parquet") && !f.startsWith("_") && !f.startsWith("."))
    assert(leftover.isEmpty, s"applied mask files survived: $leftover")
    assert(AnnIndex.purge(spark, dir) == 0L, "second purge not a no-op")
    // the concurrent-delete hazard, pinned: a mask landing after
    // purge's snapshot (here: after the purge) still deletes — probes
    // hide the id immediately, the NEXT purge reclaims it
    val lateId = emb.filter(col("id") % 13 =!= 0)
      .select(min("id")).as[Long].head()
    AnnIndex.delete(Seq(lateId).toDF("id"), dir)
    assert(!AnnIndex.probe(spark, dir, queries, k = 10, nProbe = 23)
      .select("neighbor_id").as[Long].collect().toSet.contains(lateId),
      "late tombstone not applied on probes")
    assert(AnnIndex.purge(spark, dir) == 1L, "late tombstone not reclaimed")
    // a rebuild starts a new generation: a re-ingested forgotten id
    // must be probe-visible again (stale masks cleared by build)
    AnnIndex.delete(forget.select("id"), dir)
    AnnIndex.build(emb, nCells = 23, seed = 42L, dir)
    val back = AnnIndex.probe(spark, dir, queries, k = 10, nProbe = 23)
      .select("neighbor_id").as[Long].collect().toSet
    assert(back.exists(forgetIds), "rebuild kept the previous generation's mask")
  }

  test("interrupted purge swap self-heals on read and maintenance paths") {
    import graft.sim.AnnIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_heal").toString
    AnnIndex.build(emb, nCells = 23, seed = 42L, dir)
    val queries = emb.filter(col("id") < 4)
    def probeSet() = AnnIndex.probe(spark, dir, queries, k = 5, nProbe = 23)
      .select("qid", "rank", "neighbor_id").as[(Long, Long, Long)]
      .collect().toSet
    val want = probeSet()
    val n = spark.read.parquet(s"$dir/cells").count()
    def mv(a: String, b: String): Unit =
      assert(new java.io.File(dir, a).renameTo(new java.io.File(dir, b)), s"$a -> $b")
    // crash AFTER rename(cells→prev) and BEFORE rename(tmp→cells): the
    // staged survivors are complete (parquet _SUCCESS) — the next read
    // rolls the swap FORWARD instead of failing path-not-found
    mv("cells", ".cells.purge-inprogress")
    assert(probeSet() == want, "forward heal diverged")
    assert(new java.io.File(dir, "cells").exists &&
      !new java.io.File(dir, ".cells.purge-inprogress").exists,
      "forward heal did not complete the swap")
    // crash variant where only the previous table survives: roll BACK
    mv("cells", ".cells.previous")
    assert(probeSet() == want, "rollback heal diverged")
    // append during the window must heal FIRST — an un-healed
    // mode(append) would create a fresh cells dir of only the new rows
    // and strand the old table at prev forever
    mv("cells", ".cells.previous")
    AnnIndex.append(Seq((100000L, Seq.fill(64)(0.1)))
      .toDF("id", "vec"), dir)
    assert(spark.read.parquet(s"$dir/cells").count() == n + 1,
      "append into the crash window lost the previous table")
    // and purge heals at start, then reclaims as usual
    AnnIndex.delete(Seq(100000L).toDF("id"), dir)
    mv("cells", ".cells.previous")
    assert(AnnIndex.purge(spark, dir) == 1L,
      "purge did not recover from the crash window")
    assert(probeSet() == want)
  }

  test("s21 hard negatives: planted near-dup is excluded, ranks fill over the excluded set") {
    // synthetic fixture: vec 0 and vec 1 are near-identical AND marked
    // same-root (a near-dup pair); vec 2 is similar but a different
    // root. Exclusion must drop 1 from 0's negatives (and vice versa)
    // while the ranking FILLS from the remaining candidates — the
    // false-negative guard the operator exists for.
    val base = Seq(1.0, 0.0, 0.0, 0.0)
    val fixture = Seq(
      0L -> Seq(1.0, 0.0, 0.0, 0.001),
      1L -> Seq(1.0, 0.0, 0.0, 0.002),   // near-dup of 0 (same root)
      2L -> Seq(0.9, 0.1, 0.0, 0.0),     // similar, different root
      3L -> Seq(0.0, 1.0, 0.0, 0.0),
      4L -> Seq(0.0, 0.0, 1.0, 0.0)
    ).toDF("id", "vec")
    val groups = Seq(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 3L, 4L -> 4L)
      .toDF("id", "root")
    val got = Ann.hardNegatives(fixture, k = 2, groups)
      .as[(Long, Long, Long)].collect()  // (id, rank, neighbor_id)
    val by = got.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    assert(!by(0L).contains(1L) && !by(1L).contains(0L),
      "same-root near-dup served as a hard negative")
    assert(by(0L).head == 2L, s"0's hardest negative should be 2: ${by(0L)}")
    assert(by(0L).length == 2, "k must fill from the excluded candidate set")

    // corpus-level: no emitted pair shares a dedup root
    val roots = LlmQueries.d06DedupClusters(spark, TestSpark.Sf)
      .as[(Long, Long)].collect().toMap  // id -> comp (clustered docs only)
    def rootOf(id: Long): Long = roots.getOrElse(id, id)
    val corpus = LlmQueries.s21HardNegatives(spark, TestSpark.Sf)
      .as[(Long, Long, Long)].collect()
    assert(corpus.nonEmpty)
    corpus.foreach { case (id, _, nb) =>
      assert(rootOf(id) != rootOf(nb), s"pair ($id,$nb) shares root")
    }
    // and per-query exactly k ranks 1..5
    corpus.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to 5L), s"query $id ranks")
    }
  }

  test("s23 RRF fusion: both-lists doc wins, arithmetic exact, ranks consecutive") {
    val got = LlmQueries.s23RrfFusion(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long, Long)].collect()  // (rank, doc_id, lex, dense, rrf)
    assert(got.length == 10 && got.map(_._1).toSeq == (1L to 10L))
    // every row's fused score is exactly the integer RRF of its ranks
    def term(r: Long): Long = if (r > 0) 1000000000L / (60L + r) else 0L
    got.foreach { case (_, id, lex, dense, rrf) =>
      assert(rrf == term(lex) + term(dense), s"doc $id rrf arithmetic")
      assert(lex > 0 || dense > 0, s"doc $id in neither list")
    }
    // ordering: (rrf desc, doc_id asc)
    assert(got.sortBy(r => (-r._5, r._2)).map(_._2).toSeq == got.map(_._2).toSeq)
    // the property RRF exists for: a doc ranked mid-list by BOTH
    // retrievers outranks every single-list doc including both rank-1s
    // (this corpus plants exactly that: doc 402 at lex 5 / dense 9)
    val top = got.head
    assert(top._3 > 0 && top._4 > 0,
      s"fusion winner ${top._2} should come from both lists: $top")
    assert(top._3 > 1 && top._4 > 1,
      "winner should be mid-list in both (score-calibration-free win)")
  }

  test("index probeRrf: full-probe fusion equals the oracled s23 rank-for-rank") {
    import graft.sim.AnnIndex
    // #299 — the index-served twin of s23 (the #201/#221 lifecycle
    // pattern): at nProbe = nCells the dense probe is exact, so the
    // fusion must reproduce the oracled batch output exactly
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_rrf").toString
    AnnIndex.build(emb, nCells = 23, seed = 42L, dir)
    val queries = emb.filter(col("id") === 0)
    val lex = LlmQueries.s08Bm25(spark, TestSpark.Sf)
      .filter(col("doc_id") =!= 0)
      .select(lit(0L).as("qid"), col("doc_id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score_milli").desc, col("doc_id").asc))
          .cast("long").as("lex_rank"))
    val got = AnnIndex.probeRrf(spark, dir, queries, lex, k = 10,
        fetchK = 20, nProbe = 23)
      .select("rank", "doc_id", "lex_rank", "dense_rank", "rrf_nano")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val want = LlmQueries.s23RrfFusion(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == want,
      s"index-served RRF diverged from batch s23:\n$got\nvs\n$want")
  }

  test("s22 hard-negatives IVF: recall vs the exact kernel, cartesian-free plan, exclusion holds") {
    val exact = LlmQueries.s21HardNegatives(spark, TestSpark.Sf)
      .as[(Long, Long, Long)].collect()
    val ivfDf = LlmQueries.s22HardNegativesIvf(spark, TestSpark.Sf)
    // the point of the scale path: candidates come from the IVF cell
    // join, never a block-nested-loop cartesian (s21's exact kernel)
    val plan = ivfDf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "scale path must not contain a cartesian")
    val ivf = ivfDf.as[(Long, Long, Long)].collect()
    assert(ivf.nonEmpty)
    // the exclusion contract is inherited, not approximated: no
    // emitted pair may share a dedup root
    val roots = LlmQueries.d06DedupClusters(spark, TestSpark.Sf)
      .as[(Long, Long)].collect().toMap
    def rootOf(id: Long): Long = roots.getOrElse(id, id)
    ivf.foreach { case (id, _, nb) =>
      assert(rootOf(id) != rootOf(nb), s"pair ($id,$nb) shares root")
    }
    // ranks are consecutive from 1 (fill from the eligible candidates)
    ivf.groupBy(_._1).foreach { case (id, rows) =>
      val rs = rows.map(_._2).sorted.toSeq
      assert(rs == (1L to rs.length).toSeq, s"query $id ranks $rs")
    }
    val exactSet = exact.map(r => (r._1, r._3)).toSet
    val got = ivf.map(r => (r._1, r._3)).toSet
    val recall = exactSet.count(got).toDouble / exactSet.size
    info(s"hardNegativesIvf recall@5 vs exact = $recall")
    // ~0.85x the measured value (r11) so a calibration/bucketing
    // regression trips the suite, not run-to-run jitter
    assert(recall >= 0.77, s"recall@5 $recall (measured 0.9096 r11)")
  }

  test("calibration prices geometry: clustered corpus solves a small probe fraction, isotropic doesn't") {
    // the r12 SCALECHECK diagnosis on s22's sf1 point: this corpus's
    // embeddings are near-isotropic, so probesForRecall correctly
    // demands ~half the cells for the 0.9-recall mining contract
    // (candidate volume ~n²/2 — whole-corpus exact-recall mining on
    // unstructured vectors is inherently ~quadratic). The IVF path's
    // asymptotic edge exists exactly where the data has structure:
    // on a planted clustered fixture the same calibration solves a
    // SMALL probe fraction. Both directions pinned here so the ledger
    // note's claim is a measurement, not prose.
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Double]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n).toSeq
    }
    // 20 tight clusters × 25 members in 64-dim: members at cosine
    // ~0.99+ within a cluster, centers near-orthogonal across
    val centers = Array.fill(20)(Array.fill(64)(rnd.nextGaussian()))
    val clustered = (0 until 500).map { i =>
      val c = centers(i % 20)
      (i.toLong, unit(c.zipWithIndex.map { case (x, j) =>
        x + 0.05 * math.sin(1.0 + i * 64 + j) }))
    }.toDF("id", "vec")
    val nc = clustered.count()
    val nCells = 23
    val csC = Ann.fitCentroids(
      clustered.withColumn("nrm", sqrt(dot(col("vec"), col("vec")))),
      nc, nCells, 42L, 100000L)
    val pC = Ann.probesForRecall(Ann.calibrationSample(clustered, nc), csC,
      recall = 0.9, kCal = 10)
    info(s"clustered fixture: nProbe=$pC of $nCells cells")
    assert(pC * 4 <= nCells,
      s"clustered geometry should solve <= nCells/4 probes, got $pC/$nCells")
    // the corpus embeddings: same solve lands near half the cells —
    // the measured ~0.5 ratio behind s22's diagnosed sf1 segment
    val n = emb.count()
    val csE = Ann.fitCentroids(
      emb.withColumn("nrm", sqrt(dot(col("vec"), col("vec")))),
      n, nCells, 42L, 100000L)
    val pE = Ann.probesForRecall(Ann.calibrationSample(emb, n), csE,
      recall = 0.9, kCal = 10)
    info(s"corpus embeddings: nProbe=$pE of $nCells cells")
    assert(pE * 4 > nCells,
      s"corpus geometry unexpectedly clusterable ($pE/$nCells) — " +
        "re-examine the s22 SCALECHECK diagnosis")
  }

  test("audit sampling: absolute query budget, never a corpus fraction") {
    // the s14/s17/maintain economics: the exact brute-force side costs
    // |sample|·n similarity evaluations, so |sample| must be bounded by
    // a BUDGET — a fixed 1/25 fraction is Θ(n²) at 100× and the audit
    // becomes the most expensive query in the system (the r11 verdict's
    // one remaining scale-killer)
    assert(Ann.auditSampleMod(500L) == 25L)    // test scale: 1/25, unchanged
    assert(Ann.auditSampleMod(51200L) == 25L)  // boundary: fraction == budget
    for (n <- Seq(100000L, 10000000L, 1000000000L, 1000000000000L)) {
      val mod = Ann.auditSampleMod(n)
      assert(n / mod <= 2048L,
        s"n=$n: expected sample size ${n / mod} exceeds the 2048 budget")
      assert(mod >= 25L, s"n=$n: mod $mod fell below the floor")
    }
  }

  test("audit paths never collect corpus-fraction pair sets (source guard)") {
    // probeSweep's recall is computed DISTRIBUTED (exact truth
    // materialized once, then a join + 1-row aggregate per operating
    // point — maintain's shape); a `.collect().toSet` of exact or probe
    // pair sets is linear-in-corpus driver heap. Pinned at the source
    // so the shape cannot creep back.
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/sim/AnnIndex.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(!src.contains("collect().toSet"),
      "AnnIndex audit paths must not collect pair sets to the driver")
  }

  test("index probeHardNegatives: full probe equals the exact kernel; calibrated probe holds recall and exclusion") {
    import graft.sim.AnnIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_hn").toString
    AnnIndex.build(emb, nCells = 23, seed = 42L, dir)
    // same groups frame as s21/s22: d06 clusters, singleton fallback
    val roots = Tables.documents(spark, TestSpark.Sf).select("doc_id")
      .join(LlmQueries.clusters(spark, TestSpark.Sf)
        .withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id").as("id"),
        coalesce(col("comp"), col("doc_id")).as("root"))
    // full probe IS brute force with exclusion — rank-for-rank parity
    // with the exact kernel (same sims, same tie order), the anchor
    // every index-served twin pins (#201/#221/#299 pattern)
    val want = LlmQueries.s21HardNegatives(spark, TestSpark.Sf)
      .as[(Long, Long, Long)].collect().toSet
    val full = AnnIndex.probeHardNegatives(spark, dir, k = 5,
        groups = roots, nProbe = 23)
      .as[(Long, Long, Long)].collect().toSet
    assert(full == want, "full-probe index mining diverged from the exact kernel")
    // calibrated operating point (exclusion-depth-widened probes):
    // recall floor vs the exact kernel, exclusion contract intact
    val cal = AnnIndex.probeHardNegatives(spark, dir, k = 5, groups = roots)
      .as[(Long, Long, Long)].collect()
    assert(cal.nonEmpty)
    val rootOf = roots.as[(Long, Long)].collect().toMap
    cal.foreach { case (id, _, nb) =>
      assert(rootOf(id) != rootOf(nb), s"pair ($id,$nb) shares root")
    }
    val wantPairs = want.map(r => (r._1, r._3))
    val calPairs = cal.map(r => (r._1, r._3)).toSet
    val recall = wantPairs.count(calPairs).toDouble / wantPairs.size
    info(s"index probeHardNegatives recall@5 vs exact = $recall")
    assert(recall >= 0.77, s"recall@5 $recall")
  }

  test("s24 isotropy audit: planted geometries exact, corpus matches a local recompute") {
    val spark = TestSpark.spark
    import spark.implicits._
    def frame(vecs: Seq[(Long, Seq[Long])]) =
      vecs.flatMap { case (id, qs) =>
        qs.zipWithIndex.map { case (q, d) => (id, d.toLong, q) }
      }.toDF("vec_id", "dim", "qv")
    // eight identical vectors: rbar2 = 10^6 exactly, every pair at
    // the top signed-cos^2 bin (20)
    val aligned = LlmQueries.isotropyAudit(
        frame((0L until 8L).map(i => (i, Seq(3L, -4L, 5L)))))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(aligned.map(_._5).distinct.toSeq == Seq(1000000L), "aligned rbar2")
    assert(aligned.toSeq.map(r => (r._1, r._2)) == Seq((20L, 28L)),
      s"aligned pairs must all land in bin 20: ${aligned.toSeq}")
    // an antipodal pair: the dim sums cancel (rbar2 = 0) and the one
    // pair sits at signed-cos^2 = -10^6 (bin -20)
    val anti = LlmQueries.isotropyAudit(
        frame(Seq((0L, Seq(3L, -4L, 5L)), (1L, Seq(-3L, 4L, -5L)))))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(anti.map(_._5).distinct.toSeq == Seq(0L), "antipodal rbar2")
    assert(anti.toSeq.map(r => (r._1, r._2)) == Seq((-20L, 1L)),
      s"antipodal pair must land in bin -20: ${anti.toSeq}")
    // corpus: the query matches a pure-integer local recomputation
    // over the SAME quantized frame (sampling rule included)
    val q = Tables.embeddings(spark, TestSpark.Sf)
      .select(col("vec_id"),
        posexplode(graft.functions.QuantizeInt8.quantizeInt8(col("embedding"))))
      .toDF("vec_id", "dim", "qv")
      .as[(Long, Int, Long)].collect()
    val byVec = q.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val nV = byVec.size.toLong
    val dims = q.map(_._2).max + 1
    val sd = (0 until dims).map(d => byVec.values.map(_(d)).sum)
    val num = sd.map(s => BigInt(s) * s).sum
    val sn2 = byVec.values.map(v => v.map(x => BigInt(x) * x).sum).sum
    val wantRbar2 = ((num * 1000000) / (nV * sn2)).toLong
    val m = math.max(1L, nV / 256L)
    val sm = byVec.filter { case (id, v) =>
      id % m == 0 && v.exists(_ != 0) }.toSeq.sortBy(_._1)
    val hist = (for {
      i <- sm.indices; j <- (i + 1) until sm.length
      (ida, va) = sm(i); (idb, vb) = sm(j)
    } yield {
      val dot = va.zip(vb).map { case (a, b) => BigInt(a) * b }.sum
      val na2 = va.map(x => BigInt(x) * x).sum
      val nb2 = vb.map(x => BigInt(x) * x).sum
      val sc2 = (if (dot < 0) -1 else 1) *
        ((dot * dot * 1000000) / (na2 * nb2))
      (sc2 / 50000).toLong  // BigInt / truncates toward zero for signed
    }).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = LlmQueries.s24IsotropyAudit(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (bin, nPairs, nSample, nVecs, rbar2) =>
      assert(nVecs == nV && nSample == sm.length.toLong, "census")
      assert(rbar2 == wantRbar2, s"rbar2 $rbar2 != $wantRbar2")
      assert(nPairs == hist(bin), s"bin $bin: $nPairs != ${hist(bin)}")
    }
    assert(got.map(_._2).sum == hist.values.sum, "pair mass conserved")
    info(s"corpus rbar2_ppm = $wantRbar2 (isotropy: ~0 = isotropic)")
  }

  test("s26 hubness: census matches a local in-degree recompute; planted hub graph exact") {
    // planted graph through the factored kernel: ids 1-5, everyone's
    // lists point at the hub (id 1); id 5 is never retrieved
    val ids = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val knn = Seq(
      (2L, 1L, 1L), (3L, 1L, 1L), (4L, 1L, 1L), (5L, 1L, 1L), // hub in-deg 4
      (1L, 1L, 2L), (3L, 2L, 2L),                              // id 2 in-deg 2
      (1L, 2L, 3L), (2L, 2L, 4L)                               // 3, 4 in-deg 1
    ).toDF("id", "rank", "neighbor_id")
    val got = LlmQueries.hubnessReport(ids, knn)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // in-degrees: 4,2,1,1,0 → hist {0:1, 1:2, 2:1, 4:1}; n=5, sn=8,
    // s2=16+4+1+1=22; var_e6 = (5·22−64)·1e6 div 25 = 46·1e6/25
    val wantVar = 46L * 1000000L / 25L
    val wantHist = Map(0L -> 1L, 1L -> 2L, 2L -> 1L, 4L -> 1L)
    assert(got.map(r => r._1 -> r._2).toMap == wantHist, got.toString)
    got.foreach { case (_, _, nkMax, nZero, s2, varE6) =>
      assert(nkMax == 4L && nZero == 1L && s2 == 22L && varE6 == wantVar)
    }
    // corpus query: census conserves mass (Σ n_k·docs = |graph|) and
    // matches a local recompute of the exact graph's in-degrees
    val corpus = LlmQueries.s26Hubness(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val graph = Ann.knnGraphExact(emb, k = 5)
      .select("neighbor_id").as[Long].collect()
    val indeg = graph.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nLive = emb.filter(
      expr("aggregate(vec, 0.0D, (a, x) -> a + x * x)") > 0).count()
    val localHist = (indeg.values.toSeq ++
        Seq.fill((nLive - indeg.size).toInt)(0L))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(corpus.map(r => r._1 -> r._2).toMap == localHist)
    assert(corpus.map(r => r._1 * r._2).sum == graph.length.toLong,
      "in-degree mass must equal the graph's row count")
  }

  test("s27 hubness IVF twin: mass conserved; planted hub and variance direction match the exact census") {
    // corpus: total in-degree mass equals the IVF graph's row count
    // at ANY recall (conservation holds by construction), and the
    // histogram covers every live vector
    val corpus = LlmQueries.s27HubnessIvf(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val graphRows = Ann.knnGraph(emb, k = 5, seed = 42L).count()
    assert(corpus.map(r => r._1 * r._2).sum == graphRows,
      "in-degree mass must equal the IVF graph's row count")
    val nLive = emb.filter(
      expr("aggregate(vec, 0.0D, (a, x) -> a + x * x)") > 0).count()
    assert(corpus.map(_._2).sum == nLive, "histogram must cover every live id")
    // exact↔scale pairing on planted geometries (the s01↔s02/s03
    // shape): a HUB fixture — one anchor direction everyone is
    // moderately close to (sim 0.6), members mutually orthogonal-ish
    // (sim 0.36) — and a UNIFORM fixture (even circle, each point's
    // neighbors are its arc neighbors). Both censuses must identify
    // the planted hub as the max in-degree vector and must order the
    // two fixtures' variances the same way (hub ≫ uniform).
    val dim = 34
    val hubFix = ((0L, Seq(1.0) ++ Seq.fill(dim - 1)(0.0)) +:
      (1 to 32).map(i => (i.toLong,
        Seq(0.6) ++ Seq.tabulate(dim - 1)(j => if (j == i - 1) 0.8 else 0.0))))
      .toDF("id", "vec")
    val circleFix = (0 until 32).map { i =>
      val th = 2 * math.Pi * i / 32
      (i.toLong, Seq(math.cos(th), math.sin(th)))
    }.toDF("id", "vec")
    def census(fix: org.apache.spark.sql.DataFrame, exact: Boolean) = {
      val ids = fix.select("id")
      val g = if (exact) Ann.knnGraphExact(fix, k = 3)
        else Ann.knnGraph(fix, k = 3, seed = 42L, recallTarget = Some(0.95))
      LlmQueries.hubnessReport(ids, g)
        .select("nk_max", "var_e6").distinct()
        .as[(Long, Long)].head()
    }
    val (hubExact, hubIvf) = (census(hubFix, true), census(hubFix, false))
    val (cirExact, cirIvf) = (census(circleFix, true), census(circleFix, false))
    // the hub (id 0) is everyone's rank-1 neighbor: in-degree 32 in
    // the exact census; the calibrated IVF census must still see a
    // dominant hub (≥ 90% of queries retrieve it at recall 0.95)
    assert(hubExact._1 == 32L, s"exact hub in-degree ${hubExact._1}")
    assert(hubIvf._1 >= 29L, s"IVF hub in-degree ${hubIvf._1}")
    // variance direction: hubbed ≫ uniform through BOTH kernels
    assert(hubExact._2 > 4L * cirExact._2,
      s"exact variances: hub ${hubExact._2} vs circle ${cirExact._2}")
    assert(hubIvf._2 > 4L * cirIvf._2,
      s"IVF variances: hub ${hubIvf._2} vs circle ${cirIvf._2}")
  }

  test("hot-cell capacity signal fires on a planted blob and stays quiet on balanced cells") {
    import graft.sim.AnnIndex
    // 180 IDENTICAL vectors (a boilerplate blob no quantizer can
    // split — every copy lands in one cell) + 20 spread points;
    // 10 cells → occupancy target 20, hot threshold 3×20 = 60 (the
    // default multiple is CALIBRATED from the r14 corpus-scale
    // measurement: the clustered sf1 twin — the geometry that costs
    // s22 a 2.9× probe wall — reads maxCell/target 3.5×, while the
    // isotropic corpus reads 1.3×; 3× separates them, 4× missed the
    // damaging regime)
    val dim = 16
    val rnd = new scala.util.Random(7)
    val blob = Seq.tabulate(dim)(j => if (j == 0) 1.0 else 0.01 * j)
    val rows = (0 until 180).map(i => (i.toLong, blob)) ++
      (180 until 200).map(i =>
        (i.toLong, IndexedSeq.fill(dim)(rnd.nextGaussian()).toSeq))
    val dir = java.nio.file.Files.createTempDirectory("ann_hot").toString
    AnnIndex.build(rows.toDF("id", "vec"), nCells = 10, seed = 42L, dir = dir)
    val sig = AnnIndex.hotCellSignal(spark, dir)
    assert(sig.hot, s"expected hot: $sig")
    assert(sig.maxCell >= 180L && sig.target == 20L, sig.toString)
    assert(sig.suggestedNCells > 10, s"suggestion must bump cells: $sig")
    // maintain surfaces the same signal (stderr) without letting it
    // corrupt the recall decision: a healthy-recall hot index is
    // warned about, not rebuilt behind the operator's back
    val (_, rebuilt) = AnnIndex.maintain(spark, dir, floorPpm = 0L)
    assert(!rebuilt, "hot-cell warning must not force a rebuild by itself")
    // balanced: four well-separated tight clusters of 25 at 4 cells —
    // every cell at exactly the occupancy target
    val bal = (0 until 100).map { i =>
      val c = i % 4
      (i.toLong, Seq.tabulate(dim)(j =>
        (if (j == c) 1.0 else 0.0) + 0.001 * (i / 4)))
    }.toDF("id", "vec")
    val dir2 = java.nio.file.Files.createTempDirectory("ann_bal").toString
    AnnIndex.build(bal, nCells = 4, seed = 42L, dir = dir2)
    val sig2 = AnnIndex.hotCellSignal(spark, dir2)
    assert(!sig2.hot, s"balanced corpus flagged hot: $sig2")
  }

  test("splitHotCells resolves an append-drifted hot cell, preserves recall, reaches a stable fixpoint") {
    import graft.sim.AnnIndex
    val dim = 16
    val rnd = new scala.util.Random(11)
    // base corpus: 400 scattered points → 20 roughly balanced cells
    val base = (1000 until 1400).map(i =>
      (i.toLong, IndexedSeq.fill(dim)(rnd.nextGaussian()).toSeq))
    val dir = java.nio.file.Files.createTempDirectory("ann_split").toString
    AnnIndex.build(base.toDF("id", "vec"), nCells = 20, seed = 42L, dir = dir)
    // append drift: a narrow cone of 12 sub-blobs × 30 identical
    // copies — append assigns against the PERSISTED centroids (no
    // refit), so the cone concentrates into the one or two cells
    // nearest its axis: the capacity regime GEOCHECK measured at
    // corpus scale, reproduced deterministically. The sub-blob
    // structure is what a LOCAL quantizer can separate.
    val cone = (0 until 360).map { i =>
      val j = i % 12
      (i.toLong, Seq.tabulate(dim)(d =>
        if (d == 0) 1.0 else if (d == j + 1) 0.2 else 0.0))
    }
    AnnIndex.append(cone.toDF("id", "vec"), dir)
    val sig0 = AnnIndex.hotCellSignal(spark, dir)
    assert(sig0.hot, s"fixture must start hot: $sig0")
    val all = base ++ cone
    val qdf = all.filter(_._1 % 60 == 0).toDF("id", "vec")
    def recallPpm(): Long = {
      val truth = Ann.bruteForceTopK(all.toDF("id", "vec"), qdf, 5)
        .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
      val got = AnnIndex.probe(spark, dir, qdf, 5)
        .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
      if (truth.isEmpty) 1000000L else truth.count(got) * 1000000L / truth.size
    }
    val before = recallPpm()
    // the occupancy target tightens as cells are added (target =
    // ⌈n/nCells⌉), so convergence may take a couple of passes; the
    // contract is progress every pass and a stable quiet fixpoint
    val reports = Iterator.continually(AnnIndex.splitHotCells(spark, dir))
      .take(5).takeWhile(_.splitCells > 0).toVector
    assert(reports.nonEmpty && reports.head.splitCells >= 1,
      s"nothing split: $reports")
    assert(reports.size < 5, s"split did not converge: $reports")
    assert(reports.head.maxCellAfter < reports.head.maxCellBefore,
      reports.toString)
    val sig1 = AnnIndex.hotCellSignal(spark, dir)
    assert(!sig1.hot, s"still hot after split: $sig1 / $reports")
    // no rows lost or duplicated; centroid ids stay contiguous (the
    // "centroid position = cell id" invariant every probe assumes)
    val nv = AnnIndex.stats(spark, dir).select("n_vectors").as[Long].head()
    assert(nv == all.length.toLong, s"row count changed: $nv")
    val cents = spark.read.parquet(s"$dir/centroids")
      .select("cell").as[Int].collect().sorted.toSeq
    assert(cents == (0 until cents.length), "centroid ids must stay contiguous")
    // probe recall at the SAME calibrated operating point is preserved
    val after = recallPpm()
    assert(after >= before - 50000L, s"recall regressed: $before -> $after")
    // fixpoint is stable: one more call is a clean no-op
    val again = AnnIndex.splitHotCells(spark, dir)
    assert(again.splitCells == 0 && again.newCells == 0, again.toString)
  }

  test("splitHotCells refuses an unsplittable identical blob and terminates") {
    import graft.sim.AnnIndex
    val dim = 16
    val rnd = new scala.util.Random(7)
    val blob = Seq.tabulate(dim)(j => if (j == 0) 1.0 else 0.01 * j)
    val rows = (0 until 180).map(i => (i.toLong, blob)) ++
      (180 until 200).map(i =>
        (i.toLong, IndexedSeq.fill(dim)(rnd.nextGaussian()).toSeq))
    val dir = java.nio.file.Files.createTempDirectory("ann_refuse").toString
    AnnIndex.build(rows.toDF("id", "vec"), nCells = 10, seed = 42L, dir = dir)
    assert(AnnIndex.hotCellSignal(spark, dir).hot)
    // first call may legitimately peel scattered strays out of the
    // blob's cell; by the second call the cell is pure blob and must
    // REFUSE (no dead centroids) rather than loop
    AnnIndex.splitHotCells(spark, dir)
    val r2 = AnnIndex.splitHotCells(spark, dir)
    assert(r2.splitCells == 0 && r2.refused >= 1, r2.toString)
    val nCents = spark.read.parquet(s"$dir/centroids").count()
    val r3 = AnnIndex.splitHotCells(spark, dir)
    assert(r3.splitCells == 0 && r3.refused >= 1, r3.toString)
    assert(spark.read.parquet(s"$dir/centroids").count() == nCents,
      "a refused split must not mint centroids")
    assert(AnnIndex.hotCellSignal(spark, dir).hot,
      "an identical blob is irreducibly hot — the honest remedies are dedup or a shard")
  }

  test("a committed split heals forward on the read path; double-heal is a no-op") {
    import graft.sim.AnnIndex
    val dim = 16
    val rnd = new scala.util.Random(13)
    val base = (1000 until 1200).map(i =>
      (i.toLong, IndexedSeq.fill(dim)(rnd.nextGaussian()).toSeq))
    val dir = java.nio.file.Files.createTempDirectory("ann_heal").toString
    AnnIndex.build(base.toDF("id", "vec"), nCells = 10, seed = 42L, dir = dir)
    val cone = (0 until 120).map { i =>
      val j = i % 6
      (i.toLong, Seq.tabulate(dim)(d =>
        if (d == 0) 1.0 else if (d == j + 1) 0.2 else 0.0))
    }
    AnnIndex.append(cone.toDF("id", "vec"), dir)
    val nvBefore = AnnIndex.stats(spark, dir)
      .select("n_vectors").as[Long].head()
    // commit WITHOUT applying — exactly the crash window between the
    // marker write and the apply
    val st = AnnIndex.stageSplit(spark, dir, 3L, 42L, 256)
    assert(st.committed && st.split >= 1, st.toString)
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_graft_split_pending")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(marker), "commit marker must exist in the crash window")
    // the first reader rolls the split forward: counts exact (no row
    // lost to the retired originals, none duplicated from the staged
    // files), marker and staging dir cleared, centroids contiguous
    val nvAfter = AnnIndex.stats(spark, dir)
      .select("n_vectors").as[Long].head()
    assert(nvAfter == nvBefore, s"heal changed row count: $nvBefore -> $nvAfter")
    assert(!fs.exists(marker), "heal must clear the marker")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/.split-inprogress")),
      "heal must clear the staging dir")
    val cents = spark.read.parquet(s"$dir/centroids")
      .select("cell").as[Int].collect().sorted.toSeq
    assert(cents == (0 until cents.length), "centroid ids must stay contiguous")
    // healing again (explicitly and via a read) is a no-op
    AnnIndex.healInterruptedSplit(spark, dir)
    val nvAgain = AnnIndex.stats(spark, dir)
      .select("n_vectors").as[Long].head()
    assert(nvAgain == nvBefore)
  }

  test("s28 retrieval agreement matches a local recompute of the two top-20 lists") {
    val got = LlmQueries.s28RetrievalAgreement(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // lexical ranks from the registered s08 list (ordered output)
    val lexRank = LlmQueries.s08Bm25(spark, TestSpark.Sf)
      .as[(Long, Long)].collect().toSeq.map(_._1).filter(_ != 0L)
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    // dense ranks recomputed locally with the engines' arithmetic
    // order (index-order dot, then d / (qn * vn))
    val vecs = emb.as[(Long, Seq[Double])].collect()
    def nrm(v: Seq[Double]) = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
    val q = vecs.find(_._1 == 0L).get._2
    val qn = nrm(q)
    val denseRank = vecs
      .filter { case (id, v) => id != 0L && nrm(v) > 0 }
      .map { case (id, v) =>
        val d = q.zip(v).foldLeft(0.0)((a, p) => a + p._1 * p._2)
        (id, d / (qn * nrm(v)))
      }
      .sortBy { case (id, s) => (-s, id) }.take(20).map(_._1)
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    val ids = (lexRank.keySet ++ denseRank.keySet).toSeq
    def inK(r: Option[Long], k: Long) = r.exists(x => x >= 1 && x <= k)
    val want = Seq(5L, 10L, 20L).map { k =>
      val both = ids.count(i => inK(lexRank.get(i), k) && inK(denseRank.get(i), k)).toLong
      val lexOnly = ids.count(i => inK(lexRank.get(i), k) && !inK(denseRank.get(i), k)).toLong
      val denseOnly = ids.count(i => inK(denseRank.get(i), k) && !inK(lexRank.get(i), k)).toLong
      val dTop1 = denseRank.find(_._2 == 1L).map(_._1)
      val lTop1 = lexRank.find(_._2 == 1L).map(_._1)
      (k, both, lexOnly, denseOnly, 1000000L * both / k,
        dTop1.flatMap(lexRank.get).getOrElse(0L),
        lTop1.flatMap(denseRank.get).getOrElse(0L))
    }
    assert(got == want, s"got=$got want=$want")
    // shape invariants: overlap grows with k; counts bounded by k
    assert(got.map(_._2) == got.map(_._2).sorted)
    got.foreach { r => assert(r._2 + r._3 <= r._1 && r._2 + r._4 <= r._1, r.toString) }
  }

  test("streaming index-health monitor appends, stamps, and fires the hot-cell signal") {
    import graft.sim.AnnIndex
    val dim = 16
    // deterministic geometry: 10 well-separated tight clusters of 10
    // → cells track clusters, every cell at the occupancy target
    def spread(n: Int, from: Int) = (from until from + n).map { i =>
      val c = i % 10
      (i.toLong, Seq.tabulate(dim)(j =>
        (if (j == c) 1.0 else 0.0) + 0.001 * (i / 10)))
    }
    val dir = java.nio.file.Files.createTempDirectory("ann_health").toString
    AnnIndex.build(spread(100, 0).toDF("id", "vec"), nCells = 10,
      seed = 42L, dir = dir)
    val reports =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long, Long)]
    def monitor() = graft.streaming.EventStream.indexHealthForeachBatch(dir)(
      (r, _) => reports += r.as[(Long, Long, Long, Long, Long, Long)].head())
    val mon = monitor()
    // batch 0: 20 more spread vectors — healthy occupancy, quiet
    mon(spread(20, 100).toDF("id", "vec"), 0L)
    // batch 1: a 150-copy identical blob (boilerplate ingest) — one
    // cell swallows it and the capacity signal must fire
    val blob = Seq.tabulate(dim)(j => if (j == 0) 1.0 else 0.01 * j)
    mon((200 until 350).map(i => (i.toLong, blob)).toDF("id", "vec"), 1L)
    assert(reports.size == 2, reports.toString)
    val (b0, b1) = (reports(0), reports(1))
    assert(b0._1 == 0L && b0._2 == 120L && b0._5 == 0L, s"batch 0 quiet: $b0")
    assert(b1._1 == 1L && b1._2 == 270L && b1._5 == 1L, s"batch 1 hot: $b1")
    assert(b1._3 >= 150L && b1._6 > 10L, s"blob cell + bumped suggestion: $b1")
    // replay protection ACROSS closures (crash/restart): a fresh
    // monitor recovering the stamp skips the redelivered append but
    // still emits the health row idempotently
    monitor()((200 until 350).map(i => (i.toLong, blob)).toDF("id", "vec"), 1L)
    assert(reports.size == 3)
    assert(reports(2)._2 == 270L && reports(2)._5 == 1L,
      s"replayed batch must not double-append: ${reports(2)}")
  }

  test("s25 matryoshka audit: full-width anchor exact; planted geometries discriminate") {
    // corpus query: the full-width row audits the truth against
    // itself — recall ≡ 1e6 — and every row carries the same budget
    val rows = LlmQueries.s25MatryoshkaAudit(spark, TestSpark.Sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty && rows.last._1 == 64L && rows.last._2 == 1000000L,
      rows.toString)
    assert(rows.map(_._3).distinct.size == 1, "one truth budget")
    // MRL-shaped fixture: 8-dim vectors whose LEADING 2 dims carry
    // the cluster structure (two tight cones), tail dims tiny noise —
    // the d/4 = 2-dim prefix must already retrieve the full-width
    // neighbors (recall 1e6); the ANTI fixture puts the structure in
    // the TAIL dims, so the 2-dim prefix sees only noise and recall
    // collapses. Deterministic small doubles, no RNG.
    def mk(rows: Seq[(Long, Seq[Double])]) = rows.toDF("id", "vec")
    val lead = mk((0 until 12).map { i =>
      val c = if (i % 2 == 0) Seq(1.0, 0.1) else Seq(-0.1, 1.0)
      (i.toLong, c.map(_ + 0.001 * i) ++ Seq.fill(6)(0.0001 * (i + 1)))
    })
    val leadAudit = LlmQueries.matryoshkaAudit(lead, k = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(leadAudit(8L) == 1000000L)
    assert(leadAudit(2L) >= 900000L,
      s"leading-dim structure must survive the d/4 prefix: $leadAudit")
    val tail = mk((0 until 12).map { i =>
      val c = if (i % 2 == 0) Seq(1.0, 0.1) else Seq(-0.1, 1.0)
      (i.toLong, Seq.fill(6)(0.0001 * (i + 1)) ++ c.map(_ + 0.001 * i))
    })
    val tailAudit = LlmQueries.matryoshkaAudit(tail, k = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(tailAudit(8L) == 1000000L)
    assert(tailAudit(2L) < leadAudit(2L),
      s"tail-dim structure must hurt the prefix: $tailAudit vs $leadAudit")
  }
}
