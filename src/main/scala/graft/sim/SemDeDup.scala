package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ProductQuantizer
import graft.functions.VectorFunctions._

/** Semantic deduplication (SURVEY.md §2 #90) — Abbas et al.,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication" (2023): cluster the embedding space coarsely, then
  * look for near-duplicates ONLY within a cluster. Cell count follows
  * the IVF convention nCells ≈ √n (r15 — see `dedupFlags` for why the
  * r14 occupancy-constant geometry lost to it), so pair generation
  * drops from O(n²) to Θ(n^1.5·nTables) int8-prefiltered scorings
  * per table ([[Ann.bucketPrefilteredPairs]]) with exact verification
  * only on survivors — the same n^1.5 class as the staged k-NN graph
  * build, and the assignment scan is n·√n instead of the n·(n/occ)
  * the fixed-occupancy shape paid below its cell cap.
  *
  * One clustering misses pairs split across a cell BOUNDARY — the
  * paper's ε ≈ 0.95 regime makes that rare (true duplicates sit on
  * top of each other), but at looser thresholds it dominates. The
  * same medicine as the sign-LSH paths applies: `nTables`
  * INDEPENDENT clusterings (different seeds) OR'd together — a pair
  * is visible if co-clustered in ANY table, compounding per-table
  * recall p to 1−(1−p)^T while total work stays linear in n
  * (AnnSpec quantifies it against the exact global pair set).
  *
  * The quantizer is [[graft.functions.ProductQuantizer.fit]] with
  * m = 1 (one full-dimension subspace = plain k-means): deterministic
  * seeded driver Lloyd on a bounded hash-sample, assignment via the
  * codegen'd encode kernel — no new machinery.
  *
  * Keep rule: a vector is DROPPED iff some visible near-duplicate
  * (cosine ≥ τ, co-clustered in ≥1 table) has a smaller id.
  * Deterministic, and it guarantees the kept set contains no
  * co-clustered near-dup pair (if two near-dup vectors were both
  * kept, the larger-id one would have been dropped by the smaller —
  * proof by construction, asserted in the spec). Chains (a~b~c, a≁c)
  * drop both b and c where the paper's greedy keeps c: slightly
  * over-aggressive, never under — the safe direction for dedup.
  */
object SemDeDup {

  /** Per-vector decision: (id, cells array<long> — one cell per
    * table, exposed for the spec's invariant check — kept boolean);
    * one row per non-zero-norm input vector.
    *
    * Geometry (r15): nCells ≈ √n, the IVF/FAISS convention. The r14
    * shape held occupancy CONSTANT (nCells = n/32 up to `maxCells`),
    * which made the per-row assignment scan n·(n/32) — measured
    * super-linear through the whole pre-cap window (e 1.5-1.7,
    * SCALECHECK r15) — while the pair stage it was protecting is now
    * int8-prefiltered and no longer the bottleneck. √n cells balance
    * the two stages at Θ(n^1.5) apiece, and larger cells also RAISE
    * per-table boundary recall (the spec's quantified floor).
    *
    * `maxCells` bounds the driver Lloyd fit (cost = samples · cells ·
    * dim per iteration); √n stays under the default 1024 through
    * n = 10⁶, past which occupancy grows as n/maxCells and the
    * candidate stage trends toward the SemDeDup paper's own regime
    * (a FIXED ~100k clusters, brute force within each on GPUs). To
    * push maxCells past driver-Lloyd range, swap the fit for
    * distributed `ml.KMeans` (the s03 path); everything downstream is
    * unchanged. The fit sample scales with the cell count (≥ 8 points
    * per centroid) and stays corpus-independent. */
  def dedupFlags(vecs: DataFrame, idCol: String, vecCol: String,
                 tau: Double, seed: Long,
                 nTables: Int = 4, fitSampleCap: Long = 8192L,
                 maxCells: Int = 1024): DataFrame = {
    val live = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", norm(col("v")))
      .filter(col("nrm") > 0)
    val n = live.count()
    val nCells = math.min(maxCells,
      math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt))
    val cap = math.max(fitSampleCap, nCells.toLong * 8)
    val sampled =
      if (n <= cap) live
      else live.filter(pmod(xxhash64(col("id")), lit(n / cap + 1)) === 0)
    // bounded driver round-trip: the FIT SAMPLE only (cap × dim
    // doubles), never the corpus — same pattern as the IVF fit cap.
    // orderBy(id) first: the Lloyd fit is order-sensitive (seeded
    // shuffle init + array-order accumulation), so an unsorted
    // collect would make the codebooks depend on physical
    // partitioning, breaking the determinism claim
    val samples = sampled.orderBy("id").select(col("v"), col("nrm")).collect()
      .map { r => val v = r.getSeq[Double](0); val nr = r.getDouble(1); v.map(_ / nr).toArray }
    val books = (0 until nTables).map { t =>
      ProductQuantizer.fit(samples, m = 1, ksub = nCells, seed + 1000003L * t)
    }
    // barrier: the assigned frame feeds both sides of the self-join —
    // one exchange, one quantization pass (ReuseExchange)
    val assigned = live
      .withColumn("cells", array(books.map { cb =>
        element_at(ProductQuantizer.pqEncode(col("v"), col("nrm"), cb), 1).cast("long")
      }: _*))
      .repartition(col("id"))
    // candidate stage = the shared bucket-grouped generate-and-score
    // kernel ([[graft.sim.Ann.bucketPrefilteredPairs]], r15): each
    // (tbl, cell) bucket row carries its members' int8 codes, pairs
    // generate and prefilter INSIDE the bucket with codegen, and only
    // sound-bound survivors reach a shuffle — replacing the previous
    // bucket self-join → all-pair distinct → per-pair vector joins
    // (same restructure that took d07 from 92 to 7.4 s at sf1).
    // Survivors are exact-verified below, so the dropped set is
    // unchanged (the spec's kept-set invariant is geometry-exact).
    val dim = samples.headOption.map(_.length).getOrElse(1)
    val bkts = Ann.int8CodeCols(assigned).select(
      struct(col("id"), col("q"), col("s"), col("nrm"), col("l1q")).as("c"),
      posexplode(col("cells")).as(Seq("tbl", "bkt")))
    // verify joins read LIVE (id, v, nrm), not `assigned`: they only
    // need vectors, and as AQE-broadcast sides they bypass the
    // repartition barrier's exchange reuse — joining `assigned` here
    // recomputed the nTables pqEncode assignment once per broadcast
    // (r15 `Probe d13`: 7.9 s of assignment paid 3×; the sf1 bench line
    // read 23.2 s before and 14.9 s after this change)
    val dropped = Ann.bucketPrefilteredPairs(bkts, tau, dim)
      .join(live.select(col("id").as("id1"), col("v").as("v1"), col("nrm").as("nrm1")), "id1")
      .join(live.select(col("id").as("id2"), col("v").as("v2"), col("nrm").as("nrm2")), "id2")
      .filter(cosinePrenormed(dot(col("v1"), col("v2")), col("nrm1"), col("nrm2")) >= tau)
      .select(col("id2").as("id"))
      .distinct()
    assigned.join(dropped.withColumn("kept0", lit(false)), Seq("id"), "left")
      .select(col("id"), col("cells"), coalesce(col("kept0"), lit(true)).as("kept"))
  }
}
