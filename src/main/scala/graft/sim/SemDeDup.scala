package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ProductQuantizer
import graft.functions.VectorFunctions._

/** Semantic deduplication (SURVEY.md §2 #90) — Abbas et al.,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication" (2023): cluster the embedding space coarsely, then
  * look for near-duplicates ONLY within a cluster. Pair generation
  * drops from O(n²) to Θ(n·occupancy·nTables): with
  * occupancy-constant cells (nCells = n/occupancy, the same invariant
  * the LSH paths hold) each vector compares against ~occupancy
  * cluster-mates regardless of corpus size.
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
    * `maxCells` bounds the driver Lloyd fit (cost = samples · cells ·
    * dim per iteration). Below n = occupancy·maxCells the cell count
    * tracks the corpus and within-cell work is Θ(n·occupancy);
    * beyond it occupancy grows as n/maxCells and the candidate stage
    * is Θ(n²/maxCells·nTables) — the SemDeDup paper's own regime
    * (they run a FIXED ~100k clusters and brute-force within each on
    * GPUs). To push maxCells past driver-Lloyd range, swap the fit
    * for distributed `ml.KMeans` (the s03 path); everything
    * downstream is unchanged. The fit sample scales with the cell
    * count (≥ 8 points per centroid) and stays corpus-independent. */
  def dedupFlags(vecs: DataFrame, idCol: String, vecCol: String,
                 tau: Double, seed: Long, occupancy: Long = 32L,
                 nTables: Int = 4, fitSampleCap: Long = 8192L,
                 maxCells: Int = 1024): DataFrame = {
    val live = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", norm(col("v")))
      .filter(col("nrm") > 0)
    val n = live.count()
    val nCells = math.min(maxCells, math.max(8, (n / occupancy).toInt))
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
    // (id, tbl, cell) exploded — identical candidate shape to the
    // sign-LSH tables; the join key (tbl, cell) keeps tables
    // disjoint. Candidates carry IDS ONLY (16-byte rows): shuffling
    // vectors through the self-join would move 2·nTables copies of
    // every embedding — the cost lshNearDupPairs documents avoiding.
    // Vectors re-join by id AFTER the multi-table distinct, so each
    // surviving pair is cosine-verified exactly once.
    val cells = assigned.select(col("id"), posexplode(col("cells")).as(Seq("tbl", "cell")))
    val cand = cells.toDF("id1", "tbl", "cell")
      .join(cells.toDF("id2", "tbl2", "cell2"),
        col("tbl") === col("tbl2") && col("cell") === col("cell2") &&
        col("id1") < col("id2"))
      .select("id1", "id2")
      .distinct()
    val dropped = cand
      .join(assigned.select(col("id").as("id1"), col("v").as("v1"), col("nrm").as("nrm1")), "id1")
      .join(assigned.select(col("id").as("id2"), col("v").as("v2"), col("nrm").as("nrm2")), "id2")
      .filter(cosinePrenormed(dot(col("v1"), col("v2")), col("nrm1"), col("nrm2")) >= tau)
      .select(col("id2").as("id"))
      .distinct()
    assigned.join(dropped.withColumn("kept0", lit(false)), Seq("id"), "left")
      .select(col("id"), col("cells"), coalesce(col("kept0"), lit(true)).as("kept"))
  }
}
