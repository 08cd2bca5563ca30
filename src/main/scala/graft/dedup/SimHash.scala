package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SimHash near-duplicate detection (SURVEY.md §2 #23).
  *
  * Each document folds its shingle hashes into a single 64-bit
  * signature (bit j = sign of Σ ±1 over shingles); near-dups have
  * small Hamming distance. Candidate generation uses the pigeonhole
  * principle: split the signature into `nBands` chunks — any pair
  * within Hamming distance `nBands - 1` shares at least one exact
  * chunk, so an equi-join on (chunk index, chunk value) finds all
  * such pairs without O(n²) comparison. Verification is
  * `bit_count(sig1 ^ sig2)`, codegen'd.
  */
object SimHash {

  case class SimHash64(child: Expression)
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.catalogString}")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(SimHash.simhashOf(input.asInstanceOf[ArrayData]))

    /** Full codegen via a static helper — keeps the surrounding
      * projection in whole-stage codegen (see MinHashSignature). */
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.dedup.SimHash.simhashOf($c)")

    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** Hot loop; referenced from generated code — keep public/static. */
  def simhashOf(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      val v = arr.getLong(j)
      var b = 0
      while (b < 64) {
        if (((v >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def simhash(shingleHashes: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(shingleHashes)))

  /** Near-dup pairs with Hamming distance ≤ maxHamming, via chunk
    * banding (guaranteed complete for maxHamming ≤ nBands - 1). Bands
    * partition ALL 64 bits — when nBands does not divide 64 the first
    * (64 mod nBands) bands carry one extra bit (same scheme as
    * [[blockWidths]]), so no signature bit is ever left out of every
    * chunk key and the pigeonhole guarantee holds for any nBands. */
  def nearDupPairs(sigs: DataFrame, idCol: String, sigCol: String,
                   nBands: Int, maxHamming: Int): DataFrame = {
    require(nBands >= 1 && nBands <= 64, s"nBands must be in [1, 64], got $nBands")
    val widths = blockWidths(nBands)
    val offsets = widths.scanLeft(0)(_ + _)
    // materialization barrier: both self-join sides canonicalize to
    // the same exchange, so ReuseExchange computes the signatures
    // exactly once instead of once per side
    val mat = sigs.repartition(col(idCol))
    val chunkArr = array((0 until nBands).map { j =>
      val mask = if (widths(j) == 64) -1L else (1L << widths(j)) - 1
      shiftrightunsigned(col(sigCol), offsets(j)).bitwiseAND(lit(mask))
    }: _*)
    val chunks = mat.select(
        col(idCol), col(sigCol),
        posexplode(chunkArr).as(Seq("chunk", "cv")))
    val c1 = chunks.toDF("id1", "sig1", "chunk1", "cv1")
    val c2 = chunks.toDF("id2", "sig2", "chunk2", "cv2")
    c1.join(c2,
        col("chunk1") === col("chunk2") && col("cv1") === col("cv2") &&
        col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        expr("bit_count(sig1 ^ sig2)").cast(LongType).as("hamming"))
      // hamming filter BEFORE distinct: bit_count is codegen'd and
      // discards the (potentially huge) far-pair candidate mass
      // before the distinct's shuffle — on saturated-signature
      // corpora this is a >10× difference
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Block widths covering all 64 bits: the first (64 mod nBlocks)
    * blocks carry one extra bit. */
  private def blockWidths(nBlocks: Int): Seq[Int] = {
    val base = 64 / nBlocks
    val extra = 64 % nBlocks
    Seq.tabulate(nBlocks)(j => if (j < extra) base + 1 else base)
  }

  /** Candidate pairs of the blocked scheme, exposed for the volume
    * spec: one table per (nBlocks − maxHamming)-subset of blocks,
    * keyed on the concatenation of those blocks' bits. */
  private[graft] def blockedCandidates(sigs: DataFrame, idCol: String,
                                       sigCol: String, nBlocks: Int,
                                       maxHamming: Int): DataFrame = {
    require(nBlocks > maxHamming && nBlocks <= 16)
    val widths = blockWidths(nBlocks)
    val offsets = widths.scanLeft(0)(_ + _)
    def block(j: Int): Column =
      shiftrightunsigned(col(sigCol), offsets(j)).bitwiseAND(lit((1L << widths(j)) - 1))
    val subsets = (0 until nBlocks).combinations(nBlocks - maxHamming).toSeq
    // keep maxHamming·(width+1) bits free: the widest key is
    // (nBlocks − maxHamming) blocks ≤ 64 − maxHamming·⌊64/nBlocks⌋ bits
    val keyed = sigs.select(
      col(idCol), col(sigCol),
      posexplode(array(subsets.map { s =>
        s.foldLeft(lit(0L): Column)((acc, j) => shiftleft(acc, widths(j)).bitwiseOR(block(j)))
      }: _*)).as(Seq("tbl", "key")))
    val k1 = keyed.toDF("id1", "sig1", "tbl1", "key1")
    val k2 = keyed.toDF("id2", "sig2", "tbl2", "key2")
    k1.join(k2,
      col("tbl1") === col("tbl2") && col("key1") === col("key2") &&
      col("id1") < col("id2"))
  }

  /** Scale variant of [[nearDupPairs]] (Manku et al., WWW'07 §3): the
    * simple banding is the nBlocks = maxHamming + 1 special case, and
    * its bucket key is only 64/nBands bits — 16 bits at the standard
    * 4/3 config, so bucket population is n/2¹⁶ and the per-band
    * candidate join goes quadratic long before web scale. Splitting
    * into nBlocks > maxHamming + 1 blocks and joining once per
    * (nBlocks − maxHamming)-subset widens the key to ~64·(1 −
    * maxHamming/nBlocks) bits: at 6/3 that is ~32 bits — bucket
    * population divides by 2¹⁶ — for C(6,3) = 20 tables instead
    * of 4. Completeness is the same pigeonhole: ≤ maxHamming flipped
    * bits touch ≤ maxHamming blocks, so some kept subset is entirely
    * clean. Precision is exact either way (bit_count verification);
    * DedupSpec asserts output equality with the banded path. */
  def nearDupPairsBlocked(sigs: DataFrame, idCol: String, sigCol: String,
                          nBlocks: Int = 6, maxHamming: Int = 3): DataFrame = {
    val mat = sigs.repartition(col(idCol))
    blockedCandidates(mat, idCol, sigCol, nBlocks, maxHamming)
      .select(col("id1"), col("id2"),
        expr("bit_count(sig1 ^ sig2)").cast(LongType).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** [[nearDupPairsBlocked]] with IDENTICAL-signature collapse — the
    * d01 dedup-before-the-expensive-join idiom applied to the hamming
    * pairing: every row of an identical-sig class enters every block
    * bucket its twins enter, so the blocked join's per-(table, key)
    * volume grows with the SQUARE of class size — on inputs with
    * heavy identical-hash classes (m04 feeds two wire-format variants
    * per doc whose pixel hashes agree by construction; boilerplate
    * renders collide across docs too) most candidate pairs are
    * re-derivations of "these sigs are equal". Here the join runs on
    * ONE representative per distinct sig value; identical-class pairs
    * (hamming 0) are emitted combinatorially for classes up to
    * `maxClassSize`, and each rep-level pair expands to its classes'
    * cross product with the rep pair's hamming (equal values ⇒ equal
    * distances). For those inputs the output is EXACTLY
    * [[nearDupPairsBlocked]]'s — same rows, any sig configuration —
    * pinned set-equal by DedupSpec on planted identical/near/far
    * classes and on the m04 corpus feed.
    *
    * DEGENERATE-CLASS BOUND (r13 verdict task 2): a web-scale
    * boilerplate class (every copy of a template page hashes
    * identical) can reach 10⁷–10⁸ members; holding it as one
    * `collect_list` row is a task OOM and its C(n,2) within-class
    * emission is combinatorial output no consumer can hold either.
    * Classes LARGER than `maxClassSize` therefore switch to a STAR
    * representation: the class's min-id member is its representative,
    * within-class pairs are the n−1 (rep → member, hamming 0) star
    * edges, and cross-class pairs substitute the rep for the whole
    * class. No array row ever exceeds `maxClassSize` elements and the
    * class's output is linear in its size. Connected components are
    * IDENTICAL to the exact contract's (every member reaches the rep
    * at distance 0; the rep carries the class's external edges), so
    * cluster/dedup consumers (d06's CC, canonical pick) are
    * unaffected; only the explicit pair multiset thins — exactly the
    * `etl.CoOccur.pairs` per-basket truncation idiom, pinned by
    * DedupSpec's planted 10⁴-member class. */
  def nearDupPairsCollapsed(sigs: DataFrame, idCol: String, sigCol: String,
                            nBlocks: Int = 6, maxHamming: Int = 3,
                            maxClassSize: Int = 4096): DataFrame = {
    require(maxClassSize >= 1, s"maxClassSize must be >= 1, got $maxClassSize")
    // the SIG VALUE is the rep key (unique per class by construction
    // — a min-id rep would collide when one id carries two different
    // sigs and the rep join's id1 < id2 would silently drop the
    // cross-class pair); (vid, sig) rows are deduped up front so
    // repeated input rows cannot multiply output rows the blocked
    // kernel's distinct() would collapse, and so class sizes count
    // MEMBERS, not occurrences
    val members = sigs
      .select(col(idCol).as("vid"), col(sigCol).as("sig"))
      // a NULL sig never joins in the blocked kernel (null block keys
      // fail the equi-join) — grouping it here would mint hamming-0
      // pairs among failed-signature rows the kernel never emits
      .filter(col("sig").isNotNull)
      .distinct()
    val stats = members.groupBy("sig")
      .agg(count(lit(1)).as("csz"), min("vid").as("rep"))
    // one row per distinct sig — the rep-level join's input either way
    val repPairs = nearDupPairsBlocked(
      stats.select(col("sig").as("rid"), col("sig")),
      "rid", "sig", nBlocks, maxHamming)
    // expansion side: a small class expands a rep pair to all its
    // members; an over-cap class contributes its rep ONLY (the star
    // contract) — so the expansion join never multiplies by a
    // degenerate class's size
    val expand = members.join(stats, "sig")
      .filter(col("csz") <= maxClassSize || col("vid") === col("rep"))
      .select(col("sig"), col("vid"))
    val cross = repPairs
      .join(expand.select(col("sig").as("id1"), col("vid").as("v1")), "id1")
      .join(expand.select(col("sig").as("id2"), col("vid").as("v2")), "id2")
      // an id appearing in BOTH classes would mint a self-pair the
      // blocked kernel's id1 < id2 predicate never emits
      .filter(col("v1") =!= col("v2"))
      .select(least(col("v1"), col("v2")).as("id1"),
        greatest(col("v1"), col("v2")).as("id2"), col("hamming"))
      // two class pairs can expand to the same (id1, id2, hamming)
      // triple when ids span classes — the blocked kernel distinct()s
      .distinct()
    // within-class pairs, small classes: the exact C(n,2) contract.
    // vids is sorted+distinct and bounded by maxClassSize, so x > v1
    // enumerates each unordered pair once PER CLASS — two ids sharing
    // TWO identical-sig classes would still emit their hamming-0 row
    // twice without the distinct (the blocked kernel distinct()s the
    // triple)
    val withinSmall = members.join(stats.filter(col("csz") <= maxClassSize)
        .select("sig"), "sig")
      .groupBy("sig")
      .agg(sort_array(collect_list("vid")).as("vids"))
      .select(explode(col("vids")).as("v1"), col("vids"))
      .select(col("v1").as("id1"),
        explode(expr("filter(vids, x -> x > v1)")).as("id2"))
      .withColumn("hamming", lit(0L))
      .distinct()
    // within-class, over-cap classes: n−1 star edges to the min-id
    // rep (rep < member by construction, so (id1, id2) is ordered);
    // distinct for the same shared-two-classes reason as above
    val withinBig = members.join(stats.filter(col("csz") > maxClassSize)
        .select(col("sig"), col("rep")), "sig")
      .filter(col("vid") =!= col("rep"))
      .select(col("rep").as("id1"), col("vid").as("id2"),
        lit(0L).as("hamming"))
      .distinct()
    cross.unionByName(withinSmall).unionByName(withinBig)
  }
}
