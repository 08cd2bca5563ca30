package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact set-similarity self-join via prefix filtering (the
  * AllPairs/PPJoin family: Bayardo et al. WWW'07, Xiao et al. WWW'08)
  * — finds ALL pairs with Jaccard ≥ τ without an all-pairs or
  * block-quadratic compare.
  *
  * Principle: order all tokens by a global total order (ascending
  * document frequency, ties by token value). For a set of size n, any
  * partner with J ≥ τ must share one of the set's first
  * n − ⌈τ·n⌉ + 1 tokens in that order (the "prefix"): a qualifying
  * pair overlaps in i ≥ ⌈τ·n⌉ tokens, and the smallest common token
  * sits at position ≤ n − i + 1 in both sets. So joining on prefix
  * tokens alone generates every qualifying pair — the filter is
  * LOSSLESS, unlike MinHash-LSH banding (probabilistic recall) or
  * fixed length-band blocking (round-1 d04, which confined pairs to
  * same-band and was Θ(Σ block²) in the corpus).
  *
  * Scale shape: rare-token-first ordering means prefix tokens are the
  * least frequent — candidate buckets stay small even when the corpus
  * has huge common-shingle classes. Work is Θ(Σ_token df_prefix(token)²)
  * which the frequency ordering minimizes; every stage is a linear
  * shuffle (explode → count → window → join). The length filter
  * (max size ≤ min size / τ) prunes candidates before verification.
  */
object SetSimJoin {

  /** All unordered pairs (id1 < id2) with |∩|·(1+τnum/τden)… — concretely
    * Jaccard ≥ τnum/τden, compared in exact integer arithmetic:
    * J = i/(n1+n2−i) ≥ τnum/τden  ⇔  i·(τden+τnum) ≥ τnum·(n1+n2).
    *
    * Input: `df` with an id column and a column `setCol` of
    * `array<bigint>` DISTINCT token fingerprints.
    * Output: (id1, id2, inter, uni) for qualifying pairs.
    */
  /** @param touching when set (a 1-column id frame), only candidate
    *        pairs with AT LEAST one id in it go to exact verification
    *        — the incremental-ingest restriction: old↔old pairs are
    *        already known, so verification (the dominant stage) runs
    *        delta-sized. Candidate GENERATION stays union-wide because
    *        the prefix filter is lossless only under the GLOBAL token
    *        df order — a stale df order could shift an old doc's
    *        prefix and silently drop a new↔old pair. */
  def jaccardSelfJoin(df: DataFrame, idCol: String, setCol: String,
                      tauNum: Int, tauDen: Int,
                      touching: Option[DataFrame] = None): DataFrame = {
    // sort once per SET (|s| log |s|, set-linear) so exact verification
    // runs the zero-allocation merge kernel per PAIR
    // ([[graft.functions.SortedIntersectCount]] — candidate volume is
    // the dominant stage; the boxed hash set array_intersect builds
    // per pair was ~60% of the stage's wall at bench scale)
    val sets = df.select(col(idCol).as("sid"),
      sort_array(col(setCol)).as("s"))
    val cand = jaccardCandidates(df, idCol, setCol, tauNum, tauDen)
      .transform { c =>
        touching match {
          case None => c
          case Some(t) =>
            val tid = t.select(t.columns.head).toDF("tid")
            c.join(tid, c("id1") === tid("tid"), "left_semi")
              .union(c.join(tid, c("id2") === tid("tid"), "left_semi"))
              .distinct()
        }
      }

    // exact verification on candidates only.
    val s1 = sets.select(col("sid").as("id1"), col("s").as("s1"))
    val s2 = sets.select(col("sid").as("id2"), col("s").as("s2"))
    cand.join(s1, "id1").join(s2, "id2")
      .withColumn("inter",
        graft.functions.SortedIntersectCount.sortedIntersectCount(
          col("s1"), col("s2")))
      .withColumn("uni", (size(col("s1")) + size(col("s2"))).cast(LongType) - col("inter"))
      .filter(col("inter") > 0 && col("inter") * (tauDen + tauNum) >= (col("uni") + col("inter")) * tauNum)
      .select("id1", "id2", "inter", "uni")
  }

  /** Candidate stage of [[jaccardSelfJoin]] — exposed (the
    * [[graft.sim.Ann.lshCandidates]] precedent) so the d31 gate-audit
    * spec can GATE the exact side's volume at its own operating point:
    * the audit contract says "exact truth prices candidate-linear, run
    * it on a slice/cadence", and that contract is only real if the
    * candidate count is measured against a bound in the suite, not
    * asserted in prose. Output: distinct (id1, id2), id1 < id2 — every
    * pair that reaches exact verification. */
  private[graft] def jaccardCandidates(df: DataFrame, idCol: String,
                                       setCol: String,
                                       tauNum: Int, tauDen: Int): DataFrame = {
    val sets = df.select(col(idCol).as("sid"), col(setCol).as("s"))
      .withColumn("sz", size(col("s")).cast(LongType))

    // token → document frequency: the global order key (df asc, token
    // asc). One linear shuffle on token.
    val toks = sets.select(col("sid"), col("sz"), explode(col("s")).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("df"))

    // rank tokens within each set by (df, tok); keep the prefix of
    // length n − ⌈τ·n⌉ + 1. ⌈τn⌉ = (n·τnum + τden − 1) DIV τden.
    val byRarity = Window.partitionBy("sid").orderBy(col("df").asc, col("tok").asc)
    // ⌈τn⌉ via floor((n·num + den − 1) / den); `/` on columns is double
    // division, exact here (sz ≪ 2^52).
    val prefixLen = col("sz") - floor((col("sz") * tauNum + tauDen - 1) / tauDen)
      .cast(LongType) + 1
    val prefixes = toks.join(freq, "tok")
      .withColumn("pos", row_number().over(byRarity))
      .filter(col("pos") <= prefixLen)
      .select(col("sid"), col("sz"), col("tok"), col("pos"))

    // candidates: shared prefix token + two sound pre-verification
    // prunes — length filter (τ·max ≤ min), and PPJoin's positional
    // filter: matching at rarity-positions (p1, p2) caps the possible
    // overlap at 1 + min(sz1−p1, sz2−p2), which must reach the
    // τ-required overlap α = ⌈τ/(1+τ)·(sz1+sz2)⌉. On corpora with
    // heavy shared-shingle mass this kills most of what the prefix
    // filter alone lets through, BEFORE the dedup shuffle.
    val a = prefixes.toDF("id1", "sz1", "tok", "pos1")
    val b = prefixes.toDF("id2", "sz2", "tok", "pos2")
    a.join(b,
        a("tok") === b("tok") && col("id1") < col("id2") &&
        greatest(col("sz1"), col("sz2")) * tauNum <=
          least(col("sz1"), col("sz2")) * tauDen &&
        (lit(1) + least(col("sz1") - col("pos1"), col("sz2") - col("pos2"))) *
          (tauDen + tauNum) >= (col("sz1") + col("sz2")) * tauNum)
      .select("id1", "id2")
      .distinct()
  }

  /** DIRECTED containment self-join: all ordered pairs (a, b), a ≠ b,
    * with |A∩B| / |A| ≥ τnum/τden — the asymmetric measure quote /
    * excerpt detection needs: a 50-shingle quote inside a 5000-shingle
    * page has Jaccard ≈ 0.01 (invisible to [[jaccardSelfJoin]]) but
    * containment ≈ 1.0.
    *
    * Prefix filter, containment form: if |A∩B| ≥ α := ⌈τ·|A|⌉, the
    * globally-smallest common token sits within A's first
    * |A| − α + 1 tokens — so joining A-PREFIX tokens against ALL of
    * B's tokens is lossless. B gets no prefix (containment puts no
    * bound on where the witness falls in B); the rare-first order
    * keeps A-prefix tokens low-df, so candidate volume is
    * Σ_tok df_prefix(tok)·df_all(tok), frequency-minimized. Sound
    * prunes before the candidate dedup: size (|B| ≥ ⌈τ|A|⌉ — else
    * even B ⊇ A fails) and the positional bound at the earliest
    * common token (overlap ≤ 1 + min(|A|−pos_a, |B|−pos_b), which
    * must reach α; later common tokens rank later in BOTH sets, the
    * PPJoin argument). */
  def containmentJoin(df: DataFrame, idCol: String, setCol: String,
                      tauNum: Int, tauDen: Int): DataFrame = {
    // sorted once per set for the merge-kernel verify (see
    // [[jaccardSelfJoin]]); explode/df-rank downstream are
    // order-insensitive
    val sets = df.select(col(idCol).as("sid"),
      sort_array(col(setCol)).as("s"))
      .withColumn("sz", size(col("s")).cast(LongType))
    val toks = sets.select(col("sid"), col("sz"), explode(col("s")).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy("sid").orderBy(col("df").asc, col("tok").asc)
    val ranked = toks.join(freq, "tok")
      .withColumn("pos", row_number().over(byRarity))
    val prefixLen = col("sz") - floor((col("sz") * tauNum + tauDen - 1) / tauDen)
      .cast(LongType) + 1
    val a = ranked.filter(col("pos") <= prefixLen)
      .select(col("sid").as("id_a"), col("sz").as("sz_a"), col("tok"),
        col("pos").as("pos_a"))
    val b = ranked
      .select(col("sid").as("id_b"), col("sz").as("sz_b"), col("tok"),
        col("pos").as("pos_b"))
    val cand = a.join(b, Seq("tok"))
      .filter(col("id_a") =!= col("id_b") &&
        col("sz_b") * tauDen >= col("sz_a") * tauNum &&
        (lit(1) + least(col("sz_a") - col("pos_a"), col("sz_b") - col("pos_b"))) *
          tauDen >= col("sz_a") * tauNum)
      .select("id_a", "id_b")
      .distinct()
    val s1 = sets.select(col("sid").as("id_a"), col("s").as("s1"),
      col("sz").as("sz_a"))
    val s2 = sets.select(col("sid").as("id_b"), col("s").as("s2"))
    cand.join(s1, "id_a").join(s2, "id_b")
      .withColumn("inter",
        graft.functions.SortedIntersectCount.sortedIntersectCount(
          col("s1"), col("s2")))
      .filter(col("inter") * tauDen >= col("sz_a") * tauNum)
      .select("id_a", "id_b", "inter", "sz_a")
  }

  /** Corpus-side posting frame for [[containmentJoinAgainst]] — every
    * corpus token occurrence ranked under the GLOBAL order (df asc,
    * tok asc) given by `dfFrame` (tok → df over the corpus). This is
    * the frame an incremental ingest gate STAGES: it costs one corpus
    * pass to build and is read-only thereafter, so the per-batch gate
    * never recomputes corpus-wide token stats (the r12 d24 finding —
    * at 100 TB a nightly gate re-deriving the union df order pays
    * O(corpus) per batch). A corpus token ABSENT from `dfFrame` ranks
    * at df = 0 (same convention as the batch side in
    * [[containmentCandidatesAgainst]]) instead of silently dropping
    * its posting — an inner join here would void the lossless-prefix
    * contract whenever the df artifact lags the corpus (d24 builds
    * both from the same staged sets, but the contract must not depend
    * on that). Output: (id_b, sz_b, tok, pos_b). */
  def containmentPostings(corpus: DataFrame, idCol: String, setCol: String,
                          dfFrame: DataFrame): DataFrame = {
    val sets = corpus.select(col(idCol).as("id_b"), col(setCol).as("s"))
      .withColumn("sz_b", size(col("s")).cast(LongType))
    val toks = sets.select(col("id_b"), col("sz_b"), explode(col("s")).as("tok"))
    val byRarity = Window.partitionBy("id_b").orderBy(col("df").asc, col("tok").asc)
    toks.join(dfFrame.select(col("tok"), col("df")), Seq("tok"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn("pos_b", row_number().over(byRarity).cast(LongType))
      .select("id_b", "sz_b", "tok", "pos_b")
  }

  /** DIRECTED containment of a BATCH against a staged corpus —
    * [[containmentJoin]]'s incremental-ingest form: |A∩B| / |A| ≥
    * τnum/τden for batch sets A against corpus sets B, where the
    * corpus side arrives as PRE-BUILT artifacts (`corpusPostings` from
    * [[containmentPostings]], `corpusSets` = (id, set), `dfFrame` =
    * (tok, df) over the corpus) instead of being re-derived per call.
    * Per-batch work is O(batch tokens + artifact read): the batch
    * explodes once, ranks under the ARTIFACT's order, and only its
    * prefix joins the staged postings.
    *
    * Losslessness under a corpus-only (possibly stale-window) order:
    * the prefix theorem holds for ANY total order shared by both
    * sides — df-ascending merely MINIMIZES candidates — and here both
    * the batch prefix and the staged postings rank under the same
    * (artifact df asc, tok asc) order, so no qualifying new→old pair
    * can be dropped. A batch token absent from the artifact gets
    * df = 0: it ranks earliest (possibly occupying prefix slots), and
    * since NO corpus posting carries it, it generates zero candidates
    * — an all-novel-token batch produces an empty candidate set
    * outright (DedupSpec pins both properties). Decisions are
    * bit-identical to the union-order [[containmentJoin]] because
    * verification is exact set arithmetic either way.
    * Output: (id_a, id_b, inter, sz_a) — batch id first. */
  def containmentJoinAgainst(batch: DataFrame, idCol: String, setCol: String,
                             corpusPostings: DataFrame,
                             corpusSets: DataFrame,
                             dfFrame: DataFrame,
                             tauNum: Int, tauDen: Int): DataFrame = {
    val sets = batch.select(col(idCol).as("id_a"), col(setCol).as("s"))
      .withColumn("sz_a", size(col("s")).cast(LongType))
    val cand = containmentCandidatesAgainst(batch, idCol, setCol,
      corpusPostings, dfFrame, tauNum, tauDen)
    // sort_array sits in the join INPUT projections: one sort per set
    // row (batch side) / corpus row (staged side, whose artifact makes
    // no ordering promise), then the per-PAIR merge kernel — see
    // [[jaccardSelfJoin]]
    val s1 = sets.select(col("id_a"), sort_array(col("s")).as("s1"),
      col("sz_a"))
    val s2 = corpusSets.select(col(corpusSets.columns.head).as("id_b"),
      sort_array(col(corpusSets.columns(1))).as("s2"))
    cand.join(s1, "id_a").join(s2, "id_b")
      .withColumn("inter",
        graft.functions.SortedIntersectCount.sortedIntersectCount(
          col("s1"), col("s2")))
      .filter(col("inter") * tauDen >= col("sz_a") * tauNum)
      .select("id_a", "id_b", "inter", "sz_a")
  }

  /** Candidate stage of [[containmentJoinAgainst]] — exposed (the
    * [[jaccardCandidates]] precedent) so the gate's per-batch work
    * bound is a MEASUREMENT in the suite: DedupSpec pins that an
    * all-novel-token batch generates ZERO candidates and that a
    * planted batch's candidate count stays candidate-scale. Output:
    * distinct (id_a, id_b) — every pair that reaches verification. */
  private[graft] def containmentCandidatesAgainst(
      batch: DataFrame, idCol: String, setCol: String,
      corpusPostings: DataFrame, dfFrame: DataFrame,
      tauNum: Int, tauDen: Int): DataFrame = {
    val sets = batch.select(col(idCol).as("id_a"), col(setCol).as("s"))
      .withColumn("sz_a", size(col("s")).cast(LongType))
    val toks = sets.select(col("id_a"), col("sz_a"), explode(col("s")).as("tok"))
    val byRarity = Window.partitionBy("id_a").orderBy(col("df").asc, col("tok").asc)
    val ranked = toks
      .join(dfFrame.select(col("tok"), col("df")), Seq("tok"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn("pos_a", row_number().over(byRarity).cast(LongType))
    val prefixLen = col("sz_a") -
      floor((col("sz_a") * tauNum + tauDen - 1) / tauDen).cast(LongType) + 1
    val a = ranked.filter(col("pos_a") <= prefixLen)
      .select("id_a", "sz_a", "tok", "pos_a")
    a.join(corpusPostings, Seq("tok"))
      .filter(col("id_a") =!= col("id_b") &&
        col("sz_b") * tauDen >= col("sz_a") * tauNum &&
        (lit(1) + least(col("sz_a") - col("pos_a"), col("sz_b") - col("pos_b"))) *
          tauDen >= col("sz_a") * tauNum)
      .select("id_a", "id_b")
      .distinct()
  }
}
