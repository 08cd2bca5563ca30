package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scale-safe GLOBAL order statistics — row numbers and running
  * totals over a total order of the WHOLE table without the
  * single-task `row_number() OVER (ORDER BY …)` window (an empty
  * partition spec funnels every row through one task: the
  * global-sequence scale-killer, the whole-table sibling of the q50
  * low-cardinality-key shape).
  *
  * Regime — a deterministic two-pass distributed prefix sum (the
  * TeraSort offset trick, minus sampled boundaries):
  *
  *   1. ORDER-ALIGNED BUCKETS from the key's value domain: a tiny
  *      min/max aggregate (1 row, broadcast back) fixes equal-width
  *      bucket bounds, so bucket assignment is a pure deterministic
  *      expression of the key. `repartitionByRange` is deliberately
  *      NOT used: its RangePartitioner SAMPLES boundaries, and the
  *      bucketed frame appears in two subplans here (partials + final
  *      windows) — if exchange reuse ever failed to kick in, two
  *      samplings could disagree and mis-assign offsets. Width-based
  *      buckets cannot drift.
  *   2. per-bucket partials (count + sum) — map-side-combined, output
  *      ≤ `buckets` rows.
  *   3. exclusive prefix offsets over that tiny frame — the ONLY
  *      unpartitioned window, and it sees ≤ `buckets` rows: bounded
  *      by configuration, not data.
  *   4. offsets broadcast back; `row_number` / running `sum` windows
  *      partitioned by bucket id — high-cardinality key, one bucket
  *      per task, full parallelism.
  *
  * Equal-width buckets assume the key domain is not pathologically
  * skewed; oversubscribe (default 8× shuffle partitions) so moderate
  * skew still leaves each bucket a small slice. For dense surrogate
  * keys (the training-sample-indexing case) the split is exactly
  * balanced. Inputs are scanned twice (partials + final) — at scale,
  * both scans are column-pruned parquet reads, the same trade
  * [[graft.functions.HistogramRank]] makes.
  *
  * Requirements: `key` non-null numeric; (key, ties) a total order
  * (tie-free). Running totals are exact for integral `valueCol`.
  */
object GlobalOrder {

  /** Adds `seqCol` — the 1-based global row number in (key, ties)
    * order — and, when `valueCol` is set, `runCol` — the inclusive
    * global running total of `valueCol` in that same order.
    *
    * `partitionCols` (r15): an INDEPENDENT sequence per partition
    * group in one pass — what a per-group caller otherwise gets by
    * filtering and calling this once per value (the publish shard
    * plan ran 3 split-filtered passes over the kept corpus; one
    * partitioned pass reads it once). The offset window stays bounded:
    * ≤ `buckets` rows per group, partitioned on the group key. */
  def withGlobalSeq(df: DataFrame, key: String, ties: Seq[String],
                    valueCol: Option[String] = None,
                    seqCol: String = "seq", runCol: String = "run",
                    buckets: Int = 0,
                    partitionCols: Seq[String] = Nil): DataFrame = {
    val nb =
      if (buckets > 0) buckets
      else df.sparkSession.sessionState.conf.numShufflePartitions * 8
    val grp = partitionCols.map(col)
    val bounds = df.agg(
      min(col(key).cast(LongType)).as("_go_lo"),
      max(col(key).cast(LongType)).as("_go_hi"))
    // bucket width ≥ 1 and ≈ domain/nb ⇒ bucket ids land in [0, nb]
    // (bounds stay GLOBAL under partitionCols: bucket ids only need to
    // be order-aligned within each group, and one tiny global agg
    // beats |groups| of them)
    val withB = df.crossJoin(broadcast(bounds))
      .withColumn("_go_b",
        (col(key).cast(LongType) - col("_go_lo")) /
          ((col("_go_hi") - col("_go_lo")) / nb + lit(1L)))
      .withColumn("_go_b", col("_go_b").cast(LongType))
      .drop("_go_lo", "_go_hi")
    val partials = withB.groupBy(grp :+ col("_go_b"): _*).agg(
      count(lit(1)).as("_go_cnt"),
      valueCol.map(v => sum(col(v)).as("_go_sum"))
        .getOrElse(lit(0L).as("_go_sum")))
    val wOff = (if (grp.isEmpty) Window.orderBy("_go_b")
                else Window.partitionBy(grp: _*).orderBy("_go_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = partials.select(
      grp ++ Seq(
        col("_go_b"),
        coalesce(sum("_go_cnt").over(wOff), lit(0L)).as("_go_coff"),
        coalesce(sum("_go_sum").over(wOff), lit(0L)).as("_go_soff")): _*)
    val wB = Window.partitionBy(grp :+ col("_go_b"): _*)
      .orderBy((key +: ties).map(col): _*)
    val seqd = withB.join(broadcast(offsets), partitionCols :+ "_go_b")
      .withColumn(seqCol,
        col("_go_coff") + row_number().over(wB).cast(LongType))
    val out = valueCol match {
      case Some(v) => seqd.withColumn(runCol,
        col("_go_soff") +
          sum(col(v)).over(wB.rowsBetween(Window.unboundedPreceding, 0)))
      case None => seqd
    }
    out.drop("_go_b", "_go_coff", "_go_soff")
  }

  /** Global 1-based row number over (`coarse` DESC|ASC, `fine` ASC)
    * when the COARSE key has a BOUNDED domain (quality bands, milli
    * scores, priority tiers) and single coarse values can hold a
    * corpus-scale share of the rows. Both standard shapes break
    * there: a window partitioned by the coarse key alone funnels each
    * band through one task (the q50 class), and [[withGlobalSeq]]'s
    * equal-width bucketing of a composite numeric key degenerates
    * when the mass concentrates in few coarse values (most buckets
    * empty, one full). Two prefix-sum levels fix both:
    *
    *   1. per-coarse counts (≤ |domain| rows) → exclusive offsets in
    *      coarse order — the only unpartitioned window, and it is
    *      DOMAIN-bounded, never data-bounded;
    *   2. within each coarse value, `fine`-keyed equal-width buckets:
    *      per-(coarse, bucket) partial counts, bucket offsets via a
    *      window PARTITIONED BY coarse (≤ `buckets` rows per
    *      partition), and a row_number partitioned by the
    *      high-cardinality (coarse, bucket) pair — full parallelism
    *      inside even a band holding 90% of the corpus.
    *
    * `fine` must be numeric, non-null and UNIQUE (a surrogate id) —
    * it is both the tie-break and the bucketing axis. */
  /** PER-GROUP 1-based rank in `fine` order when the group key has a
    * BOUNDED domain (languages, sources, tiers) and one group can
    * hold a corpus-scale row share — the per-group twin of
    * [[withBandedGlobalSeq]] (its level 2 alone, no coarse offsets):
    * a window partitioned by the group key serializes the big group
    * through one task (the q50 class); here each group's rank space
    * splits across `fine`-keyed equal-width buckets, with per-(group,
    * bucket) offsets from a window that sees ≤ `buckets` rows per
    * group — full parallelism inside even a group holding 90% of the
    * corpus. `fine` must be numeric, non-null, unique (the tie-break
    * and bucketing axis, as in withBandedGlobalSeq). Equal-width
    * bucketing assumes a not-heavy-tailed `fine` domain — see
    * [[withGroupCumBefore]]'s KNOWN LIMITATION note (one outlier can
    * collapse the histogram into one bucket and re-create the
    * single-task sort; correctness unaffected).
    *
    * `broadcastOffsets`: the offsets frame holds one row per (group,
    * bucket) pair PRESENT — ≤ |domain|·buckets for a bounded group
    * domain (languages: broadcast, the default), but ≥ |groups| rows
    * when the group key is high-cardinality (dedup roots: one row per
    * cluster, corpus-scale — a broadcast would be a driver-heap
    * ceiling). Pass false there: the join runs as a plain shuffle
    * join co-partitioned on (group, bucket), the same exchange the
    * row_number window needs anyway. */
  def withGroupSeq(df: DataFrame, group: String, fine: String,
                   seqCol: String = "gseq",
                   buckets: Int = 0,
                   broadcastOffsets: Boolean = true): DataFrame = {
    val nb =
      if (buckets > 0) buckets
      else df.sparkSession.sessionState.conf.numShufflePartitions * 8
    val bounds = df.agg(min(col(fine).cast(LongType)).as("_gs_lo"),
      max(col(fine).cast(LongType)).as("_gs_hi"))
    val withB = df.crossJoin(broadcast(bounds))
      .withColumn("_gs_b",
        ((col(fine).cast(LongType) - col("_gs_lo")) /
          ((col("_gs_hi") - col("_gs_lo")) / nb + lit(1L))).cast(LongType))
      .drop("_gs_lo", "_gs_hi")
    val partials = withB.groupBy(col(group), col("_gs_b"))
      .agg(count(lit(1)).as("_gs_c"))
    val wB = Window.partitionBy(group).orderBy("_gs_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketOff = partials.select(col(group), col("_gs_b"),
      coalesce(sum("_gs_c").over(wB), lit(0L)).as("_gs_boff"))
    val wFine = Window.partitionBy(col(group), col("_gs_b"))
      .orderBy(col(fine))
    val off = if (broadcastOffsets) broadcast(bucketOff) else bucketOff
    withB.join(off, Seq(group, "_gs_b"))
      .withColumn(seqCol,
        col("_gs_boff") + row_number().over(wFine).cast(LongType))
      .drop("_gs_b", "_gs_boff")
  }

  /** Per-group EXCLUSIVE running total of `valueCol` in `fine` order —
    * the prefix-sum sibling of [[withGroupSeq]] for histogram CDFs: a
    * rank statistic over a DATA-scale value domain (prices, cents)
    * needs "Σ counts of strictly-smaller values within the group", and
    * a window partitioned by a low-cardinality group key alone
    * buffer-sorts the whole histogram of the biggest group through one
    * task (the q50 funnel). Same two-pass regime: `fine`-keyed
    * equal-width buckets from a broadcast min/max, per-(group, bucket)
    * partial SUMS, per-group bucket offsets from a window that sees
    * ≤ `buckets` rows per group, then the in-bucket exclusive running
    * sum partitioned by the high-cardinality (group, bucket) pair.
    *
    * `fine` must be numeric, non-null, and unique WITHIN each group
    * (a histogram's value axis); `valueCol` integral (exact totals).
    * Adds `cumCol` = Σ valueCol over rows of the same group with
    * strictly smaller `fine` (0 for the group's first value).
    *
    * KNOWN LIMITATION (shared with [[withGroupSeq]]): buckets are
    * EQUAL-WIDTH over the global [min, max] of `fine`. On a
    * heavy-tailed value domain a single extreme outlier stretches the
    * width until nearly every row lands in one bucket, and the
    * in-bucket window then degrades to exactly the single-task sort
    * this helper exists to avoid — correctness is unaffected (the
    * offsets algebra holds for ANY bucketing), but the parallelism
    * claim assumes a roughly uniform-ish domain (ids, cents within a
    * price book, day ordinals). For a heavy-tailed `fine`, pre-map it
    * through a rank-preserving contraction the domain allows (e.g.
    * band on log2(fine) via `shiftright`/bit length for counts), or
    * derive explicit boundaries from `approx_percentile` and assign
    * buckets with an O(log nb) expression — the offsets passes below
    * are bucketing-agnostic and need no change. */
  def withGroupCumBefore(df: DataFrame, group: String, fine: String,
                         valueCol: String, cumCol: String = "cum_before",
                         buckets: Int = 0,
                         broadcastOffsets: Boolean = true): DataFrame = {
    val nb =
      if (buckets > 0) buckets
      else df.sparkSession.sessionState.conf.numShufflePartitions * 8
    val bounds = df.agg(min(col(fine).cast(LongType)).as("_gc_lo"),
      max(col(fine).cast(LongType)).as("_gc_hi"))
    val withB = df.crossJoin(broadcast(bounds))
      .withColumn("_gc_b",
        ((col(fine).cast(LongType) - col("_gc_lo")) /
          ((col("_gc_hi") - col("_gc_lo")) / nb + lit(1L))).cast(LongType))
      .drop("_gc_lo", "_gc_hi")
    val partials = withB.groupBy(col(group), col("_gc_b"))
      .agg(sum(col(valueCol)).as("_gc_s"))
    val wB = Window.partitionBy(group).orderBy("_gc_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketOff = partials.select(col(group), col("_gc_b"),
      coalesce(sum("_gc_s").over(wB), lit(0L)).as("_gc_boff"))
    val wFine = Window.partitionBy(col(group), col("_gc_b"))
      .orderBy(col(fine)).rowsBetween(Window.unboundedPreceding, -1)
    val off = if (broadcastOffsets) broadcast(bucketOff) else bucketOff
    withB.join(off, Seq(group, "_gc_b"))
      .withColumn(cumCol,
        col("_gc_boff") + coalesce(sum(col(valueCol)).over(wFine), lit(0L)))
      .drop("_gc_b", "_gc_boff")
  }

  /** `dataScaleCoarse`: the default path assumes the coarse DOMAIN is
    * configuration-bounded (quality bands, milli scores, languages) —
    * its exclusive prefix runs as one unpartitioned window over
    * |domain| rows and its offset frames broadcast. When the coarse
    * key is DATA-bounded (t46's within-cluster rank: bounded by the
    * largest cluster, which is corpus-share in the soft-dedup regime),
    * pass true: the coarse axis must be NUMERIC, its prefix sum runs
    * as the same two-level bucketed pass the fine axis uses (tiny
    * unpartitioned window over ≤ `buckets` rows, then a
    * bucket-partitioned window over ≈ |domain|/buckets rows per task),
    * and both offset frames shuffle-join instead of broadcasting
    * (each can hold ≥ |domain| rows — a driver-heap ceiling). */
  def withBandedGlobalSeq(df: DataFrame, coarse: String, fine: String,
                          coarseDesc: Boolean = true,
                          seqCol: String = "seq",
                          buckets: Int = 0,
                          ties: Seq[String] = Nil,
                          dataScaleCoarse: Boolean = false): DataFrame = {
    val nb =
      if (buckets > 0) buckets
      else df.sparkSession.sessionState.conf.numShufflePartitions * 8
    val cOrd = if (coarseDesc) col(coarse).desc else col(coarse).asc
    val coarseCounts = df.groupBy(coarse).agg(count(lit(1)).as("_bg_c"))
    val coarseOff =
      if (!dataScaleCoarse) {
        val wC = Window.orderBy(cOrd).rowsBetween(Window.unboundedPreceding, -1)
        coarseCounts.select(col(coarse),
          coalesce(sum("_bg_c").over(wC), lit(0L)).as("_bg_coff"))
      } else {
        require(df.schema(coarse).dataType
            .isInstanceOf[org.apache.spark.sql.types.NumericType],
          s"dataScaleCoarse needs a numeric coarse key, got '$coarse'")
        val b2 = df.agg(min(col(coarse).cast(LongType)).as("_bg_clo"),
          max(col(coarse).cast(LongType)).as("_bg_chi"))
        val cb = coarseCounts.crossJoin(broadcast(b2))
          .withColumn("_bg_cb",
            ((col(coarse).cast(LongType) - col("_bg_clo")) /
              ((col("_bg_chi") - col("_bg_clo")) / nb + lit(1L))).cast(LongType))
          .drop("_bg_clo", "_bg_chi")
        val cbOrd = if (coarseDesc) col("_bg_cb").desc else col("_bg_cb").asc
        val wCB = Window.orderBy(cbOrd)
          .rowsBetween(Window.unboundedPreceding, -1)
        val cbOff = cb.groupBy("_bg_cb").agg(sum("_bg_c").as("_bg_cbc"))
          .select(col("_bg_cb"),
            coalesce(sum("_bg_cbc").over(wCB), lit(0L)).as("_bg_cboff"))
        val wInB = Window.partitionBy("_bg_cb").orderBy(cOrd)
          .rowsBetween(Window.unboundedPreceding, -1)
        cb.join(broadcast(cbOff), Seq("_bg_cb"))
          .select(col(coarse),
            (col("_bg_cboff") + coalesce(sum("_bg_c").over(wInB), lit(0L)))
              .as("_bg_coff"))
      }
    val bounds = df.agg(min(col(fine).cast(LongType)).as("_bg_lo"),
      max(col(fine).cast(LongType)).as("_bg_hi"))
    val withB = df.crossJoin(broadcast(bounds))
      .withColumn("_bg_b",
        ((col(fine).cast(LongType) - col("_bg_lo")) /
          ((col("_bg_hi") - col("_bg_lo")) / nb + lit(1L))).cast(LongType))
      .drop("_bg_lo", "_bg_hi")
    val partials = withB.groupBy(col(coarse), col("_bg_b"))
      .agg(count(lit(1)).as("_bg_c"))
    val wB = Window.partitionBy(coarse).orderBy("_bg_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketOff = partials.select(col(coarse), col("_bg_b"),
      coalesce(sum("_bg_c").over(wB), lit(0L)).as("_bg_boff"))
    // ties break the in-bucket order deterministic when `fine` can
    // repeat (e.g. a hash key) — same contract as withGlobalSeq
    val wFine = Window.partitionBy(col(coarse), col("_bg_b"))
      .orderBy(col(fine) +: ties.map(col): _*)
    // the two offset frames merge FIRST (offset-frame-sized join,
    // ≤ buckets+1 rows per coarse value — no hot key), so the single
    // corpus-sized join runs on (coarse, bucket): in the
    // dataScaleCoarse regime a join on `coarse` alone would
    // hash-partition the whole corpus onto the hottest coarse value
    // (t46's r = 0 holds one row per CLUSTER) — the exact
    // single-task funnel this function exists to avoid; (coarse,
    // bucket) is the same exchange the row_number window needs anyway
    val off = bucketOff.join(coarseOff, Seq(coarse))
    val offJ = if (dataScaleCoarse) off else broadcast(off)
    withB.join(offJ, Seq(coarse, "_bg_b"))
      .withColumn(seqCol,
        col("_bg_coff") + col("_bg_boff") +
          row_number().over(wFine).cast(LongType))
      .drop("_bg_b", "_bg_coff", "_bg_boff")
  }
}
