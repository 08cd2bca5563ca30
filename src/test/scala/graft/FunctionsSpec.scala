package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Fingerprint64
import graft.functions.VectorFunctions._

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Fingerprint64 matches reference FNV-1a values and is stable") {
    // independent FNV-1a implementation
    def fnv(s: String): Long = {
      var h = 0xcbf29ce484222325L
      s.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      h
    }
    val inputs = Seq("", "a", "hello world", "café ☕")
    val got = inputs.toDF("s")
      .select(Fingerprint64.fingerprint64($"s")).as[Long].collect()
    assert(got.toSeq == inputs.map(fnv))
  }

  test("Fingerprint64 is null-safe and seed-sensitive") {
    val df = Seq(Some("x"), None).toDF("s")
    val r = df.select(Fingerprint64.fingerprint64($"s")).collect().map(r => Option(r.get(0)))
    assert(r(1).isEmpty && r(0).nonEmpty)
    val a = Seq("x").toDF("s").select(Fingerprint64.fingerprint64($"s", 1L)).as[Long].head()
    val b = Seq("x").toDF("s").select(Fingerprint64.fingerprint64($"s", 2L)).as[Long].head()
    assert(a != b)
  }

  test("Fingerprint64 participates in whole-stage codegen over a real scan") {
    // a local relation constant-folds; use a parquet scan so the
    // projection actually runs through generated code
    val df = Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", Fingerprint64.fingerprint64($"text").as("fp"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` operator prefix marks whole-stage-codegen stages in
    // the simple plan string; the fingerprint projection must be
    // inside one (no CodegenFallback detour)
    assert(plan.contains("*(1) Project") && plan.contains("fingerprint64"), plan)
    // and the generated code agrees with the reference implementation
    def fnv(s: String): Long = {
      var h = 0xcbf29ce484222325L
      s.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      h
    }
    val (text, fp) = Tables.documents(spark, TestSpark.Sf)
      .select($"text", Fingerprint64.fingerprint64($"text"))
      .as[(String, Long)].head()
    assert(fp == fnv(text))
  }

  test("HeavyHitters sketch surfaces every true heavy hitter with bounded counters") {
    import graft.etl.TextNorm
    import graft.functions.HeavyHitters
    val tokens = Tables.documents(spark, TestSpark.Sf)
      .select(explode(split(TextNorm.normalizeText($"text"), " ")).as("token"))
      .filter(length($"token") > 0)

    val n = tokens.count()
    val capacity = 64
    // the frequency guarantee holds for the FULL summary; a top-k
    // slice can drop true hitters below overestimated counters
    val sketch = tokens.as[String]
      .select(new HeavyHitters(capacity, capacity).toColumn)
      .head()

    val exact = tokens.groupBy("token").count()
      .orderBy($"count".desc, $"token".asc)
      .as[(String, Long)].collect()

    // SpaceSaving guarantee: true frequency > n/capacity ⇒ in sketch
    val sketched = sketch.map(_._1).toSet
    exact.filter(_._2 > n / capacity).foreach { case (tok, c) =>
      assert(sketched.contains(tok), s"missing heavy hitter $tok ($c > ${n / capacity})")
    }
    // counts only overestimate
    val exactMap = exact.toMap
    sketch.foreach { case (tok, c) => assert(c >= exactMap.getOrElse(tok, 0L)) }
  }

  test("vector dot/norm/cosine are exact on known vectors") {
    val df = Seq((Seq(1.0, 2.0, 2.0), Seq(2.0, 0.0, 0.0))).toDF("a", "b")
    val Array(d, na, c) = df.select(
      dot($"a", $"b"), norm($"a"), cosine($"a", $"b")).as[(Double, Double, Double)].collect()
      .flatMap(t => Array(t._1, t._2, t._3))
    assert(d == 2.0 && na == 3.0 && math.abs(c - 2.0 / 6.0) < 1e-15)
  }

  test("int8 quantization: known codes, zero-vector safety, bounded round-trip error") {
    import graft.functions.QuantizeInt8.{absMax, quantizeInt8}
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Seq(-2.0f, 2.0f, 1.0f, -1.0f))).toDF("id", "v")
    val out = df.select($"id", absMax($"v").as("amax"), quantizeInt8($"v").as("q"))
      .orderBy("id").as[(Long, Double, Seq[Int])].collect().toSeq
    assert(out(0) == ((1L, 1.0, Seq(127, -63, 32, 0)))) // floor(-63.5+0.5) = -63
    assert(out(1) == ((2L, 0.0, Seq(0, 0, 0, 0))))
    assert(out(2) == ((3L, 2.0, Seq(-127, 127, 64, -63))))
    // round-trip: |x - q*amax/127| <= amax/254 (half a quantization step)
    val v = Seq(0.83f, -0.31f, 0.07f, 0.66f)
    val (amax, q) = Seq((0L, v)).toDF("id", "v")
      .select(absMax($"v"), quantizeInt8($"v")).as[(Double, Seq[Int])].head()
    v.zip(q).foreach { case (x, qi) =>
      assert(math.abs(x - qi * amax / 127.0) <= amax / 254.0 + 1e-9)
    }
  }

  test("int8 quantization runs inside whole-stage codegen over the embeddings scan") {
    val df = Tables.embeddings(spark, TestSpark.Sf)
      .select(graft.functions.QuantizeInt8.quantizeInt8(col("embedding")).as("q"))
    val plan = df.queryExecution.executedPlan.toString
    // codegen renders as "*(n)" operator prefixes in the plan string
    assert(plan.contains("*(1) Project"), plan.take(500))
    assert(df.count() == 500)
  }

  test("vec_abs_max / vec_quantize_int8 / dot_product_int are SQL-callable after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT vec_abs_max(array(3.0D, -4.0D)) AS m, vec_quantize_int8(array(3.0D, -4.0D)) AS q")
      .as[(Double, Seq[Int])].head()
    assert(r == ((4.0, Seq(95, -127)))) // floor(3*127/4+0.5)=floor(95.75)=95
    val d = spark.sql("SELECT dot_product_int(array(1, -2), array(3, 4)) AS d")
      .as[Long].head()
    assert(d == 1L * 3 - 2 * 4)
    // z-order interleave: a=0b11 -> even bits, b=0b01 -> odd bits
    val z = spark.sql("SELECT interleave_bits16(3L, 1L) AS z").as[Long].head()
    assert(z == 7L) // bits: a0->0, b0->1, a1->2 = 0b111
  }

  test("t07 redaction masks emails and digit runs on matching text (group-0 extract path)") {
    val docs = Seq(
      (1L, "contact Bob123@Mail.example or call 5551234 now"),
      (2L, "no pii here"),
      (3L, "codes 111 22 3333")).toDF("doc_id", "text")
    // same projection as t07Redact, driven by a literal frame so the
    // MATCHING path executes (the synthetic corpus has zero matches,
    // which let a group-index crash ship latent in round 2)
    import graft.text.TextFunctions.matchCount
    val out = docs.select(
        col("doc_id"),
        regexp_replace(
          regexp_replace(col("text"), "[A-Za-z0-9.]+@[A-Za-z0-9.]+", "<EMAIL>"),
          "[0-9]{3,}", "<NUM>").as("redacted"),
        matchCount(col("text"), "[A-Za-z0-9.]+@[A-Za-z0-9.]+").as("n_email"),
        matchCount(col("text"), "[0-9]{3,}").as("n_num"))
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    // n_num counts RAW-text digit runs, so the '123' inside the email
    // counts too (both engines agree — counts precede masking)
    assert(out == Seq(
      (1L, "contact <EMAIL> or call <NUM> now", 1L, 2L),
      (2L, "no pii here", 0L, 0L),
      (3L, "codes <NUM> 22 <NUM>", 0L, 2L)))
  }

  test("ExactPercentile matches Spark's buffering percentile on real data") {
    import graft.functions.ExactPercentile, ExactPercentile.Pct
    val li = Tables.lineitem(spark, TestSpark.Sf)
    val got = ExactPercentile.quantiles(li, Seq("l_returnflag"),
        col("l_extendedprice"), valPow = 2, outPow = 3,
        // p05 over cent data is NOT milli-exact (frac 0.05 × odd cent
        // diff → half-milli) — the require rejects it; p10 is exact
        Seq(Pct("p50", 50, 100), Pct("p90", 90, 100), Pct("p10", 10, 100)))
      .orderBy("l_returnflag")
      .as[(String, Long, Long, Long)].collect().toSeq
    val ref = li.groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)") * 1000, 0).cast("long").as("p50"),
        round(expr("percentile(l_extendedprice, 0.9)") * 1000, 0).cast("long").as("p90"),
        round(expr("percentile(l_extendedprice, 0.1)") * 1000, 0).cast("long").as("p10"))
      .orderBy("l_returnflag")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == ref)
  }

  test("ExactPercentile handles edge shapes: 1-row group, uniform values, exact-rank hit") {
    import graft.functions.ExactPercentile, ExactPercentile.Pct
    val df = Seq(
      ("a", 5.0),                              // single row: every quantile = 5
      ("b", 1.0), ("b", 1.0), ("b", 1.0),      // uniform
      ("c", 1.0), ("c", 2.0), ("c", 3.0)       // p50 lands exactly on 2
    ).toDF("g", "x")
    val got = ExactPercentile.quantiles(df, Seq("g"), col("x"), 0, 3,
        Seq(Pct("p50", 50, 100), Pct("p90", 90, 100)))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    // c's p90: h = 2*0.9 = 1.8 → 2 + 0.8*(3-2) = 2.8
    assert(got == Seq(("a", 5000L, 5000L), ("b", 1000L, 1000L), ("c", 2000L, 2800L)))
  }

  test("DotProductInt matches a local integer dot product and stays codegen'd") {
    import graft.functions.DotProductInt.dotInt
    val df = Seq((Seq(1, -2, 3), Seq(4, 5, -6)), (Seq(127, 127), Seq(127, 127)))
      .toDF("a", "b")
    val got = df.select(dotInt($"a", $"b")).as[Long].collect().toSeq
    assert(got == Seq(1L * 4 - 2 * 5 - 3 * 6, 2L * 127 * 127))
    // length mismatch fails loudly, not silently truncates
    assertThrows[Exception] {
      Seq((Seq(1, 2), Seq(1))).toDF("a", "b").select(dotInt($"a", $"b")).collect()
    }
  }

  test("q44 approximate percentiles land inside exact rank-error bands") {
    import graft.functions.ExactPercentile, ExactPercentile.Pct
    val sf = TestSpark.Sf
    val approx = AnalyticsQueries.q44ApproxPercentiles(TestSpark.spark, sf)
      .as[(String, Long, Long)].collect()
      .map { case (f, p50, p90) => f -> (p50, p90) }.toMap
    // exact bands at ±5 rank points, outPow=4 (p45/p55/p85/p95 are not
    // all milli-exact over cent data, but are at 10^4)
    val bands = ExactPercentile.quantiles(
        Tables.lineitem(TestSpark.spark, sf), Seq("l_returnflag"),
        col("l_extendedprice"), valPow = 2, outPow = 4,
        Seq(Pct("p45", 45, 100), Pct("p55", 55, 100),
            Pct("p85", 85, 100), Pct("p95", 95, 100)))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(bands.nonEmpty)
    for ((f, p45, p55, p85, p95) <- bands) {
      val (a50, a90) = approx(f)
      assert(a50 * 10 >= p45 && a50 * 10 <= p55, s"$f p50 $a50 outside [$p45, $p55]/10")
      assert(a90 * 10 >= p85 && a90 * 10 <= p95, s"$f p90 $a90 outside [$p85, $p95]/10")
    }
  }

  test("q46 approximate distinct counts land inside the ±3·rsd band of exact") {
    val sf = TestSpark.Sf
    val approx = AnalyticsQueries.q46ApproxDistinct(TestSpark.spark, sf)
      .as[(String, Long, Long)].collect()
      .map { case (t, nUsers, _) => t -> nUsers }.toMap
    val exact = AnalyticsQueries.q21DistinctCount(TestSpark.spark, sf)
      .as[(String, Long, Long)].collect()
      .map { case (t, nUsers, _) => t -> nUsers }.toMap
    assert(exact.nonEmpty && approx.keySet == exact.keySet)
    for ((t, n) <- exact) {
      val a = approx(t)
      val tol = math.max(1.0, 3 * 0.02 * n)
      assert(math.abs(a - n) <= tol, s"$t approx $a vs exact $n (tol $tol)")
    }
  }

  test("q48 funnel stages are strictly ordered and monotonically shrinking") {
    val rows = AnalyticsQueries.q48Funnel(TestSpark.spark, TestSpark.Sf)
      .select(col("user_id"), col("view_ts").cast("long"),
        col("click_ts").cast("long"), col("purchase_ts").cast("long"))
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (u, v, c, p) =>
      assert(v.nonEmpty, s"user $u row exists without a view stage")
      // a later stage implies the earlier one, in order (second
      // truncation can collapse ties, so >= not >)
      if (c.nonEmpty) assert(c.get >= v.get, s"user $u click before view")
      if (p.nonEmpty) assert(c.nonEmpty && p.get >= c.get, s"user $u purchase out of order")
    }
    val n = rows.length
    assert(rows.count(_._3.nonEmpty) <= n && rows.count(_._4.nonEmpty) <= rows.count(_._3.nonEmpty))
  }

  test("q49 cohort retention: offset 0 equals cohort size, later offsets never exceed it") {
    val rows = AnalyticsQueries.q49CohortRetention(TestSpark.spark, TestSpark.Sf)
      .as[(java.sql.Date, Long, Long)].collect()
      .groupBy(_._1.toString)
    assert(rows.nonEmpty)
    rows.foreach { case (cohort, rs) =>
      val byOffset = rs.map(r => r._2 -> r._3).toMap
      assert(byOffset.contains(0L), s"cohort $cohort missing offset 0")
      byOffset.foreach { case (off, nU) =>
        assert(nU <= byOffset(0L), s"cohort $cohort offset $off retention $nU exceeds cohort size")
      }
    }
  }

  test("ExactPercentile ignores nulls like percentile/quantile_cont") {
    import graft.functions.ExactPercentile, ExactPercentile.Pct
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
                 ("b", None)).toDF("g", "x")
    val got = ExactPercentile.quantiles(df, Seq("g"), col("x"), 0, 3,
        Seq(Pct("p50", 50, 100)))
      .orderBy("g").as[(String, Long)].collect().toSeq
    // a's nulls don't occupy ranks (median of {1,3} = 2); all-null b
    // vanishes — the same rows Spark's percentile-over-groupBy keeps
    assert(got == Seq(("a", 2000L)))
  }

  test("ExactPercentile rejects a (p, scale) pair whose fraction is not exact") {
    import graft.functions.ExactPercentile, ExactPercentile.Pct
    val df = Seq(("a", 1.0)).toDF("g", "x")
    // p = 1/3 at output scale 10^3: rem/den·mul is never integral
    assertThrows[IllegalArgumentException] {
      ExactPercentile.quantiles(df, Seq("g"), col("x"), 0, 3, Seq(Pct("p33", 1, 3)))
    }
  }

  test("HistogramRank reproduces ntile/percent_rank/cume_dist exactly (all group sizes)") {
    import graft.functions.HistogramRank
    import org.apache.spark.sql.expressions.Window
    // group sizes 1..13 with heavy value ties — covers n < k, n = 1,
    // remainder buckets, and the tie-break path
    val rows = for {
      g <- 1 to 13; i <- 1 to g
    } yield (s"g$g", (i % 4).toLong, i.toLong)
    val df = rows.toDF("g", "v", "id")
    val got = HistogramRank.withRank(df, Seq("g"), "v", Seq("id"))
      .select(col("g"), col("id"),
        expr(HistogramRank.ntileExpr(4)).as("q"),
        expr("CASE WHEN n = 1 THEN 0L ELSE " +
          HistogramRank.milliExpr("r - 1", "n - 1") + " END").as("pr"),
        expr(HistogramRank.milliExpr("r", "n")).as("cd"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val w = Window.partitionBy("g").orderBy("v", "id")
    val want = df.select(col("g"), col("id"),
        ntile(4).over(w).cast("long").as("q"),
        floor(percent_rank().over(w) * 1000 + lit(0.5)).cast("long").as("pr"),
        floor(cume_dist().over(w) * 1000 + lit(0.5)).cast("long").as("cd"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("q55 deciles are equal-population (±1), exhaustive, and value-monotone per flag") {
    val bins = AnalyticsQueries.q55QuantileBins(spark, TestSpark.Sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val rowsPerFlag = Tables.lineitem(spark, TestSpark.Sf)
      .groupBy("l_returnflag").count().as[(String, Long)].collect().toMap
    bins.foreach { case (flag, ds) =>
      assert(ds.map(_._2).toSeq == (1L to 10L), s"$flag deciles present")
      assert(ds.map(_._3).sum == rowsPerFlag(flag), s"$flag exhaustive")
      // equal population: first buckets at most one row larger (ntile semantics)
      assert(ds.map(_._3).max - ds.map(_._3).min <= 1, s"$flag balance")
      // decile d's max price never exceeds decile d+1's min price
      ds.sliding(2).foreach { case Array(a, b) =>
        assert(a._6 <= b._5, s"$flag monotone ${a._2}->${b._2}")
      }
    }
  }

  test("q56 gap-fill: dense first→last coverage per type, gaps bounded by their neighbors") {
    val byType = AnalyticsQueries.q56GapFill(spark, TestSpark.Sf)
      .as[(String, java.sql.Date, Long, Boolean)].collect()
      .groupBy(_._1).values
    assert(byType.nonEmpty)
    var sawGap = false
    byType.foreach { series =>
      val s = series.sortBy(_._2.getTime)
      // dense calendar: every consecutive output day is exactly 1 apart
      s.sliding(2).foreach { case Array(a, b) =>
        assert(b._2.toLocalDate == a._2.toLocalDate.plusDays(1),
          s"hole between ${a._2} and ${b._2}")
      }
      // first and last days of a series are always known, never invented
      assert(!s.head._4 && !s.last._4, "series must start and end on known days")
      val knownIdx = s.zipWithIndex.filter(!_._1._4).map(_._2)
      s.zipWithIndex.filter(_._1._4).foreach { case ((_, _, v, _), i) =>
        sawGap = true
        val p = knownIdx.filter(_ < i).max
        val n = knownIdx.filter(_ > i).min
        val (pv, nv) = (s(p)._3, s(n)._3)
        assert(v >= math.min(pv, nv) && v <= math.max(pv, nv),
          s"interpolated $v outside [$pv, $nv]")
      }
    }
    assert(sawGap, "the series must actually contain gaps at this SF")
  }

  test("q57 winsorization: clip counts and sums are exactly consistent with the bands") {
    val out = AnalyticsQueries.q57Winsorize(spark, TestSpark.Sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    val vals = Tables.lineitem(spark, TestSpark.Sf)
      .select(col("l_returnflag"),
        (round(col("l_extendedprice") * 100, 0).cast("long") * 100).as("v"))
      .as[(String, Long)].collect().groupBy(_._1)
    assert(out.nonEmpty)
    out.foreach { case (flag, n, nLo, nHi, sumRaw, sumWins, lo, hi) =>
      val vs = vals(flag).map(_._2)
      assert(lo < hi, s"$flag band degenerate")
      assert(n == vs.length && sumRaw == vs.sum, s"$flag raw side")
      assert(nLo == vs.count(_ < lo) && nHi == vs.count(_ > hi), s"$flag clip counts")
      assert(sumWins == vs.map(v => math.max(lo, math.min(hi, v))).sum, s"$flag clipped sum")
      // p05/p95 bands must actually clip roughly 5% each side (ties aside)
      assert(nLo > 0 && nHi > 0 && nLo <= n / 10 && nHi <= n / 10, s"$flag clip volume")
    }
  }

  test("q58 drift TV distance matches a local recomputation and is bounded by [0, 2000]") {
    val got = AnalyticsQueries.q58Drift(spark, TestSpark.Sf)
      .as[(String, Long, Long, Long)].collect()
    val ev = Tables.events(spark, TestSpark.Sf)
      .selectExpr("event_type",
        "datediff(cast(ts as date), date'2024-01-01') < 15 as is_ref",
        "least(9L, cast(round(value * 100, 0) as bigint) div 5000) as bucket")
      .as[(String, Boolean, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (et, nRef, nCur, tv) =>
      val rows = ev.filter(_._1 == et)
      val (ref, cur) = rows.partition(_._2)
      assert(nRef == ref.length && nCur == cur.length, s"$et window sizes")
      val expect = (0L to 9L).map { b =>
        math.abs(1000 * ref.count(_._3 == b) / math.max(1, nRef) -
          1000 * cur.count(_._3 == b) / math.max(1, nCur))
      }.sum
      assert(tv == expect, s"$et tv $tv != $expect")
      assert(tv >= 0 && tv <= 2000, s"$et tv out of range")
    }
  }

  test("q59 transition counts match a local sessionize-and-pair recomputation") {
    val got = AnalyticsQueries.q59Transitions(spark, TestSpark.Sf)
      .as[(String, String, Long)].collect().toSet
    val ev = Tables.events(spark, TestSpark.Sf)
      .select("user_id", "ts", "event_id", "event_type")
      .as[(Long, java.sql.Timestamp, Long, String)].collect()
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    ev.groupBy(_._1).values.foreach { rows =>
      val s = rows.sortBy(r => (r._2.getTime, r._3))
      s.sliding(2).foreach {
        case Array(a, b) if b._2.getTime - a._2.getTime <= 1800L * 1000 =>
          counts((a._4, b._4)) += 1
        case _ =>
      }
    }
    val expect = counts.collect { case ((x, y), n) if n >= 20 => (x, y, n) }.toSet
    assert(got == expect,
      s"extra=${got.diff(expect).take(3)} missing=${expect.diff(got).take(3)}")
  }

  test("q60 dq report carries all nine rules and matches direct recomputation") {
    val got = AnalyticsQueries.q60DqChecks(spark, TestSpark.Sf)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.size == 9)
    val o = Tables.orders(spark, TestSpark.Sf)
    val c = Tables.customer(spark, TestSpark.Sf)
    val nOrders = o.count()
    assert(got("orders.orderkey_unique") ==
      (nOrders, nOrders - o.select("o_orderkey").distinct().count()))
    assert(got("orders.custkey_not_null") ==
      (nOrders, o.filter(col("o_custkey").isNull).count()))
    val fkViol = o.join(c, o("o_custkey") === c("c_custkey"), "left_anti").count()
    assert(got("orders.fk_customer") == (nOrders, fkViol))
    // every rule row checks at least one row and violations never exceed it
    got.values.foreach { case (n, v) => assert(n > 0 && v >= 0 && v <= n) }
  }

  test("q61 OLS slope/intercept match an exact BigInt recomputation per segment") {
    val got = AnalyticsQueries.q61TrendSlope(spark, TestSpark.Sf)
      .as[(String, Long, Long, Long)].collect()
    val monthly = Tables.orders(spark, TestSpark.Sf)
      .join(Tables.customer(spark, TestSpark.Sf), col("o_custkey") === col("c_custkey"))
      .selectExpr("c_mktsegment",
        "cast((year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 as bigint) as x",
        "cast(floor(o_totalprice * 100 + 0.5) as bigint) as cents")
      .groupBy("c_mktsegment", "x").agg(sum("cents").as("y"))
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (seg, nM, slope, icept) =>
      val rows = monthly.filter(_._1 == seg).map(r => (BigInt(r._2), BigInt(r._3)))
      assert(nM == rows.length)
      val n = BigInt(rows.length)
      val sx = rows.map(_._1).sum; val sy = rows.map(_._2).sum
      val sxy = rows.map(r => r._1 * r._2).sum
      val sxx = rows.map(r => r._1 * r._1).sum
      val den = n * sxx - sx * sx
      def halfAway(num: BigInt): BigInt =
        if (num >= 0) (2000 * num + den) / (2 * den)
        else -((2000 * -num + den) / (2 * den))
      assert(BigInt(slope) == halfAway(n * sxy - sx * sy), seg)
      assert(BigInt(icept) == halfAway(sy * sxx - sx * sxy), seg)
    }
  }

  test("q62 skew audit agrees with per-key count recomputation") {
    val got = AnalyticsQueries.q62SkewAudit(spark, TestSpark.Sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set(
      "orders.o_custkey", "lineitem.l_partkey", "lineitem.l_suppkey"))
    val counts = Tables.orders(spark, TestSpark.Sf)
      .groupBy("o_custkey").count().as[(Long, Long)].collect().map(_._2)
    val (_, nRows, nKeys, maxCnt, top1, hotKeys, hotRows) = got("orders.o_custkey")
    assert(nRows == counts.sum && nKeys == counts.length && maxCnt == counts.max)
    assert(top1 == 1000000L * counts.max / counts.sum)
    val hot = counts.filter(c => BigInt(c) * counts.length > BigInt(10) * counts.sum)
    assert(hotKeys == hot.length && hotRows == hot.sum)
  }

  test("q71 HLL cube: union of persisted daily sketches == full rescan, inside the error band") {
    val ev = Tables.events(spark, TestSpark.Sf)
      .select(to_date(col("ts")).as("day"), col("event_type"), col("user_id"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    val cube = AnalyticsQueries.q71HllCube(spark, TestSpark.Sf)
      .select("event_type", "approx_users").as[(String, Long)].collect().toMap
    assert(cube.keySet == exact.keySet)
    // THE cube identity: unioning per-day sketches is LOSSLESS at equal
    // lgK — the estimate equals the single-shot sketch over all history
    val oneShot = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("e"))
      .as[(String, Long)].collect().toMap
    assert(cube == oneShot, s"union-of-daily != full rescan: $cube vs $oneShot")
    // error band: default lgConfigK=12 → rsd ≈ 1.6%; pin 5% (+3 abs floor)
    cube.foreach { case (t, est) =>
      val err = math.abs(est - exact(t))
      assert(err <= math.max(3L, exact(t) * 5 / 100),
        s"$t: estimate $est vs exact ${exact(t)}")
    }
    info(s"q71 estimates vs exact: ${exact.keys.toSeq.sorted.map(t => s"$t ${cube(t)}/${exact(t)}").mkString(", ")}")
    // the persistence claim: daily sketches survive a parquet
    // round-trip (binary column) and union to the same estimates
    val dir = java.nio.file.Files.createTempDirectory("hll_cube").toString
    ev.groupBy("day", "event_type")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .as[(String, Long)].collect().toMap
    assert(reloaded == cube, s"parquet round-trip changed estimates: $reloaded")
  }

  test("q73 HLL overlap matrix lands inside the error band of the exact q72 matrix") {
    val exact = AnalyticsQueries.q72AudienceOverlap(spark, TestSpark.Sf)
      .select("type_a", "type_b", "n_inter", "n_union")
      .as[(String, String, Long, Long)].collect()
      .map { case (a, b, i, u) => (a, b) -> (i, u) }.toMap
    val est = AnalyticsQueries.q73OverlapHll(spark, TestSpark.Sf)
      .select("type_a", "type_b", "n_inter_est", "n_union_est")
      .as[(String, String, Long, Long)].collect()
      .map { case (a, b, i, u) => (a, b) -> (i, u) }.toMap
    // every exact co-observed pair must appear (the estimate side is a
    // full T² matrix; the exact side drops zero-intersection pairs)
    assert(exact.keySet.subsetOf(est.keySet),
      s"missing pairs: ${exact.keySet diff est.keySet}")
    // inclusion–exclusion compounds three sketch errors (each rsd ≈
    // 1.6% at the default lgK=12); pin the intersection within 5% of
    // the exact UNION (the scale all three estimates share), +3 floor
    exact.foreach { case (pair, (i, u)) =>
      val (ie, _) = est(pair)
      assert(math.abs(ie - i) <= math.max(3L, u * 5 / 100),
        s"$pair: est intersection $ie vs exact $i (union $u)")
    }
    info(s"q73 intersections vs exact: ${exact.keys.toSeq.sorted.take(4)
      .map(p => s"$p ${est(p)._1}/${exact(p)._1}").mkString(", ")}")
  }

  test("q115 exact W1 statistic matches the definitional transport integral") {
    // the definitional cross-check the q111/q113 convention demands:
    // W1 = ∫|F_ref − F_cur| dv computed locally with BigInt rationals
    // over the ordered union domain — an algebra error mirrored into
    // both engines' SQL would pass the oracle but not this
    val got = AnalyticsQueries.q115W1Drift(spark, TestSpark.Sf)
      .as[(String, Long, Long, Long)].collect()
    val ev = Tables.events(spark, TestSpark.Sf)
      .selectExpr("event_type",
        "datediff(cast(ts as date), date'2024-01-01') < 15 as is_ref",
        "cast(round(value * 100, 0) as bigint) as cents")
      .as[(String, Boolean, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (et, nRef, nCur, w1Centi) =>
      val rows = ev.filter(_._1 == et)
      val (ref, cur) = rows.partition(_._2)
      assert(nRef == ref.length && nCur == cur.length, s"$et window sizes")
      val domain = rows.map(_._3).distinct.sorted
      var cr = 0L; var cc = 0L; var num = BigInt(0)
      domain.zipWithIndex.foreach { case (v, i) =>
        cr += ref.count(_._3 == v); cc += cur.count(_._3 == v)
        if (i + 1 < domain.length)
          num += BigInt((cr * nCur - cc * nRef).abs) * (domain(i + 1) - v)
      }
      assert(w1Centi == num * 100 / (BigInt(nRef) * nCur),
        s"$et w1_centi_cents $w1Centi != ${num * 100 / (BigInt(nRef) * nCur)}")
    }
    // a window compared against itself transports nothing
    val self = AnalyticsQueries.w1FromCounts(
      Tables.events(spark, TestSpark.Sf)
        .selectExpr("event_type", "cast(round(value * 100, 0) as bigint) as cents")
        .where("value is not null")
        .groupBy("event_type", "cents")
        .agg(count(lit(1)).as("o_ref"), count(lit(1)).as("o_cur")))
      .select("w1_centi_cents").as[Long].collect()
    assert(self.nonEmpty && self.forall(_ == 0L), "self-W1 must be 0")
    // and a single-value window still reports its row (gap-0 rule)
    val single = AnalyticsQueries.w1FromCounts(
      Seq(("x", 100L, 3L, 4L)).toDF("event_type", "cents", "o_ref", "o_cur"))
      .as[(String, Long, Long, Long)].collect()
    assert(single.toSeq == Seq(("x", 3L, 4L, 0L)),
      s"single-value window must report a 0 row, got ${single.toSeq}")
  }

  test("q111 exact KS statistic matches a local cross-multiplied CDF recomputation") {
    val got = AnalyticsQueries.q111KsDrift(spark, TestSpark.Sf)
      .as[(String, Long, Long, Long, Long)].collect()
    val ev = Tables.events(spark, TestSpark.Sf)
      .selectExpr("event_type",
        "datediff(cast(ts as date), date'2024-01-01') < 15 as is_ref",
        "cast(round(value * 100, 0) as bigint) as cents")
      .as[(String, Boolean, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (et, nRef, nCur, dNum, ksPpm) =>
      val rows = ev.filter(_._1 == et)
      val (ref, cur) = rows.partition(_._2)
      assert(nRef == ref.length && nCur == cur.length, s"$et window sizes")
      // exact D as the integer rational d / (n_ref * n_cur): walk the
      // ordered value domain with cross-multiplied cumulative counts
      var cr = 0L; var cc = 0L; var best = 0L
      rows.map(_._3).distinct.sorted.foreach { v =>
        cr += ref.count(_._3 == v); cc += cur.count(_._3 == v)
        best = math.max(best, math.abs(cr * nCur - cc * nRef))
      }
      assert(dNum == best, s"$et d_num $dNum != $best")
      assert(ksPpm == best * 1000000L / (nRef * nCur), s"$et ks_ppm")
      assert(ksPpm >= 0 && ksPpm <= 1000000L, s"$et ks_ppm out of [0, 1e6]")
    }
    // two-sided sanity: a window compared against itself must read 0
    val same = Tables.events(spark, TestSpark.Sf)
      .selectExpr("event_type", "cast(round(value * 100, 0) as bigint) as cents")
      .as[(String, Long)].collect()
    same.groupBy(_._1).foreach { case (_, rows) =>
      var c1 = 0L; var c2 = 0L; var b = 0L
      val n = rows.length.toLong
      rows.map(_._2).distinct.sorted.foreach { v =>
        val k = rows.count(_._2 == v); c1 += k; c2 += k
        b = math.max(b, math.abs(c1 * n - c2 * n))
      }
      assert(b == 0L)
    }
  }

  test("q112 KS-from-artifacts is bit-identical to the raw-scan q111") {
    // the artifact stores the UNBUCKETED cents histogram, which is
    // lossless for a CDF statistic — the whole claim of the no-rescan
    // drift panel
    val a = AnalyticsQueries.q112KsFromArtifacts(spark, TestSpark.Sf)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val b = AnalyticsQueries.q111KsDrift(spark, TestSpark.Sf)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(a.nonEmpty && a == b, s"artifact path diverged: $a vs $b")
  }

  test("q113 AUC drift equals the pairwise Mann-Whitney definition") {
    val got = AnalyticsQueries.q113AucDrift(spark, TestSpark.Sf)
      .as[(String, Long, Long, Long, Long)].collect()
    val ev = Tables.events(spark, TestSpark.Sf)
      .selectExpr("event_type",
        "datediff(cast(ts as date), date'2024-01-01') < 15 as is_ref",
        "cast(round(value * 100, 0) as bigint) as cents")
      .as[(String, Boolean, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (et, nRef, nCur, u2, aucPpm) =>
      val rows = ev.filter(_._1 == et)
      val (ref, cur) = rows.partition(_._2)
      assert(nRef == ref.length && nCur == cur.length, s"$et window sizes")
      // the definition, literally: every (ref, cur) pair scores 2 if
      // cur is above, 1 on a tie, 0 below — u2 is the total
      var want = 0L
      // histogram the pairwise count (literal double loop would be
      // 600M pairs at sf0.01 — same answer from value counts)
      val rh = ref.groupBy(_._3).view.mapValues(_.size.toLong)
      val ch = cur.groupBy(_._3).view.mapValues(_.size.toLong)
      rh.foreach { case (rv, rn) =>
        ch.foreach { case (cv, cn) =>
          if (cv > rv) want += 2L * rn * cn
          else if (cv == rv) want += rn * cn
        }
      }
      assert(u2 == want, s"$et u2 $u2 != $want")
      assert(aucPpm == want * 1000000L / (2L * nRef * nCur), s"$et auc_ppm")
      assert(aucPpm >= 0 && aucPpm <= 1000000L, s"$et auc_ppm range")
    }
    // identity sanity: a window against ITSELF reads exactly 500000
    // ppm when 2*n*n divides u2 evenly — check the exact rational
    // instead: u2(X, X) == n*n (2*above + ties is symmetric)
    val same = ev.filter(_._1 == got.head._1).map(_._3)
    val h = same.groupBy(identity).view.mapValues(_.size.toLong)
    var u2self = 0L
    h.foreach { case (a, an) => h.foreach { case (b, bn) =>
      if (b > a) u2self += 2L * an * bn else if (b == a) u2self += an * bn } }
    assert(u2self == same.length.toLong * same.length,
      "self-window u2 must equal n^2 (AUC exactly 1/2)")
  }

  test("q117 Spearman matches a local average-rank Pearson recomputation") {
    // the definitional cross-check: average ranks + Pearson computed
    // locally — a rank-algebra error mirrored into both engines' SQL
    // would pass the oracle but not this
    val got = AnalyticsQueries.q117Spearman(spark, TestSpark.Sf)
      .as[(String, Long, Long)].collect()
    val rows = Tables.lineitem(spark, TestSpark.Sf)
      .selectExpr("l_returnflag",
        "cast(floor(l_quantity * 100.0 + 0.5) as bigint)",
        "cast(floor(l_extendedprice * 100.0 + 0.5) as bigint)")
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty && got.length == rows.map(_._1).distinct.length)
    def r2s(vs: Seq[Long]): Map[Long, Long] = {
      val hist = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sorted = hist.keys.toSeq.sorted
      var cum = 0L
      sorted.map { v =>
        val r = (v, 2 * cum + hist(v) + 1); cum += hist(v); r }.toMap
    }
    got.foreach { case (flag, nRows, rhoE6) =>
      val g = rows.filter(_._1 == flag)
      assert(nRows == g.length, s"$flag group size")
      val n = g.length.toLong
      val (rx, ry) = (r2s(g.map(_._2)), r2s(g.map(_._3)))
      var sxy = BigInt(0); var sxx = BigInt(0); var syy = BigInt(0)
      g.foreach { case (_, x, y) =>
        val cx = BigInt(rx(x) - (n + 1)); val cy = BigInt(ry(y) - (n + 1))
        sxy += cx * cy; sxx += cx * cx; syy += cy * cy }
      val want = math.floor(sxy.toDouble /
        (math.sqrt(sxx.toDouble) * math.sqrt(syy.toDouble)) * 1e6 + 0.5).toLong
      assert(rhoE6 == want, s"$flag rho_e6 $rhoE6 != $want")
      assert(math.abs(rhoE6) <= 1000000L, s"$flag |rho| > 1")
    }
    // planted perfect monotone association through the SAME banded
    // prefix-sum kernel shape: ranks of y = 3x+7 equal ranks of x
    val mono = (1L to 500L).map(i => (i % 7, i, 3 * i + 7))
    val (mrx, mry) = (r2s(mono.map(_._2)), r2s(mono.map(_._3)))
    assert(mono.forall { case (_, x, y) => mrx(x) == mry(y) },
      "monotone map must preserve average ranks")
  }

  test("q118 Kendall matches a local pairwise concordance recomputation") {
    val got = AnalyticsQueries.q118Kendall(spark, TestSpark.Sf)
      .as[(String, Long, Long, Long, Long)].collect()
    val nat = Tables.nation(spark, TestSpark.Sf)
      .selectExpr("n_nationkey", "n_name").as[(Long, String)].collect().toMap
    val cust = Tables.customer(spark, TestSpark.Sf)
      .selectExpr("c_custkey", "c_nationkey").as[(Long, Long)].collect().toMap
    val ord = Tables.orders(spark, TestSpark.Sf)
      .selectExpr("o_custkey", "cast(date_trunc('month', o_orderdate) as date)",
        "cast(floor(o_totalprice * 100.0 + 0.5) as bigint)")
      .as[(Long, java.sql.Date, Long)].collect()
    val series = ord.groupBy(r => (nat(cust(r._1)), r._2.toString))
      .map { case ((nm, mon), rs) =>
        (nm, mon, rs.map(_._3).sum, rs.length.toLong) }.toSeq
    assert(got.nonEmpty && got.length == series.map(_._1).distinct.length)
    got.foreach { case (nm, nMonths, nPairs, s, tauE4) =>
      val g = series.filter(_._1 == nm).sortBy(_._2)
      assert(nMonths == g.length, s"$nm month count")
      var nc = 0L; var nd = 0L; var tx = 0L; var ty = 0L; var np = 0L
      for (i <- g.indices; j <- (i + 1) until g.length) {
        val (_, _, r1, c1) = g(i); val (_, _, r2, c2) = g(j)
        np += 1
        if ((r2 > r1 && c2 > c1) || (r2 < r1 && c2 < c1)) nc += 1
        else if ((r2 > r1 && c2 < c1) || (r2 < r1 && c2 > c1)) nd += 1
        if (r1 == r2) tx += 1
        if (c1 == c2) ty += 1
      }
      assert(nPairs == np && s == nc - nd, s"$nm pair counts")
      val want = if (np == tx || np == ty) 0L
        else math.floor((nc - nd).toDouble /
          (math.sqrt((np - tx).toDouble) * math.sqrt((np - ty).toDouble))
          * 1e4 + 0.5).toLong
      assert(tauE4 == want, s"$nm tau_b_e4 $tauE4 != $want")
      assert(math.abs(tauE4) <= 10000L, s"$nm |tau| > 1")
    }
  }

  test("q120 autocorrelation matches a local BigInt recomputation; planted periodicities exact") {
    val got = AnalyticsQueries.q120Autocorr(spark, TestSpark.Sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // local recompute: zero-filled spine, X_t = n·x_t − S, exact rational
    val ev = Tables.events(spark, TestSpark.Sf)
      .where("ts is not null")
      .selectExpr("event_type", "cast(ts as date) as day",
        "cast(floor(value * 100.0 + 0.5) as bigint) as cents")
      .as[(String, java.sql.Date, Long)].collect()
    def halfAway(num: BigInt, den: BigInt): Long = {
      val q = (2 * num.abs * 1000000 + den) / (2 * den)
      (if (num < 0) -q else q).toLong
    }
    got.groupBy(_._1).foreach { case (et, rows) =>
      val byDay = ev.filter(_._1 == et)
        .groupBy(_._2.toLocalDate).view.mapValues(_.map(_._3).sum).toMap
      val (d0, d1) = (byDay.keys.min, byDay.keys.max)
      val days = Iterator.iterate(d0)(_.plusDays(1))
        .takeWhile(!_.isAfter(d1)).toVector
      val xs = days.map(d => byDay.getOrElse(d, 0L))
      val n = xs.length.toLong
      val s = xs.sum
      val cx = xs.map(x => BigInt(x) * n - s)
      val den = cx.map(c => c * c).sum
      rows.foreach { case (_, lag, nDays, nPairs, acfE6) =>
        assert(nDays == n, s"$et spine length")
        val k = lag.toInt
        assert(nPairs == math.max(0, n - k), s"$et lag-$k pair count")
        val num = (0 until (n - k).toInt).map(t => cx(t) * cx(t + k)).sum
        val want = if (den == 0) 0L else halfAway(num, den)
        assert(acfE6 == want, s"$et lag $k: $acfE6 != $want")
        assert(math.abs(acfE6) <= 1000000L, s"$et |acf| > 1")
      }
    }
    // planted exact periodicities THROUGH the same kernel:
    // 28-day ±c alternation ⇒ acf(1) = −27/28, acf(7) = −21/28 = −0.75;
    // period-7 ±c square wave (28 days) ⇒ acf(7) = 21/28 = 0.75
    val base = java.sql.Date.valueOf("2024-01-01")
    def d(i: Int) = new java.sql.Date(base.getTime + i * 86400000L)
    val alt = (0 until 28).map(i =>
      ("alt", d(i), if (i % 2 == 0) 300L else 100L))
    val wave = (0 until 28).map(i =>
      ("wave", d(i), if (i % 7 < 3) 300L else 100L))
    val planted = AnalyticsQueries.acfOverDaily(
      (alt ++ wave).toDF("event_type", "day", "cents"), Seq(1, 7))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    assert(planted(("alt", 1L)) == halfAway(BigInt(-27), BigInt(28)),
      s"alternating lag-1: ${planted(("alt", 1L))}")
    assert(planted(("alt", 7L)) == -750000L,
      s"alternating lag-7: ${planted(("alt", 7L))}")
    // exact 7-periodicity: pairs at lag 7 are identical ⇒ acf(7) =
    // Σ_{t≤21} X_t² / Σ_{t≤28} X_t² = 21/28 exactly (X repeats weekly)
    assert(planted(("wave", 7L)) == 750000L,
      s"weekly wave lag-7: ${planted(("wave", 7L))}")
  }

  test("q123 forecast backtest matches a local recomputation; weekly fixture exact") {
    val got = AnalyticsQueries.q123ForecastBaseline(spark, TestSpark.Sf)
      .as[(String, String, Long, Long, Long)].collect()
    assert(got.nonEmpty && got.length % 2 == 0)
    // local recompute over the zero-filled spine
    val ev = Tables.events(spark, TestSpark.Sf)
      .where("ts is not null")
      .selectExpr("event_type", "cast(ts as date) as day",
        "cast(floor(value * 100.0 + 0.5) as bigint) as cents")
      .as[(String, java.sql.Date, Long)].collect()
    got.groupBy(_._1).foreach { case (et, rows) =>
      val byDay = ev.filter(_._1 == et)
        .groupBy(_._2.toLocalDate).view.mapValues(_.map(_._3).sum).toMap
      val (d0, d1) = (byDay.keys.min, byDay.keys.max)
      val xs = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
        .map(d => byDay.getOrElse(d, 0L)).toVector
      rows.foreach { case (_, method, nEvals, tae, mae) =>
        val k = if (method == "naive") 1 else 7
        val errs = (k until xs.length).map(t => math.abs(xs(t) - xs(t - k)))
        assert(nEvals == errs.length, s"$et/$method evals")
        assert(tae == errs.sum, s"$et/$method total error")
        assert(mae == (2 * errs.sum * 1000 + nEvals) / (2 * nEvals),
          s"$et/$method mae")
      }
    }
    // planted exactly-weekly series through the SAME kernel:
    // seasonal-naive error must be exactly 0 while naive pays the
    // within-week swings — the backtest's reason to exist
    val base = java.sql.Date.valueOf("2024-01-01")
    def d(i: Int) = new java.sql.Date(base.getTime + i * 86400000L)
    val weekly = (0 until 28).map(i => ("w", d(i), 100L + 50L * (i % 7)))
    val planted = AnalyticsQueries.forecastBacktest(
        weekly.toDF("event_type", "day", "cents"))
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._4, r._5))).toMap
    assert(planted("seasonal_naive") == ((0L, 0L)),
      s"weekly series must be exactly seasonal-naive-predictable")
    assert(planted("naive")._1 > 0L, "naive must pay the within-week swings")
  }

  test("q122 control chart matches a local frozen-limits recomputation") {
    val got = AnalyticsQueries.q122ControlChart(spark, TestSpark.Sf)
      .as[(String, java.sql.Date, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val daily = Tables.events(spark, TestSpark.Sf)
      .selectExpr("event_type", "cast(ts as date) as day",
        "cast(round(value * 100, 0) as bigint) as cents")
      .as[(String, java.sql.Date, Long)].collect()
      .groupBy(r => (r._1, r._2.toLocalDate)).view
      .mapValues(_.map(_._3).sum).toMap
    val refEnd = java.time.LocalDate.parse("2024-01-15")
    got.groupBy(_._1).foreach { case (et, rows) =>
      val series = daily.collect { case ((t, d), c) if t == et => (d, c) }
      val ref = series.filter(!_._1.isAfter(refEnd)).map(_._2).toSeq
      val (n, s) = (ref.length.toLong, ref.sum)
      val ss = ref.map(c => BigInt(c) * c).sum
      assert(rows.length == series.size, s"$et observed-day coverage")
      rows.foreach { case (_, day, cents, nRef, centerMilli, alarm) =>
        assert(nRef == n, s"$et reference size")
        assert(centerMilli == ((2 * s * 1000 + n) / (2 * n)),
          s"$et center")
        val dev = BigInt(cents) * n - s
        val want = if (dev * dev > 9 * (n * ss - BigInt(s) * s)) 1L else 0L
        assert(alarm == want, s"$et $day alarm $alarm != $want")
      }
    }
    // planted wild day THROUGH the same kernel: 15 quiet reference
    // days around 100 cents, then one 10× day — it must alarm, the
    // quiet days must not, and the frozen limits ignore the wild day
    // (it sits after refEnd so the reference stats cannot absorb it)
    val base = java.sql.Date.valueOf("2024-01-01")
    def d(i: Int) = new java.sql.Date(base.getTime + i * 86400000L)
    val planted = (0 until 15).map(i =>
      ("t", d(i), 100L + (i % 2))) :+ (("t", d(20), 1000L))
    val out = AnalyticsQueries.controlChart(
        planted.toDF("event_type", "day", "cents"), "2024-01-15")
      .as[(String, java.sql.Date, Long, Long, Long, Long)].collect()
      .map(r => r._2.toLocalDate.getDayOfMonth -> r._6).toMap
    assert(out(21) == 1L, "the 10x day must trip the 3-sigma rule")
    assert((1 to 15).forall(i => out(i) == 0L), "quiet days must not alarm")
  }

  test("q121 Cramér's V agrees with q104's chi-square and the perfect-association identity") {
    val got = AnalyticsQueries.q121CramersV(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (n, rDims, cDims, chi2E6, dof, vE4) = got.head
    // consistency with the audited q104 frame: same N/dims/chi2
    val cells = AnalyticsQueries.q104ChiSquare(spark, TestSpark.Sf)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    assert(n == cells.map(_._3).sum, "N must be the cell-count total")
    assert(rDims == cells.map(_._1).distinct.length &&
           cDims == cells.map(_._2).distinct.length, "dims")
    assert(chi2E6 == cells.head._6 && dof == cells.head._7,
      "chi2/dof must ride q104's audited values")
    // V recomputed locally with the same IEEE expression
    val m = math.min(rDims, cDims) - 1
    val want = math.floor(math.sqrt((chi2E6.toDouble / 1000000.0) /
      (n.toDouble * m.toDouble)) * 10000.0 + 0.5).toLong
    assert(vE4 == want && vE4 >= 0L && vE4 <= 10000L, s"v_e4 $vE4 != $want")
    // perfect association pins the normalization: chi2 = N·min(r−1,c−1)
    // ⇒ V = 1 exactly (the bound the min-dims denominator exists for)
    assert(math.floor(math.sqrt(((1000000.0 * 7 * 3) / 1000000.0) /
      (7.0 * 3.0)) * 10000.0 + 0.5).toLong == 10000L)
  }

  test("q119 HHI matches a local BigInt recomputation; uniform fixture is exact") {
    val got = AnalyticsQueries.q119Hhi(spark, TestSpark.Sf)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    def hhiOf(ms: Seq[Long]): (Long, Long, Long, Long) = {
      val mass = ms.sum
      val s2 = ms.map(m => BigInt(m) * m).sum
      (ms.length.toLong, mass,
        ((s2 * 1000000) / (BigInt(mass) * mass)).toLong,
        ((BigInt(mass) * mass * 100) / s2).toLong)
    }
    val cu = Tables.orders(spark, TestSpark.Sf)
      .selectExpr("o_custkey", "cast(floor(o_totalprice * 100.0 + 0.5) as bigint)")
      .as[(Long, Long)].collect()
      .groupBy(_._1).map(_._2.map(_._2).sum).toSeq
    val so = Tables.documents(spark, TestSpark.Sf)
      .selectExpr("source", "n_chars").as[(String, Long)].collect()
      .groupBy(_._1).map(_._2.map(_._2).sum).toSeq
    val want = Seq(
      ("customer_revenue", hhiOf(cu)), ("source_chars", hhiOf(so)))
      .map { case (d, (n, m, h, e)) => (d, n, m, h, e) }
    assert(got == want, s"got $got\nwant $want")
    // k equal units: hhi = 10^6/k, eff_n = k exactly
    val (_, _, hu, eu) = hhiOf(Seq.fill(8)(12345L))
    assert(hu == 125000L && eu == 800L, s"uniform fixture ($hu, $eu)")
  }

  test("prefix_dots checkpoints one accumulation; last element is bit-identical to dot_product") {
    import graft.functions.PrefixDots.prefixDots
    val df = Seq((Seq(1.0, 2.0, 3.0, 4.0), Seq(10.0, 20.0, 30.0, 40.0)))
      .toDF("a", "b")
    val got = df.select(prefixDots(col("a"), col("b"), Seq(1, 2, 4)).as("pd"),
        dot(col("a"), col("b")).as("d"))
      .as[(Seq[Double], Double)].head()
    assert(got._1 == Seq(10.0, 50.0, 300.0), got.toString)
    assert(got._1.last == got._2, "full-width checkpoint must equal dot_product")
    // strict-order float accumulation parity on a non-associative case
    val tricky = Seq((Seq(1e16, 1.0, -1e16, 2.0), Seq(1.0, 1.0, 1.0, 1.0)))
      .toDF("a", "b")
    val t = tricky.select(prefixDots(col("a"), col("b"), Seq(4)).as("pd"),
        dot(col("a"), col("b")).as("d"))
      .as[(Seq[Double], Double)].head()
    assert(t._1.head == t._2, s"accumulation order diverged: $t")
    // loud failures: mismatched lengths and widths past the vector end
    val bad = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
    val e1 = intercept[Exception](
      bad.select(prefixDots(col("a"), col("b"), Seq(1))).collect())
    assert(e1.getMessage != null)
    val e2 = intercept[Exception](
      df.select(prefixDots(col("a"), col("b"), Seq(2, 9))).collect())
    assert(e2.getMessage != null)
  }

  test("sign_pack words and packed hamming match a local bit recomputation") {
    import graft.functions.QuantizeInt8.{hammingPacked, signPack}
    // MSB-first within each 32-bit word; strict > 0 (zeros and -0.0
    // pack as 0); a 33-dim vector spills into a 2-word array
    val v33 = (Seq(1.0, -1.0, 0.0, -0.0) ++ Seq.fill(28)(2.0)) :+ 5.0
    val df = Seq((1L, v33)).toDF("id", "vec")
    val words = df.select(signPack(col("vec"))).as[Seq[Long]].head()
    def pack(bits: Seq[Boolean]): Long = bits.foldLeft(0L)((a, b) => a * 2 + (if (b) 1L else 0L))
    val expect = Seq(pack(v33.take(32).map(_ > 0)), pack(v33.drop(32).map(_ > 0)))
    assert(words == expect, s"$words vs $expect")
    // hamming = popcount of the XOR, summed across words
    val pair = Seq((v33, v33.updated(0, -9.0).updated(32, -9.0)))
      .toDF("a", "b")
    val h = pair.select(
      hammingPacked(signPack(col("a")), signPack(col("b")))).as[Long].head()
    assert(h == 2L, s"hamming $h")
    // identical vectors are at distance 0
    val h0 = pair.select(
      hammingPacked(signPack(col("a")), signPack(col("a")))).as[Long].head()
    assert(h0 == 0L)
  }

  test("URL canonicalization collapses case/www/ports/slashes/trackers/param-order; domain extraction honors two-part suffixes") {
    import graft.text.Url._
    val urls = Seq(
      "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
      "http://example.com/a/b?a=1&b=2",
      "https://Sub.Example.co.uk:443/x//",
      "https://example.io",
      "https://example.io/?fbclid=abc",
      "not a url").toDF("u")
    val got = urls.select(canonicalizeUrl(col("u")).as("c"),
        urlHost(col("u")).as("h"),
        registrableDomain(urlHost(col("u"))).as("d"))
      .as[(String, String, String)].collect().toSeq
    assert(got(0)._1 == "http://example.com/a/b?a=1&b=2", got(0).toString)
    // two spellings of the same page share one canonical key
    assert(got(0)._1 == got(1)._1)
    assert(got(2) == ("https://sub.example.co.uk/x", "sub.example.co.uk",
      "example.co.uk"), got(2).toString)
    assert(got(3)._1 == "https://example.io" && got(3)._3 == "example.io")
    // tracker-only query collapses to the bare root
    assert(got(4)._1 == "https://example.io")
    // non-URL input degrades to emptiness, never throws
    assert(got(5) == ("://", "", ""), got(5).toString)
  }
}
