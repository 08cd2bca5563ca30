package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TextNorm
import graft.functions.{Fingerprint64, ShingleFingerprints}

/** Property-based invariants for the text/hash primitives (raw
  * scalacheck generators, sampled; scalatestplus bridge not in the
  * offline cache). */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 3 -> Gen.const(' '),
      1 -> Gen.oneOf('&', '.', ','))).map(_.mkString)

  private def samples(g: Gen[String], n: Int): Seq[String] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("normalizeText is idempotent") {
    val texts = samples(asciiText, 300)
    val df = texts.toDF("s")
    val once = df.select(TextNorm.normalizeText($"s").as("n"))
    val twice = once.select(TextNorm.normalizeText($"n"))
    assert(once.as[String].collect().toSeq == twice.as[String].collect().toSeq)
  }

  test("normalizeText output has no double spaces, no edge spaces, no uppercase") {
    val out = samples(asciiText, 300).toDF("s")
      .select(TextNorm.normalizeText($"s")).as[String].collect()
    out.foreach { n =>
      assert(!n.contains("  ") && n == n.trim && n == n.toLowerCase)
    }
  }

  test("ShingleFingerprints yields max(1, tokens - n + 1) fingerprints on normalized text") {
    val rows = samples(asciiText, 300).toDF("s")
      .select(TextNorm.normalizeText($"s").as("n"))
      .filter(length($"n") > 0)
      .select($"n", ShingleFingerprints.shingleFingerprints($"n", 3).as("fp"))
      .as[(String, Seq[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, fp) =>
      val tokens = n.split(' ').length
      assert(fp.length == math.max(1, tokens - 3 + 1), s"text='$n'")
    }
  }

  test("SetSimJoin equals brute force on random set families (multiple thresholds)") {
    val setGen: Gen[Seq[Long]] =
      Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, 60L)).map(_.distinct))
    val fams = Iterator.continually(setGen.sample).flatten.take(60).toSeq
    val df = fams.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    for ((num, den) <- Seq((1, 2), (7, 10), (9, 10))) {
      val fast = graft.dedup.SetSimJoin.jaccardSelfJoin(df, "id", "s", num, den)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      val local = fams.map(_.toSet).zipWithIndex
      val brute = (for {
        (s1, i1) <- local; (s2, i2) <- local if i1 < i2
        inter = s1.intersect(s2).size
        if inter > 0 && inter * (den + num) >= (s1.size + s2.size) * num
      } yield (i1.toLong, i2.toLong)).toSet
      assert(fast == brute, s"tau=$num/$den fast=$fast brute=$brute")
    }
  }

  test("containmentJoin equals directed brute force on random set families") {
    val setGen: Gen[Seq[Long]] =
      Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, 60L)).map(_.distinct))
    val fams = Iterator.continually(setGen.sample).flatten.take(60).toSeq
    val df = fams.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    for ((num, den) <- Seq((1, 2), (9, 10), (1, 1))) {
      val fast = graft.dedup.SetSimJoin.containmentJoin(df, "id", "s", num, den)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val local = fams.map(_.toSet).zipWithIndex
      val brute = (for {
        (sa, ia) <- local; (sb, ib) <- local if ia != ib
        if sa.intersect(sb).size * den >= sa.size * num
      } yield (ia.toLong, ib.toLong)).toSet
      assert(fast == brute,
        s"tau=$num/$den missing=${brute.diff(fast).take(3)} extra=${fast.diff(brute).take(3)}")
    }
  }

  test("Fingerprint64 equals reference FNV-1a for arbitrary strings (codegen path)") {
    def fnv(s: String): Long = {
      var h = 0xcbf29ce484222325L
      s.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      h
    }
    val got = samples(Gen.asciiPrintableStr, 300).toDF("s")
      .select($"s", Fingerprint64.fingerprint64($"s")).as[(String, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (s, h) => assert(h == fnv(s)) }
  }

  test("Exact.e equals JVM floor(x*10^s + 0.5) for arbitrary doubles (codegen parity)") {
    val xs: Seq[Double] = Iterator.continually(
        Gen.chooseNum(-1e7, 1e7).sample).flatten.take(300).toSeq ++
      // adversarial: values whose shortest repr sits on .xx5 boundaries
      Seq(0.005, 0.015, 0.125, 123.455, -123.455, 0.43375, 999999.995)
    for (s <- Seq(0, 2, 4, 6)) {
      val got = xs.toDF("x").select(Exact.e($"x", s)).as[Long].collect().toSeq
      val expect = xs.map(x => math.floor(x * math.pow(10, s) + 0.5).toLong)
      assert(got == expect, s"scale $s")
    }
  }

  test("chunk tiling invariants hold for arbitrary token counts (1..400)") {
    // distinct-token texts so chunk content can be checked positionally
    val sizes = Iterator.continually(Gen.chooseNum(1, 400).sample).flatten
      .take(60).toSeq ++ Seq(1, 31, 32, 33, 55, 56, 57, 80, 81) // stride edges
    val docs = sizes.distinct.map(n =>
      (n.toLong, (0 until n).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = TrainingDataQueries.chunked(docs, Seq("doc_id"))
      .select($"doc_id", $"chunk_id", $"cw")
      .as[(Long, Long, Seq[String])].collect()
      .groupBy(_._1)
    for (n <- sizes.distinct.map(_.toLong)) {
      val cs = out(n).sortBy(_._2)
      val expectNc = 1L + math.max(0L, math.ceil((n - 32).toDouble / 24).toLong)
      assert(cs.length == expectNc, s"n=$n")
      cs.foreach { case (_, cid, cw) =>
        // chunk cid holds exactly tokens [cid*24, min(cid*24+32, n))
        val expect = (cid * 24 until math.min(cid * 24 + 32, n)).map(i => s"t$i")
        assert(cw == expect, s"n=$n chunk=$cid")
      }
    }
  }

  test("SpaceSaving in the APPROXIMATE regime: capacity 8 over a 1000-key zipf stream stays inside the n/capacity bound") {
    import graft.functions.HeavyHitters
    // q34 runs the sketch where capacity >> domain (exact by
    // construction); this is the at-scale regime the sketch exists
    // for: capacity 8 counters summarizing a 1000-key zipf stream.
    // Metwally et al.'s guarantees under test:
    //   (1) any item with true frequency > n/capacity is reported,
    //   (2) reported counts only OVERestimate, by at most n/capacity.
    val capacity = 8
    val nKeys = 1000
    val n = 20000
    val rnd = new scala.util.Random(7L)
    // zipf(s=1.2) via inverse-CDF over precomputed cumulative weights
    val weights = Array.tabulate(nKeys)(i => 1.0 / math.pow(i + 1.0, 1.2))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    val stream = Seq.fill(n) {
      val u = rnd.nextDouble() * total
      val idx = {
        val p = java.util.Arrays.binarySearch(cum, u)
        if (p >= 0) p else -p - 1
      }
      f"key$idx%04d"
    }
    val truth = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val bound = n.toLong / capacity // 2500

    // both execution shapes: single partition (the textbook stream)
    // and 8-way partials merged by Spark (the mergeability claim)
    for (parts <- Seq(1, 8)) {
      val sketch = new HeavyHitters(capacity, k = capacity).toColumn.name("hh")
      val out = stream.toDF("item").repartition(parts).as[String]
        .select(sketch).toDF("hh")
        .select(explode(col("hh")).as("kv"))
        .select(col("kv._1").as("item"), col("kv._2").as("est"))
        .as[(String, Long)].collect().toMap
      assert(out.size <= capacity)
      val heavy = truth.filter(_._2 > bound)
      assert(heavy.nonEmpty, "zipf head must clear the reporting bar")
      heavy.foreach { case (k, c) =>
        assert(out.contains(k), s"[$parts parts] heavy item $k (true $c) missing")
      }
      out.foreach { case (k, est) =>
        val exact = truth.getOrElse(k, 0L)
        assert(est >= exact,
          s"[$parts parts] $k underestimated: est $est < true $exact")
        assert(est - exact <= bound,
          s"[$parts parts] $k error ${est - exact} exceeds n/capacity $bound")
      }
      // the zipf head is unambiguous: rank 1 is identified exactly
      val top = out.maxBy { case (k, est) => (est, k) }._1
      assert(top == truth.maxBy { case (k, c) => (c, k) }._1,
        s"[$parts parts] top-1 misidentified: $top")
      info(s"$parts partition(s): reported ${out.size} counters, " +
        s"max overestimate ${out.map { case (k, e) => e - truth.getOrElse(k, 0L) }.max} " +
        s"(bound $bound), heavy coverage ${heavy.size}/${heavy.size}")
    }
  }

  test("Lz78Phrases equals a naive string-dictionary parse (codegen path)") {
    // independent reference: the textbook LZ78 incremental parse with
    // byte-sequence phrases in a Set — quadratic but obviously correct
    def ref(s: String): Long = {
      val dict = scala.collection.mutable.Set.empty[Seq[Byte]]
      var cur = Vector.empty[Byte]
      var phrases = 0L
      s.getBytes("UTF-8").foreach { b =>
        cur = cur :+ b
        if (!dict.contains(cur)) { dict += cur; phrases += 1; cur = Vector.empty }
      }
      if (cur.nonEmpty) phrases += 1
      phrases
    }
    // hand-computed fixtures pin the parse semantics themselves
    // (a|aa|aa → 3; all-new → 5; a|b|ab|ab → 4)
    assert(ref("aaaaa") == 3L && ref("abcde") == 5L && ref("ababab") == 4L)
    val inputs = samples(asciiText, 200).filter(_.nonEmpty) ++
      Seq("aaaaa", "abcde", "ababab", "a", "aa",
        "spam spam spam spam spam spam spam spam",
        "x" * 1000, ("ab" * 500) + "tail")
    val got = inputs.toDF("s")
      .select($"s", graft.functions.Lz78Phrases.lz78Phrases($"s"))
      .as[(String, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (s, p) =>
      assert(p == ref(s), s"parse diverged on ${s.take(40)}…")
      assert(p <= s.getBytes("UTF-8").length, "phrases cannot exceed bytes")
    }
    // empty string → 0 (null-safe eval path)
    val empty = Seq("").toDF("s")
      .select(graft.functions.Lz78Phrases.lz78Phrases($"s")).as[Long].collect()
    assert(empty.toSeq == Seq(0L))
    // the quality-signal direction: a byte run parses far below an
    // alphabet-diverse text of the same length
    assert(ref("a" * 400) < ref((0 until 400).map(i => ('a' + i % 26).toChar).mkString) / 3)
  }
}
