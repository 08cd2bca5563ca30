package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Binary

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binary payload round-trips and metadata matches the stub decoder") {
    val docs = Tables.documents(spark, TestSpark.Sf).limit(50)
    val withPayload = docs.withColumn("payload", Binary.payloadOf(col("text")))

    // expression path (codegen'd, used by m01)
    val exprMeta = withPayload
      .select(col("doc_id") +: Binary.stubMetaColumns(col("payload")): _*)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

    // mapPartitions path (the real-decoder plumbing)
    val ds = withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
    val decoded = Binary.decodePartitions(ds, Binary.StubDecoder)
      .collect().sortBy(_._1)
      .map { case (id, m) => (id, m.nBytes, m.width.toLong, m.height.toLong, m.channels.toLong) }
      .toSeq

    assert(exprMeta == decoded)
    assert(exprMeta.forall { case (_, n, w, h, c) =>
      w == n % 640 && h == (n * 3) % 480 && c == 3L })
  }

  test("frame sampler (flatMap plumbing) and m02 column plan compute identical frames") {
    val ds = Tables.documents(spark, TestSpark.Sf).limit(100)
      .withColumn("payload", Binary.payloadOf(col("text")))
      .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
    val sampled = Binary.sampleFramesPartitions(ds, Binary.StubFrameSampler)
      .collect()
      .map { case (id, fid, frame) => (id, fid.toLong, frame.length.toLong) }
      .sortBy(t => (t._1, t._2)).toSeq
    val columnPlan = LlmQueries.m02FrameSample(spark, TestSpark.Sf)
      .filter(col("doc_id").isin(sampled.map(_._1).distinct: _*))
      .as[(Long, Long, Long)].collect().toSeq
    assert(sampled == columnPlan)
    // frames tile the payload exactly: per-doc lengths sum to n_bytes
    val bytesByDoc = ds.collect().map { case (id, p) => id -> p.length.toLong }.toMap
    sampled.groupBy(_._1).foreach { case (id, fs) =>
      assert(fs.map(_._3).sum == bytesByDoc(id), s"doc $id frame lengths don't tile")
    }
  }

  test("stub feature extraction yields deterministic fixed-width unit-range vectors") {
    val ds = Tables.documents(spark, TestSpark.Sf).limit(50)
      .withColumn("payload", Binary.payloadOf(col("text")))
      .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
    val ex = new Binary.StubFeatureExtractor(8)
    val a = Binary.extractFeaturesPartitions(ds, ex).collect().sortBy(_._1)
    val b = Binary.extractFeaturesPartitions(ds.repartition(7), ex).collect().sortBy(_._1)
    assert(a.map(_._1).toSeq == b.map(_._1).toSeq)
    assert(a.zip(b).forall { case ((_, x), (_, y)) => x.toSeq == y.toSeq })
    assert(a.forall { case (_, f) => f.length == 8 && f.forall(v => v >= 0f && v < 1f) })
  }

  test("resize stub honors the w*h*channels byte budget and is a no-op under it") {
    val big = Array.fill[Byte](100)(7)
    val resized = Binary.resizeStub(big, w = 4, h = 4, channels = 3) // budget 48
    assert(resized.length == 48 && resized.toSeq == big.take(48).toSeq)
    assert(Binary.resizeStub(big, 10, 10).toSeq == big.toSeq) // budget 300 >= 100
  }

  test("m03 perceptual near-dup finds the strongly-similar payloads (measured recall)") {
    import org.apache.spark.sql.functions._
    val got = LlmQueries.m03PerceptualNearDup(spark, TestSpark.Sf)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // strong ground truth: exact jaccard >= 0.9 pairs from the oracled d04
    val strong = LlmQueries.d04NgramJaccard(spark, TestSpark.Sf)
      .filter(col("inter") * 10 >= col("uni") * 9)
      .select("doc_id1", "doc_id2").as[(Long, Long)].collect().toSet
    assert(strong.nonEmpty)
    val hit = strong.count(got)
    println(s"[m03] recall ${hit}/${strong.size}")
    assert(hit * 10 >= strong.size * 9, s"recall ${hit}/${strong.size} below 0.9")
  }

  test("m03 signature survives a local edit (the perceptual property)") {
    import graft.functions.CdcChunks.cdcChunks
    import org.apache.spark.sql.functions._
    import graft.dedup.MinHash
    val texts = Tables.documents(spark, TestSpark.Sf)
      .orderBy("doc_id").limit(20).select("text").as[String].collect()
    val edited = texts.map(t =>
      t.substring(0, t.length / 2) + " spliced " + t.substring(t.length / 2))
    val all = (texts ++ edited).toSeq.toDF("text")
      .select(MinHash.signature(array_distinct(cdcChunks(col("text"), modulus = 4)),
        64, 0x5eedL).as("sig"))
      .as[Seq[Long]].collect()
    val (orig, ed) = all.splitAt(texts.length)
    val matches = orig.zip(ed).map { case (a, b) =>
      a.zip(b).count { case (x, y) => x == y } }
    println(s"[m03] edit sig matches/64: min ${matches.min}, avg ${matches.sum / matches.length}")
    // a ~1.6% splice leaves the chunk set ~97% identical, so the
    // estimated-jaccard signature agreement stays far above the 0.7
    // retrieval threshold (random pairs agree on ~0 of 64)
    assert(matches.min * 10 >= 64 * 8, s"min matches ${matches.min}")
  }

  test("real PGM codec: distributed decode of genuine P5 bytes through decodePartitions") {
    import graft.multimodal.Codecs
    // real images, real header, real raster — the decode boundary is
    // no longer stub-only. Each image is a distinct gradient so
    // metadata AND pixels are verifiable per id.
    val images = (1L to 6L).map { id =>
      val w = 3 + id.toInt; val h = 2 + id.toInt
      val px = Array.tabulate(w * h)(i => (i * 7 + id.toInt * 13) % 256)
      (id, Codecs.encodePgmP5(Codecs.GrayImage(w, h, px)))
    }
    val ds = spark.createDataset(images).repartition(3)
    val decoded = Binary.decodePartitions(ds, Codecs.PgmBmpDecoder)
      .collect().toMap
    images.foreach { case (id, bytes) =>
      val m = decoded(id)
      assert(m.width == 3 + id.toInt && m.height == 2 + id.toInt &&
        m.channels == 1 && m.nBytes == bytes.length.toLong,
        s"id $id decoded to $m")
    }
    // P2 (ASCII) with interleaved comments parses to the same pixels
    val ascii = ("P2 # ascii twin\n# comment line\n3 2\n255\n" +
      "0 10 20\n30 40 50\n").getBytes("US-ASCII")
    val img = Codecs.decodePgm(ascii)
    assert(img.width == 3 && img.height == 2 &&
      img.pixels.toSeq == Seq(0, 10, 20, 30, 40, 50))
  }

  test("real BMP codec: bottom-up padded raster round-trips pixel-exact") {
    import graft.multimodal.Codecs
    // width 3 → row stride 12 with 3 pad bytes; gray BMP (R=G=B=v)
    // makes the integer luma exact: (77+150+29)·v >> 8 = v
    val px = Array(5, 250, 17, 66, 128, 199)
    val bmp = Codecs.encodeBmp24(Codecs.GrayImage(3, 2, px))
    val img = Codecs.decodeBmp(bmp)
    assert(img.width == 3 && img.height == 2 && img.pixels.toSeq == px.toSeq)
    val meta = Codecs.PgmBmpDecoder.decode(bmp)
    assert(meta.width == 3 && meta.height == 2 && meta.channels == 3)
  }

  test("real feature extraction: grid means over decoded pixels match hand-computed values") {
    import graft.multimodal.Codecs
    // 4x4 image with constant quadrants → the 2x2 grid means ARE the
    // quadrant values (normalized by 255)
    val q = Array(
      10, 10, 200, 200,
      10, 10, 200, 200,
      60, 60, 255, 255,
      60, 60, 255, 255)
    val pgm = Codecs.encodePgmP5(Codecs.GrayImage(4, 4, q))
    val ds = spark.createDataset(Seq((1L, pgm), (2L, pgm))).repartition(2)
    val feats = Binary.extractFeaturesPartitions(ds, new Codecs.GrayGridExtractor(2, 2))
      .collect().toMap
    val expected = Seq(10f, 200f, 60f, 255f).map(_ / 255f)
    feats.values.foreach { f =>
      assert(f.length == 4)
      f.zip(expected).foreach { case (got, want) =>
        assert(math.abs(got - want) < 1e-6f, s"${f.toSeq} vs $expected")
      }
    }
    // BMP payloads flow through the SAME extractor unchanged
    val bmp = Codecs.encodeBmp24(Codecs.GrayImage(4, 4, q))
    val fb = new Codecs.GrayGridExtractor(2, 2).features(bmp)
    fb.zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-6f)
    }
  }

  test("real codec fails loudly on malformed payloads (no silent corpus poisoning)") {
    import graft.multimodal.Codecs
    val cases = Seq(
      "not an image at all".getBytes("US-ASCII"),
      "P5\n4 4\n255\nxx".getBytes("US-ASCII"),          // truncated raster
      "P5\n0 4\n255\n".getBytes("US-ASCII"),            // zero width
      "P5\n2 2\n70000\n".getBytes("US-ASCII"))          // 16-bit maxval
    cases.foreach { bad =>
      assertThrows[IllegalArgumentException](Codecs.PgmBmpDecoder.decode(bad))
    }
    // truncated BMP raster also refuses
    val ok = Codecs.encodeBmp24(Codecs.GrayImage(3, 2, Array(1, 2, 3, 4, 5, 6)))
    assertThrows[IllegalArgumentException](
      Codecs.decodeBmp(java.util.Arrays.copyOf(ok, ok.length - 4)))
    // pixel-count overflow: a crafted 65536x65536 header overflows
    // w*h to 0 in Int, which used to BYPASS every truncated-raster
    // guard and pass a zero-pixel image as ok=1 — the gate contract is
    // "magic that lies about its body must not pass"
    val overflow = Seq(
      "P5\n65536 65536\n255\n".getBytes("US-ASCII"),
      "P2\n65536 65536\n255\n".getBytes("US-ASCII"),
      "P6\n65536 65536\n255\n".getBytes("US-ASCII"))
    overflow.foreach { bad =>
      val e = intercept[IllegalArgumentException] {
        if (Codecs.isPpm(bad)) Codecs.decodePpm(bad)
        else Codecs.decodePgm(bad)
      }
      assert(e.getMessage.contains("overflow") ||
        e.getMessage.contains("truncated"), e.getMessage)
    }
    // BMP: same header forged into the dimension fields
    val bmp = Codecs.encodeBmp24(Codecs.GrayImage(2, 2, Array(1, 2, 3, 4)))
    val forged = bmp.clone()
    // biWidth at 18, biHeight at 22 (little-endian): 65536 = 0x00010000
    forged(18) = 0; forged(19) = 0; forged(20) = 1; forged(21) = 0
    forged(22) = 0; forged(23) = 0; forged(24) = 1; forged(25) = 0
    assertThrows[IllegalArgumentException](Codecs.decodeBmp(forged))
  }

  test("aHash64: re-encoding invariant, edit-tolerant, m04 recalls exact dups") {
    import graft.multimodal.Codecs
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

    // the property m03's byte fingerprint lacks: the SAME pixels in
    // two wire formats hash identically
    val img = Codecs.renderGray("some representative document text " * 8)
    val h5 = Codecs.aHash64(Codecs.decodeGray(Codecs.encodePgmP5(img)))
    val h2 = Codecs.aHash64(Codecs.decodeGray(Codecs.encodePgmP2(img)))
    assert(h5 == h2 && h5 == Codecs.aHash64(img),
      "aHash not invariant under P5/P2 re-encoding")
    // BMP too: 24-bit gray luma (77r+150g+29b)>>8 is exact when r=g=b,
    // so even the format FAMILY doesn't move the hash
    val hBmp = Codecs.aHash64(Codecs.decodeGray(Codecs.encodeBmp24(img)))
    assert(hBmp == h5, "aHash not invariant under BMP re-encoding")

    // small pixel edits flip few block bits; unrelated pixels diverge
    // 3 edited pixels touch at most 3 of the 64 blocks, so the hash
    // can move at most 3 bits — inside m04's pairing threshold
    val edited = img.pixels.clone()
    var i = 0
    while (i < 3) { edited(i * 83 % edited.length) = 255; i += 1 }
    val hEdit = Codecs.aHash64(Codecs.GrayImage(32, 32, edited))
    assert(hamming(h5, hEdit) <= 3, s"light edit moved ${hamming(h5, hEdit)} bits")
    val other = Codecs.renderGray("completely different content entirely " * 9)
    assert(hamming(h5, Codecs.aHash64(other)) > 3, "distinct content collided")
    // empty text renders (all-zero image) instead of crashing the task
    assert(Codecs.aHash64(Codecs.renderGray("")) == 0L)

    // planted recall: identical content under DIFFERENT wire formats
    // (even id → P5, odd id → P2, m04's convention) must pair up —
    // the re-encoding case m03's byte fingerprint provably misses
    val texts = Tables.documents(spark, TestSpark.Sf)
      .select("text").as[String].take(6)
    val planted = texts.zipWithIndex.flatMap { case (t, i) =>
      Seq((i * 2L, t), (i * 2L + 1001L, t)) // one even, one odd per text
    }
    import graft.dedup.SimHash
    val sigs = planted.toSeq.toDF("doc_id", "text_norm")
      .as[(Long, String)]
      .map { case (id, txt) =>
        val img2 = Codecs.renderGray(txt)
        val payload = if (id % 2 == 0) Codecs.encodePgmP5(img2)
                      else Codecs.encodePgmP2(img2)
        (id, Codecs.aHash64(Codecs.decodeGray(payload)))
      }.toDF("doc_id", "sig")
    val found = SimHash.nearDupPairsBlocked(sigs, "doc_id", "sig",
        nBlocks = 6, maxHamming = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val wantPairs = texts.indices.map(i => (i * 2L, i * 2L + 1001L)).toSet
    assert(wantPairs.subsetOf(found),
      s"missed cross-format exact pairs: ${wantPairs.diff(found)}")

    // the registered corpus query: every doc goes through BOTH wire
    // formats, so its own (p5, p2) self-pair at hamming 0 is the
    // corpus-supported floor (round-8 gate certified an empty frame —
    // this pins the production pairing path on positive rows), and
    // every reported pair really is hamming-close (recompute locally;
    // both formats decode to the same pixels, so one hash per doc)
    val corpus = LlmQueries.m04PixelNearDup(spark, TestSpark.Sf)
      .select("doc_id1", "fmt1", "doc_id2", "fmt2", "hamming")
      .as[(Long, String, Long, String, Long)].collect()
    val hashes = Tables.documents(spark, TestSpark.Sf)
      .select(col("doc_id"),
        graft.etl.TextNorm.normalizeText(col("text")).as("tn"))
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> Codecs.aHash64(Codecs.renderGray(t)) }
      .toMap
    assert(corpus.nonEmpty, "m04 emitted no rows — evidence-free gate row")
    val selfPairs = corpus.collect {
      case (a, f1, b, f2, h) if a == b => (f1, f2, h)
    }
    assert(selfPairs.length == hashes.size,
      s"expected one (p5,p2) self-pair per doc: ${selfPairs.length} vs ${hashes.size}")
    assert(selfPairs.forall { case (f1, f2, h) => f1 != f2 && h == 0L },
      "self-pairs must be cross-format at hamming 0")
    corpus.foreach { case (a, _, b, _, h) =>
      assert(hamming(hashes(a), hashes(b)) <= 3 && h == hamming(hashes(a), hashes(b)),
        s"pair ($a,$b) not close or hamming mismatch")
    }
  }

  test("real PPM color codec: P6/P3 round-trip, one luma rule, m05 channel census") {
    import graft.multimodal.Codecs
    // channel-exact round-trip through BOTH wire formats
    val img = Codecs.renderRgb("color payload fixture text " * 12)
    for ((enc, fmt) <- Seq(
        Codecs.encodePpmP6(img) -> "P6", Codecs.encodePpmP3(img) -> "P3")) {
      val back = Codecs.decodePpm(enc)
      assert(back.width == 32 && back.height == 32, fmt)
      assert(back.r.toSeq == img.r.toSeq && back.g.toSeq == img.g.toSeq &&
        back.b.toSeq == img.b.toSeq, s"$fmt raster not pixel-exact")
    }
    // ONE luma rule: a gray payload re-encoded as color (r=g=b=v)
    // decodes to exactly v ((77+150+29)·v >> 8 = v), so the hash
    // cannot move across the gray/color family boundary
    val gray = Codecs.renderGray("gray twin of a color payload " * 10)
    val asColor = Codecs.RgbImage(gray.width, gray.height,
      gray.pixels.clone(), gray.pixels.clone(), gray.pixels.clone())
    assert(Codecs.toGray(asColor).pixels.toSeq == gray.pixels.toSeq,
      "luma not exact on r=g=b")
    assert(Codecs.aHash64(Codecs.decodeGray(Codecs.encodePpmP6(asColor))) ==
      Codecs.aHash64(gray), "gray/color family boundary moved the hash")
    // the real MediaDecoder reports true dims + 3 channels for color
    val meta = Codecs.PgmBmpDecoder.decode(Codecs.encodePpmP6(img))
    assert(meta.width == 32 && meta.height == 32 && meta.channels == 3)
    // malformed payloads fail loudly (truncated raster, bad maxval)
    val p6 = Codecs.encodePpmP6(img)
    intercept[IllegalArgumentException] {
      Codecs.decodePpm(java.util.Arrays.copyOf(p6, p6.length - 10))
    }
    intercept[IllegalArgumentException] {
      Codecs.decodePpm("P3\n2 2\n70000\n0 0 0 0 0 0 0 0 0 0 0 0"
        .getBytes("US-ASCII"))
    }

    // m05 corpus query: one row per doc, wire parity holds everywhere,
    // sums match a local recompute (5-doc slice), channels distinct
    val rows = LlmQueries.m05ColorStats(spark, TestSpark.Sf)
      .select("doc_id", "width", "height", "sum_r", "sum_g", "sum_b",
        "chan_spread", "wire_parity")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    val nDocs = Tables.documents(spark, TestSpark.Sf).count()
    assert(rows.length == nDocs, "m05 must emit one row per doc")
    rows.foreach { r =>
      assert(r._2 == 32 && r._3 == 32)
      assert(r._8 == 1L, s"P6/P3 wire parity broke for doc ${r._1}")
      assert(r._7 == Seq(r._4, r._5, r._6).max - Seq(r._4, r._5, r._6).min)
      Seq(r._4, r._5, r._6).foreach(s => assert(s >= 0 && s <= 255L * 1024))
    }
    assert(rows.count(_._7 > 0) > rows.length / 2,
      "phase-shifted channels should differ on most documents")
    val local = Tables.documents(spark, TestSpark.Sf)
      .select(col("doc_id"), graft.etl.TextNorm.normalizeText(col("text")).as("tn"))
      .as[(Long, String)].collect().take(5)
      .map { case (id, t) =>
        val im = Codecs.renderRgb(t)
        (id, (im.r.foldLeft(0L)(_ + _), im.g.foldLeft(0L)(_ + _),
          im.b.foldLeft(0L)(_ + _)))
      }.toMap
    val byId = rows.map(r => r._1 -> ((r._4, r._5, r._6))).toMap
    local.foreach { case (id, want) =>
      assert(byId(id) == want, s"doc $id channel sums diverged from local render")
    }
  }

  test("real WAV codec: round-trip exact, chunk walker skips odd-padded foreign chunks, loud failures") {
    import graft.multimodal.Codecs
    val pcm = Codecs.PcmAudio(8000,
      Array[Short](0, 100, -32768, 32767, -1, 1, 0, 12345, -12345))
    // plain round trip
    assert(Codecs.decodeWav(Codecs.encodeWav(pcm)) == pcm)
    // foreign odd-length LIST chunk before fmt: the walker must skip
    // it AND honor RIFF's pad-to-even rule to find fmt/data at all
    assert(Codecs.decodeWav(Codecs.encodeWav(pcm, extraChunk = true)) == pcm)
    // empty waveform is a legal payload
    val empty = Codecs.PcmAudio(8000, Array.emptyShortArray)
    assert(Codecs.decodeWav(Codecs.encodeWav(empty)) == empty)
    // loud failures: bad magic, truncated data chunk
    intercept[IllegalArgumentException] {
      Codecs.decodeWav("RIFFxxxxNOPE".getBytes("US-ASCII"))
    }
    val wav = Codecs.encodeWav(pcm)
    intercept[IllegalArgumentException] {
      Codecs.decodeWav(java.util.Arrays.copyOfRange(wav, 0, wav.length - 3))
    }
  }

  test("trimSilence drops exactly the sub-threshold runs and re-encodes losslessly") {
    import graft.multimodal.Codecs
    val xs = Array[Short](0, 10, -255, 5000, 0, -4000, 255, 100, 0)
    val t = Codecs.trimSilence(Codecs.PcmAudio(8000, xs))
    assert(t.samples.toSeq == Seq[Short](5000, 0, -4000),
      "interior silence must survive, only the edges trim")
    assert(Codecs.decodeWav(Codecs.encodeWav(t)) == t)
    // all-silent trims to empty
    val silent = Codecs.PcmAudio(8000, Array[Short](1, -1, 0, 2))
    assert(Codecs.trimSilence(silent).samples.isEmpty)
    // threshold boundary: |x| == threshold is NOT silence
    val edge = Codecs.trimSilence(Codecs.PcmAudio(8000, Array[Short](256, 0)))
    assert(edge.samples.toSeq == Seq[Short](256))
  }

  test("m06 waveform stats match a local recompute through the same codec loop") {
    import graft.multimodal.Codecs
    import spark.implicits._
    val rows = LlmQueries.m06WaveformStats(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(rows.nonEmpty)
    // every corpus row certifies wire parity and the trim round trip
    rows.foreach { r =>
      assert(r._11 == 1L, s"encode->decode parity broke for doc ${r._1}")
      assert(r._10 == 1L, s"trim round trip broke for doc ${r._1}")
      assert(r._2 == 2048L && r._3 == 8000L)
      assert(r._9 <= r._2 - r._7 - r._8,
        "trimmed length can only shrink further than the edge runs")
    }
    // non-degenerate corpus: silence framing and signal both present
    assert(rows.forall(r => r._7 >= 64L && r._8 >= 64L),
      "render guarantees >= 64 samples of silence on each edge")
    assert(rows.exists(_._4 > 0L), "no signal anywhere in the corpus")
    // exact local recompute for a sample of docs
    val local = Tables.documents(spark, TestSpark.Sf)
      .select(col("doc_id"), graft.etl.TextNorm.normalizeText(col("text")).as("tn"))
      .as[(Long, String)].collect().take(5)
    val byId = rows.map(r => r._1 -> r).toMap
    local.foreach { case (id, t) =>
      val xs = Codecs.renderPcm(t).samples
      val n = xs.length
      val peak = xs.map(v => math.abs(v.toLong)).max
      val rms = Codecs.isqrt(xs.map(v => v.toLong * v).sum / n)
      val zc = (1 until n).count(i => xs(i - 1).toLong * xs(i).toLong < 0).toLong
      var lead = 0
      while (lead < n && math.abs(xs(lead).toInt) < 256) lead += 1
      var hi = n
      while (hi > lead && math.abs(xs(hi - 1).toInt) < 256) hi -= 1
      val got = byId(id)
      assert((got._4, got._5, got._6, got._7, got._8, got._9) ==
        ((peak, rms, zc, lead.toLong, (n - hi).toLong, (hi - lead).toLong)),
        s"doc $id stats diverged from local render")
    }
  }
}
