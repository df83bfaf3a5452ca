package graft

import org.apache.spark.sql.functions._

import graft.analytics.{Multimodal, TextAnalysis}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counting: whitespace and BPE-ish segmentation") {
    val df = Seq("hello world", "don't stop!  now", "", "a1b2").toDF("text")
      .select(TextAnalysis.tokenCount($"text").as("ws"),
              TextAnalysis.bpeishTokenCount($"text").as("bp"))
    val rows = df.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(rows(0) == ((2, 2)))
    // don ' t stop ! now → 6 BPE-ish tokens vs 3 whitespace tokens
    assert(rows(1) == ((3, 6)))
    assert(rows(2) == ((0, 0)))
    assert(rows(3) == ((1, 4))) // a 1 b 2
  }

  test("language id: stopword heuristic picks the right language") {
    val df = Seq(
      ("the cat sat on the mat and it was happy", "en"),
      ("le chat est dans la maison et la porte", "fr"),
      ("der hund ist ein guter freund und die katze", "de"),
      ("el perro es un amigo y las casas son grandes", "es"),
      ("你好世界", "zh")
    ).toDF("text", "expected")
    val wrong = df.filter(TextAnalysis.langId($"text") =!= $"expected")
    assert(wrong.count() == 0)
  }

  test("quality gate: too-short and punctuation-heavy docs fail") {
    val good = "this is a perfectly reasonable sentence with enough tokens to pass the gate easily"
    val short = "too short"
    val punct = ("w! " * 20).trim // 50% punctuation chars per token
    val df = Seq(good, short, punct).toDF("text")
      .select(TextAnalysis.qualityOk($"text").as("ok"))
    assert(df.as[Int].collect().toSeq == Seq(1, 0, 0))
  }

  test("multimodal plumbing: payload round-trip, digest, stub decode shape") {
    val docs = Seq((1L, "hello"), (2L, "world")).toDF("doc_id", "text")
    val media = Multimodal.mediaFromDocuments(docs)
    assert(media.schema("payload").dataType.typeName == "binary")
    val feat = media.withColumn("f", Multimodal.stubDecode($"payload", 16))
    val sizes = feat.select(size($"f")).as[Int].collect()
    assert(sizes.forall(_ == 16))
    // deterministic: same payload → same features
    val f1 = feat.filter($"media_id" === 1L).select("f").head().getSeq[Double](0)
    val f2 = Multimodal.mediaFromDocuments(docs).filter($"media_id" === 1L)
      .withColumn("f", Multimodal.stubDecode($"payload", 16))
      .select("f").head().getSeq[Double](0)
    assert(f1 == f2)
    // sampleBytes keeps binary type and respects bounds
    val s = media.select(Multimodal.sampleBytes($"payload", 0, 3).as("s"))
      .head().getAs[Array[Byte]]("s")
    assert(s.length == 3)
    // batch-shaped decode: one output row per input, sane frame counts
    val decoded = Multimodal.decodeBatched(media).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(decoded.keySet == Set(1L, 2L))
    assert(decoded.values.forall(_ >= 1))
  }

  test("mm06 WAV codec: genuine RIFF round-trip, closed-form stats, corrupt payload rejected") {
    val docs = Seq((7L, "x"), (42L, "y")).toDF("doc_id", "text")
    val media = Multimodal.wavMedia(docs)
    // payloads are real RIFF/WAVE containers, not bare PCM
    val bytes = media.orderBy("media_id").select("payload")
      .as[Array[Byte]].collect()
    assert(bytes.forall(b => new String(b.take(4), "US-ASCII") == "RIFF"
      && new String(b.slice(8, 12), "US-ASCII") == "WAVE"))
    // decoded stats match the closed-form sample definition exactly
    val stats = Multimodal.decodeWavStats(media).orderBy("media_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getInt(4), r.getInt(5)))
    for (((id, n, sumAbs, mn, mx), _) <- stats.zipWithIndex) {
      val samples = (0 until Multimodal.WavSamples)
        .map(i => (((id * 31 + i) * 2654435761L) % 65536 - 32768).toInt)
      assert(n == Multimodal.WavSamples.toLong)
      assert(sumAbs == samples.map(s => math.abs(s).toLong).sum)
      assert(mn == samples.min && mx == samples.max)
    }
    // the decode genuinely parses the container: a corrupted header
    // (first byte flipped) must be rejected, not silently averaged
    val corrupt = media.withColumn("payload",
      udf((b: Array[Byte]) => { val c = b.clone(); c(0) = 'X'.toByte; c })
        .apply($"payload"))
    intercept[Exception] {
      Multimodal.decodeWavStats(corrupt).collect()
    }
  }

  test("mm07 TIFF codec: multi-page container, stride skips odd frames, corrupt rejected") {
    val docs = Seq((3L, "x"), (11L, "y")).toDF("doc_id", "text")
    val media = Multimodal.tiffMedia(docs)
    // payloads are genuine TIFF containers (big- or little-endian magic)
    val bytes = media.select("payload").as[Array[Byte]].collect()
    assert(bytes.forall(b =>
      (b(0) == 'M' && b(1) == 'M') || (b(0) == 'I' && b(1) == 'I')))
    val rows = Multimodal.sampleTiffFrames(media)
      .orderBy("media_id", "frame_no").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // stride 2 over 6 frames → exactly frames 0, 2, 4 per clip
    assert(rows.map(t => (t._1, t._2)).toSeq ==
      Seq((3L, 0), (3L, 2), (3L, 4), (11L, 0), (11L, 2), (11L, 4)))
    assert(rows.forall(_._3 == Multimodal.TiffFrames))
    // decoded pixel sums match the closed-form frame definition
    for ((id, f, _, sum) <- rows) {
      val expect = (0 until Multimodal.TiffSide * Multimodal.TiffSide)
        .map(i => (id * 31 + f * 97 + i) % 256).sum
      assert(sum == expect, s"clip $id frame $f")
    }
    // a corrupted page-directory byte must fail the parse, not yield
    // silently wrong frames (offset 4 = first IFD offset in the header)
    val corrupt = media.withColumn("payload",
      udf((b: Array[Byte]) => { val c = b.clone(); c(4) = -1; c(5) = -1
        c(6) = -1; c(7) = -1; c })
        .apply($"payload"))
    intercept[Exception] {
      Multimodal.sampleTiffFrames(corrupt).collect()
    }
  }

  test("mm10 GIF codec: animated container, palette-order-proof pixels, corrupt rejected") {
    val docs = Seq((3L, "x"), (11L, "y")).toDF("doc_id", "text")
    val media = Multimodal.gifMedia(docs)
    // payloads are genuine GIF containers (GIF87a/GIF89a magic)
    val bytes = media.select("payload").as[Array[Byte]].collect()
    assert(bytes.forall(b =>
      b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'))
    val rows = Multimodal.sampleGifFrames(media)
      .orderBy("media_id", "frame_no").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // stride 2 over 6 frames → exactly frames 0, 2, 4 per clip
    assert(rows.map(t => (t._1, t._2)).toSeq ==
      Seq((3L, 0), (3L, 2), (3L, 4), (11L, 0), (11L, 2), (11L, 4)))
    assert(rows.forall(_._3 == Multimodal.GifFrames))
    // decoded pixel sums match the closed-form frame definition —
    // lossless round trip through the indexed palette
    for ((id, f, _, sum) <- rows) {
      val expect = (0 until Multimodal.GifSide * Multimodal.GifSide)
        .map(i => (id * 37 + f * 101 + i) % 256).sum
      assert(sum == expect, s"clip $id frame $f")
    }
    // a truncated animation must fail the parse, not yield silently
    // wrong frames. (Note: the JDK's GIF reader does NOT validate the
    // GIF87a/GIF89a signature — a flipped magic byte decodes fine — so
    // truncation is the corruption a quarantine gate can actually count
    // on this codec to reject.)
    val corrupt = media.withColumn("payload",
      udf((b: Array[Byte]) => java.util.Arrays.copyOf(b, b.length / 2))
        .apply($"payload"))
    intercept[Exception] {
      Multimodal.sampleGifFrames(corrupt).collect()
    }
  }

  test("mm09 perceptual hash: family separation; chunk blocking equals brute force") {
    import org.apache.spark.sql.functions.{bit_count, col}
    val docs = (0L until 80L).map(i => (i, "x")).toDF("doc_id", "text")
    val hashes = Multimodal.ahash64(
      Multimodal.pngNearDupMedia(docs))
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(hs(a) ^ hs(b))
    val fam = Multimodal.PhashFamily
    // planted family members stay within the bar; cross-family pairs
    // clear it with margin (the fixture's mixer guarantees ≥ 14)
    for (a <- 0L until 80L; b <- a + 1 until 80L) {
      if (a / fam == b / fam) assert(ham(a, b) <= 7, s"($a,$b) ${ham(a, b)}")
      else assert(ham(a, b) > 7, s"($a,$b) ${ham(a, b)}")
    }
    // pigeonhole blocking = exact recall at Hamming 7: the blocked
    // candidate join must reproduce brute force pair for pair
    val blocked = Multimodal.phashPairs(hashes)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)]
      .collect().toSet
    val brute = hashes.as("a").join(hashes.as("b"),
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id"), col("b.media_id"),
              bit_count(col("a.ahash").bitwiseXOR(col("b.ahash"))))
      .as[(Long, Long, Int)].collect().filter(_._3 <= 7).toSet
    assert(blocked == brute && blocked.nonEmpty)
  }
}
