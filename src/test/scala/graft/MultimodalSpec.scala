package graft

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.{MediaRecord, StubDecoder}

/** Golden values for the multimodal plumbing. Since round 11 the catalog
  * entry q_multimodal_features is ALSO under the full driver oracle hash
  * (integer-derived features recomputed byte-for-byte in DuckDB); this
  * spec keeps pinning the double-precision feature frame and the codec
  * seam directly. */
class MultimodalSpec extends SparkSuite {

  test("stub decoder parses fake dims deterministically") {
    assert(StubDecoder.decodeDims(Array[Byte](0x12, 0x34, 0x56, 0x78)) ==
      ((0x12 << 4) | 0x4, (0x56 << 4) | 0x8))
    assert(StubDecoder.decodeDims(Array.emptyByteArray) == (1, 1))
  }

  test("extractFeatures computes exact byte statistics per partition") {
    val s = spark
    import s.implicits._
    val bytes = "abab".getBytes("UTF-8") // a=97 b=98, entropy = 1 bit
    val ds = Seq(MediaRecord(7L, "img", bytes)).toDS().repartition(3)
    val f = MultimodalOps.extractFeatures(ds).collect().head
    assert(f.media_id == 7L && f.kind == "img" && f.n_bytes == 4L)
    assert(f.mean_byte == 97.5)
    assert(math.abs(f.byte_entropy - 1.0) < 1e-12)
    assert(f.hist_l2 == 8L && f.n_byte_kinds == 2, // 2 a's + 2 b's → 2²+2²
      s"exact histogram stats: got (${f.hist_l2}, ${f.n_byte_kinds})")
    assert((f.width, f.height) == StubDecoder.decodeDims(bytes))
  }

  test("feature stats are byte-true for non-ASCII payloads") {
    // 'é' is 2 octets in UTF-8 (0xC3 0xA9) — the features must see
    // OCTETS, the invariant the byte-based DuckDB oracle now mirrors
    val s = spark
    import s.implicits._
    val bytes = "éé".getBytes("UTF-8") // C3 A9 C3 A9
    val ds = Seq(MediaRecord(9L, "img", bytes)).toDS()
    val f = MultimodalOps.extractFeatures(ds).collect().head
    assert(f.n_bytes == 4L)
    assert(f.hist_l2 == 8L && f.n_byte_kinds == 2)
    assert(f.mean_byte == (0xC3 + 0xA9) / 2.0)
    assert((f.width, f.height) ==
      (((0xC3 << 4) | (0xA9 & 15)), ((0xC3 << 4) | (0xA9 & 15))))
  }

  test("sampleFrames slices payloads into n in-order chunks") {
    val s = spark
    import s.implicits._
    val ds = Seq(MediaRecord(1L, "vid", (0 until 10).map(_.toByte).toArray)).toDS()
    val frames = MultimodalOps.sampleFrames(ds, 3).collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 1, 2))
    assert(frames.flatMap(_.frame).toSeq == (0 until 10).map(_.toByte).toSeq,
      "chunks must reassemble to the original payload")
  }

  test("frameStats handles payloads shorter than the frame count") {
    val s = spark
    import s.implicits._
    val ds = Seq(MediaRecord(1L, "vid", "x".getBytes("UTF-8")),
      MediaRecord(2L, "vid", Array[Byte](10, 20))).toDS()
    val got = MultimodalOps.frameStats(ds, 4).collect()
      .map(f => (f.media_id, f.frame_idx, f.n_bytes, f.sum_bytes,
        f.first_byte, f.last_byte)).sortBy(t => (t._1, t._2)).toSeq
    // len=1: every frame degenerates to the single byte; len=2: frames
    // 0,1 → byte 0 and frames 2,3 → byte 1 (from=⌊len·k/4⌋, ≥1 wide)
    assert(got == Seq(
      (1L, 0, 1L, 120L, 120, 120), (1L, 1, 1L, 120L, 120, 120),
      (1L, 2, 1L, 120L, 120, 120), (1L, 3, 1L, 120L, 120, 120),
      (2L, 0, 1L, 10L, 10, 10), (2L, 1, 1L, 10L, 10, 10),
      (2L, 2, 1L, 20L, 20, 20), (2L, 3, 1L, 20L, 20, 20)), got.toString)
  }

  test("feature pipeline runs over the documents-as-media adapter") {
    val n = MultimodalOps.featureQuery(spark, sfDir).count()
    assert(n == 500L)
  }

  test("resize survives adversarial decoders on fuzzed payloads (property)") {
    // the codec seam is a TRUST BOUNDARY: a buggy/hostile decoder may
    // claim any dimensions for any payload. The clamp must make every
    // (payload, claimed dims, target) combination produce exactly the
    // target grid with every sampled index in-bounds — fuzzed the way
    // Dsv2PropertySpec fuzzes split boundaries (deterministic seeds,
    // generators sampled directly).
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import TestSpark.spark.implicits._
    val payload: Gen[Array[Byte]] = Gen.chooseNum(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    val corpus: Gen[List[Array[Byte]]] =
      Gen.chooseNum(1, 24).flatMap(n => Gen.listOfN(n, payload))
    def sample[A](g: Gen[A], seed: Long): A =
      g.pureApply(Gen.Parameters.default, Seed(seed))
    // fixed-claim decoders cover the overflow corners; the derived one
    // varies per payload (dims > payload, dims from content)
    val hostile: Seq[MultimodalOps.Decoder] = Seq(
      (_: Array[Byte]) => (0, 0),
      (_: Array[Byte]) => (-5, -7),
      (_: Array[Byte]) => (Int.MaxValue, Int.MaxValue),
      (_: Array[Byte]) => (Int.MinValue, 3),
      (b: Array[Byte]) => (b.length * 2 + 1, 1),
      (b: Array[Byte]) => (1, b.length * 2 + 1),
      (b: Array[Byte]) => (b.length - 1, Int.MaxValue))
      .map(f => new MultimodalOps.Decoder {
        def decodeDims(bytes: Array[Byte]) = f(bytes)
      })
    (1L to 4L).foreach { seed =>
      val recs = sample(corpus, seed).zipWithIndex
        .map { case (b, i) => MediaRecord(i.toLong, "img", b) }
      val ds = recs.toDS().repartition(3)
      for (dec <- hostile; (tw, th) <- Seq((1, 1), (4, 3), (16, 16))) {
        val out = MultimodalOps.resize(ds, tw, th, dec).collect()
        assert(out.length == recs.size)
        assert(out.forall(r =>
          r.width == tw && r.height == th && r.media.length == tw * th),
          s"seed=$seed target=($tw,$th): wrong output grid")
      }
    }
  }

  test("resize resamples every payload to the fixed target grid") {
    import TestSpark.spark.implicits._
    val recs = Seq(
      MultimodalOps.MediaRecord(1L, "img", Array.tabulate(64)(i => i.toByte)),
      MultimodalOps.MediaRecord(2L, "img", Array[Byte](10, 20, 30)),
      MultimodalOps.MediaRecord(3L, "img", Array.emptyByteArray)).toDS()
    val out = MultimodalOps.resize(recs, 4, 4).collect().sortBy(_.media_id)
    assert(out.forall(r => r.width == 4 && r.height == 4 && r.media.length == 16),
      "every output is exactly the target grid regardless of input size")
    // nearest-neighbor determinism: resizing the same input twice is identical
    val again = MultimodalOps.resize(recs, 4, 4).collect().sortBy(_.media_id)
    out.zip(again).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a.media, b.media))
    }
    // sampled pixels come from the source payload (not fabricated)
    val r1 = out.find(_.media_id == 1L).get
    assert(r1.media.forall(b => (b & 0xff) < 64))
  }

  test("perceptualHash: aHash bits follow the resampled grid's mean") {
    import TestSpark.spark.implicits._
    // identical payloads → identical fingerprints; a payload with a
    // different byte pattern → different fingerprint; an empty payload
    // hashes to the all-zero bands (all bytes 0, mean 0, no byte > mean)
    val a = "the quick brown fox jumps over the lazy dog " * 4
    val recs = Seq(
      MultimodalOps.MediaRecord(1L, "img", a.getBytes("UTF-8")),
      MultimodalOps.MediaRecord(2L, "img", a.getBytes("UTF-8")),
      MultimodalOps.MediaRecord(3L, "img",
        ("ZZZZ aaaa " * 18).getBytes("UTF-8")),
      MultimodalOps.MediaRecord(4L, "img", Array.emptyByteArray)).toDS()
    val hs = MultimodalOps.perceptualHash(recs).collect()
      .map(p => p.media_id -> p).toMap
    assert(hs(1L) == hs(2L).copy(media_id = 1L),
      "identical payloads must fingerprint identically")
    assert((hs(1L).b0, hs(1L).b1, hs(1L).b2, hs(1L).b3) !=
      (hs(3L).b0, hs(3L).b1, hs(3L).b2, hs(3L).b3),
      "different payloads should fingerprint differently")
    assert(hs(4L).b0 == 0 && hs(4L).b1 == 0 && hs(4L).b2 == 0 &&
      hs(4L).b3 == 0, "empty payload is the all-zero fingerprint")
    // band values are 16-bit non-negative (the sign-bit-free packing the
    // Hamming arithmetic relies on)
    hs.values.foreach { p =>
      Seq(p.b0, p.b1, p.b2, p.b3).foreach(b =>
        assert(b >= 0 && b <= 0xffff, s"band out of range: $p"))
    }
    val again = MultimodalOps.perceptualHash(recs).collect()
      .map(p => p.media_id -> p).toMap
    assert(hs == again, "fingerprints must be deterministic")
  }
}
