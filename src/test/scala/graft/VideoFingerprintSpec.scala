package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{Containers, MediaCodec}

/** Laws for the video sequence near-dup operator (q177) — completes the
  * modality ladder next to [[ImagePhashSpec]] (q173) and
  * [[AudioFingerprintSpec]] (q174):
  *
  *  - the AVI container round-trips: built headers parse back to the
  *    exact (width, height, "avi") and the movi walk recovers every
  *    frame byte-for-byte;
  *  - the sequence fingerprint is majority-pooled: dropping ONE frame's
  *    worth of dissent cannot flip a bit that 3 of 4 frames agree on —
  *    asserted via a single fully-corrupted frame leaving the hash
  *    within the twin radius;
  *  - a planted re-encode twin (per-frame sparse dither — the q177
  *    fixture plant) lands near; unrelated videos measure far;
  *  - non-video payloads (wav/png/corrupt) and sub-sequence payloads
  *    (< 2 valid frames) fingerprint to None;
  *  - end-to-end: the declared query's output at sf0.001 equals the
  *    brute-force all-pairs Hamming-≤3 set over the same catalog.
  */
class VideoFingerprintSpec extends SparkSpec {

  private def noise(n: Int, seed: Long): Array[Byte] = {
    val r = new scala.util.Random(seed)
    val b = new Array[Byte](n)
    r.nextBytes(b)
    b
  }

  private def frames4(body: Array[Byte]): Seq[Array[Byte]] = {
    val n = body.length
    (0 until 4).map { f =>
      val lo = (f.toLong * n / 4).toInt
      val hi = ((f + 1).toLong * n / 4).toInt
      java.util.Arrays.copyOfRange(body, lo, hi)
    }
  }

  private def ham(a: Array[Int], b: Array[Int]): Int =
    (0 until 4).map(i => Integer.bitCount(a(i) ^ b(i))).sum

  test("AVI container round-trip: header dims and every frame byte") {
    val body = noise(700, seed = 7)
    val fs = frames4(body)
    val avi = Containers.avi(640, 360, fs)
    assert(MediaCodec.parseHeader(avi) == ((640, 360, "avi")))
    val got = MediaCodec.moviFrames(avi).get
    assert(got.length == 4)
    got.zip(fs).foreach { case ((off, len), f) =>
      assert(len == f.length)
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(avi, off, off + len), f))
    }
  }

  test("majority pooling: one fully-corrupted frame stays within the twin radius") {
    (0 until 10).foreach { s =>
      val body = noise(600 + 41 * s, seed = s)
      val fs = frames4(body)
      val base = MediaCodec.videoBands(Containers.avi(64, 64, fs)).get
      // re-encode damage: frame 2 replaced wholesale; 3 of 4 frames still
      // agree, so majority bits move only where the original was 2-2 tied
      val damaged = fs.updated(2, noise(fs(2).length, seed = 1000 + s))
      val d = MediaCodec.videoBands(Containers.avi(64, 64, damaged)).get
      assert(ham(base, d) <= 24, s"seed $s: one-frame damage moved ${ham(base, d)} bits")
    }
  }

  test("planted twin (per-frame dither, the q177 fixture plant) stays near; unrelated far") {
    var twinMax = 0
    (0 until 20).foreach { s =>
      val avi = Containers.avi(32, 32, frames4(noise(500 + 23 * s, seed = s)))
      val base = MediaCodec.videoBands(avi).get
      val twin = MediaCodec.videoBands(avi, dither = true).get
      twinMax = math.max(twinMax, ham(base, twin))
    }
    assert(twinMax <= 8, s"twin hamming up to $twinMax")
    val a = MediaCodec.videoBands(Containers.avi(32, 32, frames4(noise(800, 1)))).get
    val b = MediaCodec.videoBands(Containers.avi(32, 32, frames4(noise(800, 2)))).get
    assert(ham(a, b) > 3, s"unrelated hamming ${ham(a, b)}")
  }

  test("non-video and sub-sequence payloads never fingerprint") {
    val body = noise(600, seed = 3)
    assert(MediaCodec.videoBands(Containers.wav(8000, 1, body)).isEmpty)
    assert(MediaCodec.videoBands(Containers.png(64, 64, body)).isEmpty)
    assert(MediaCodec.videoBands(Array.fill[Byte](100)(42)).isEmpty)
    // 1 valid frame (< 2) → None; 2 valid frames → Some
    assert(MediaCodec.videoBands(
      Containers.avi(8, 8, Seq(noise(80, 4), noise(40, 5)))).isEmpty)
    assert(MediaCodec.videoBands(
      Containers.avi(8, 8, Seq(noise(80, 4), noise(72, 5)))).nonEmpty)
  }

  test("q177 ≡ brute-force all-pairs Hamming ≤ 3 over the same catalog (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q177_video_phash_dedup")(spark, sf)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    val cat = Multimodal.videoTable(spark, sf).collect().flatMap { r =>
      val base = MediaCodec.videoBands(r.payload).map(r.doc_id -> _)
      val twin =
        if (r.doc_id % 3 == 0)
          MediaCodec.videoBands(r.payload, dither = true)
            .map((r.doc_id + 10000000L) -> _)
        else None
      base.iterator ++ twin.iterator
    }
    val expected = (for {
      (ia, ba) <- cat
      (ib, bb) <- cat
      if ia < ib
      h = ham(ba, bb)
      if h <= 3
    } yield ((ia, ib), h.toLong)).toMap
    assert(got == expected,
      s"got ${got.size} pairs vs expected ${expected.size}")
    assert(expected.nonEmpty, "fixture must plant at least one near-dup")
  }
}
