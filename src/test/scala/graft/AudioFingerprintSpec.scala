package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{Containers, MediaCodec}

/** Laws for the audio perceptual near-dup operator (q174) — the audio
  * twin of [[ImagePhashSpec]]:
  *
  *  - the fingerprint is GAIN-INVARIANT by construction (sign-of-delta
  *    bits): adding a constant to every frame flips no bit;
  *  - a planted re-encode twin (uniform gain + sparse dither — the q174
  *    fixture plant) lands within the query's Hamming radius;
  *  - unrelated audio measures far (the 64-bit fingerprint separates);
  *  - pigeonhole: Hamming ≤ 3 ⇒ at least one of the 4 bands equal (the
  *    bucket-join completeness invariant);
  *  - non-audio (png/jpeg/gif), corrupt payloads, and sub-frame bodies
  *    fingerprint to None — they can never enter the dedup join;
  *  - end-to-end: the declared query's output at sf0.001 equals the
  *    brute-force all-pairs Hamming-≤3 set over the same catalog.
  */
class AudioFingerprintSpec extends SparkSpec {

  private def noise(n: Int, seed: Long): Array[Byte] = {
    val r = new scala.util.Random(seed)
    val b = new Array[Byte](n)
    r.nextBytes(b)
    b
  }

  private def ham(a: Array[Int], b: Array[Int]): Int =
    (0 until 4).map(i => Integer.bitCount(a(i) ^ b(i))).sum

  test("uniform gain never flips a fingerprint bit (sign-of-delta invariance)") {
    (0 until 10).foreach { s =>
      val body = noise(300 + 31 * s, seed = s)
      // gain model at the byte stand-in grain: every pooled frame shifts
      // by the same amount — emulate by brightening every body byte is
      // NOT exact under integer pooling, so assert at the frame level
      // through the dither flag's +2 uniform component alone: compare
      // against a manual re-pool with a pure constant shift.
      val wav = Containers.wav(16000, 1, body)
      val base = MediaCodec.audioBands(wav).get
      // dither=true adds +2 everywhere and +1 on j%7==0; a pure-gain
      // variant is base+2 on every frame, which must hash identically
      // to base. Reconstruct it by pooling manually.
      val n = body.length
      val p = new Array[Long](65)
      (0 until 65).foreach { j =>
        val lo = (j.toLong * n / 65).toInt
        val hi = ((j + 1).toLong * n / 65).toInt
        p(j) = (lo until hi).map(i => (body(i) & 0xff).toLong).sum / (hi - lo) + 2
      }
      val bands = new Array[Int](4)
      (0 until 64).foreach { bit =>
        if (p(bit + 1) > p(bit)) bands(bit / 16) |= 1 << (bit % 16)
      }
      assert(ham(base, bands) == 0, s"seed $s: gain changed the fingerprint")
    }
  }

  test("planted twin (gain + dither, the q174 fixture plant) stays within radius") {
    (0 until 20).foreach { s =>
      val body = noise(260 + 13 * s, seed = s)
      val wav = Containers.wav(8000, 2, body)
      val base = MediaCodec.audioBands(wav).get
      val twin = MediaCodec.audioBands(wav, dither = true).get
      assert(ham(base, twin) <= 5, s"seed $s twin hamming ${ham(base, twin)}")
    }
  }

  test("unrelated audio measures far outside the radius") {
    val a = MediaCodec.audioBands(Containers.wav(8000, 1, noise(400, 1))).get
    val b = MediaCodec.audioBands(Containers.wav(8000, 1, noise(400, 2))).get
    assert(ham(a, b) > 3, s"unrelated hamming ${ham(a, b)}")
  }

  test("pigeonhole: Hamming ≤ 3 ⇒ some 16-bit band equal") {
    val pairs = for {
      s <- 0 until 30
      body = noise(280, seed = s)
      w = Containers.wav(8000, 1, body)
      a <- MediaCodec.audioBands(w)
      b <- MediaCodec.audioBands(w, dither = true)
    } yield (a, b)
    pairs.foreach { case (a, b) =>
      if (ham(a, b) <= 3)
        assert((0 until 4).exists(i => a(i) == b(i)), "no equal band")
    }
    assert(pairs.exists { case (a, b) => ham(a, b) <= 3 },
      "law never fired — no generated pair within radius")
  }

  test("non-audio never fingerprints: image containers, corrupt, sub-frame body") {
    val body = noise(400, seed = 3)
    assert(MediaCodec.audioBands(Containers.png(64, 64, body)).isEmpty)
    assert(MediaCodec.audioBands(Containers.jpeg(64, 64, body)).isEmpty)
    assert(MediaCodec.audioBands(Containers.gif(64, 64, body)).isEmpty)
    assert(MediaCodec.audioBands(Array.fill[Byte](100)(42)).isEmpty)
    assert(MediaCodec.audioBands(Containers.wav(8000, 1, noise(64, 4))).isEmpty)
    assert(MediaCodec.audioBands(Containers.wav(8000, 1, noise(65, 4))).nonEmpty)
  }

  test("q174 ≡ brute-force all-pairs Hamming ≤ 3 over the same catalog (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q174_audio_fingerprint_dedup")(spark, sf)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    val cat = Multimodal.containerTable(spark, sf).collect().flatMap { r =>
      val base = MediaCodec.audioBands(r.payload).map(r.doc_id -> _)
      val twin =
        if (r.doc_id % 3 == 0)
          MediaCodec.audioBands(r.payload, dither = true)
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
