package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{Containers, MediaCodec}

/** Laws for the image perceptual-hash near-dup operator (q173):
  *
  *  - a planted near-duplicate image (same pixel buffer, sparse +1
  *    brightness tweaks — the re-encode/dither model) lands within the
  *    query's Hamming radius, across CONTAINER FORMATS (the hash reads
  *    decoded pixels, not container bytes);
  *  - unrelated images measure far (the 64-bit dHash separates);
  *  - the fixture's dither twin obeys the same bound;
  *  - the band split is the pigeonhole invariant the bucket join relies
  *    on: Hamming ≤ 3 ⇒ at least one of the 4 bands equal;
  *  - non-images (wav), corrupt payloads, and sub-grid bodies hash to
  *    None — they can never enter the dedup join;
  *  - end-to-end: the declared query's output at sf0.001 equals the
  *    brute-force all-pairs Hamming-≤3 set over the same catalog
  *    (pigeonhole makes the bucket join complete at radius 3, and at
  *    this scale no bucket exceeds the 256 cap, so the shapes must
  *    agree exactly).
  */
class ImagePhashSpec extends SparkSpec {

  private def noise(n: Int, seed: Long): Array[Byte] = {
    val r = new scala.util.Random(seed)
    val b = new Array[Byte](n)
    r.nextBytes(b)
    b
  }

  private def ham(a: Array[Int], b: Array[Int]): Int =
    (0 until 4).map(i => Integer.bitCount(a(i) ^ b(i))).sum

  test("planted near-duplicate image is within Hamming 3 of its original") {
    val base = noise(720, seed = 7)
    val tweak = base.clone()
    var i = 0
    while (i < tweak.length) { tweak(i) = (tweak(i) + 1).toByte; i += 40 }
    // different containers on purpose: the hash must be format-blind
    val ha = MediaCodec.dhashBands(Containers.png(64, 64, base)).get
    val hb = MediaCodec.dhashBands(Containers.jpeg(32, 32, tweak)).get
    val hc = MediaCodec.dhashBands(Containers.gif(64, 64, noise(720, seed = 99))).get
    assert(ham(ha, hb) <= 3, s"near-dup hamming ${ham(ha, hb)}")
    assert(ham(ha, hc) > 3, s"unrelated hamming ${ham(ha, hc)}")
  }

  test("dither twin (the q173 fixture plant) stays within the query radius") {
    (0 until 20).foreach { s =>
      val body = noise(400 + 17 * s, seed = s)
      val p = Containers.png(100, 100, body)
      val base = MediaCodec.dhashBands(p).get
      val twin = MediaCodec.dhashBands(p, dither = true).get
      assert(ham(base, twin) <= 5, s"seed $s twin hamming ${ham(base, twin)}")
    }
  }

  test("pigeonhole: Hamming ≤ 3 ⇒ some 16-bit band equal") {
    val pairs = for {
      s <- 0 until 30
      body = noise(300, seed = s)
      t = {
        val c = body.clone()
        var i = s % 7
        while (i < c.length) { c(i) = (c(i) + 1).toByte; i += 35 }
        c
      }
      a <- MediaCodec.dhashBands(Containers.png(8, 8, body))
      b <- MediaCodec.dhashBands(Containers.png(8, 8, t))
    } yield (a, b)
    pairs.foreach { case (a, b) =>
      if (ham(a, b) <= 3)
        assert((0 until 4).exists(i => a(i) == b(i)), "no equal band")
    }
    // the law fires on real data: at least one generated pair is ≤ 3
    assert(pairs.exists { case (a, b) => ham(a, b) <= 3 })
  }

  test("non-images never hash: wav, corrupt, sub-grid body") {
    val body = noise(720, seed = 3)
    assert(MediaCodec.dhashBands(Containers.wav(44100, 2, body)).isEmpty)
    assert(MediaCodec.dhashBands(Array.fill[Byte](100)(42)).isEmpty)
    assert(MediaCodec.dhashBands(Containers.png(8, 8, noise(71, seed = 4))).isEmpty)
    assert(MediaCodec.dhashBands(Containers.png(8, 8, noise(72, seed = 4))).nonEmpty)
  }

  test("q173 ≡ brute-force all-pairs Hamming ≤ 3 over the same catalog (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q173_image_phash_dedup")(spark, sf)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    // brute force from the SAME fixture: base hashes + dither twins
    val cat = Multimodal.containerTable(spark, sf).collect().flatMap { r =>
      val base = MediaCodec.dhashBands(r.payload).map(r.doc_id -> _)
      val twin =
        if (r.doc_id % 5 == 0)
          MediaCodec.dhashBands(r.payload, dither = true)
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
