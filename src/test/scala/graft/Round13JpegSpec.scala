package graft

import graft.operators.Multimodal.{Containers, MediaCodec}

/** Round-13 baseline-JPEG decode laws. The test side carries its own
  * INDEPENDENT encoder able to emit ARBITRARY quantized coefficient
  * blocks (full AC run/size coding with ZRL and EOB, its own canonical
  * tables — one flat 8-bit AC alphabet instead of the main encoder's
  * EOB-only table), so the decoder's Huffman walk, EXTEND, zigzag,
  * dequantize and IDCT are cross-checked against a second from-spec
  * implementation plus a naive reference IDCT. The DC-only law against
  * the main encoder is EXACT (quantization arithmetic is integer); the
  * AC law allows ±1 gray per pixel (two double IDCTs with different
  * summation order may round a .5 boundary apart). */
object JpegFixture {
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Encode quantized coefficient blocks (natural order, one Array(64)
    * per 8×8 block, row-major block order) as a single-component
    * baseline JPEG with quantizer table all-`q0`. */
  def encodeBlocks(
      w: Int, h: Int, q0: Int, blocks: Seq[Array[Int]]): Array[Byte] = {
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    require(blocks.length == bw * bh)
    val bos = new java.io.ByteArrayOutputStream()
    def m(x: Int): Unit = { bos.write(0xff); bos.write(x) }
    def be16(v: Int): Unit = { bos.write((v >> 8) & 0xff); bos.write(v & 0xff) }
    m(0xd8)
    m(0xdb); be16(2 + 65); bos.write(0)
    (0 until 64).foreach(_ => bos.write(q0))
    m(0xc0); be16(2 + 6 + 3)
    bos.write(8); be16(h); be16(w); bos.write(1)
    bos.write(1); bos.write(0x11); bos.write(0)
    // DC: 12 categories at 4 bits
    m(0xc4); be16(2 + 17 + 12); bos.write(0x00)
    (1 to 16).foreach(l => bos.write(if (l == 4) 12 else 0))
    (0 until 12).foreach(bos.write)
    // AC: the full 162-symbol alphabet, every code 8 bits (canonical)
    val acSyms = (0x00 +: 0xf0 +: (for {
      run <- 0 to 15; size <- 1 to 10
    } yield (run << 4) | size)).distinct.sorted
    m(0xc4); be16(2 + 17 + acSyms.length); bos.write(0x10)
    (1 to 16).foreach(l => bos.write(if (l == 8) acSyms.length else 0))
    acSyms.foreach(bos.write)
    val acCode = acSyms.zipWithIndex.toMap // canonical: index = code
    m(0xda); be16(2 + 1 + 2 + 3)
    bos.write(1); bos.write(1); bos.write(0x00)
    bos.write(0); bos.write(63); bos.write(0)
    var acc = 0; var accBits = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1); accBits += 1
        if (accBits == 8) {
          bos.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) bos.write(0)
          acc = 0; accBits = 0
        }
        i -= 1
      }
    }
    var pred = 0
    blocks.foreach { blk =>
      val diff = blk(0) - pred
      pred = blk(0)
      val t = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      put(t, 4)
      if (t > 0) put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      // AC run-length over zigzag positions 1..63
      var k = 1
      var zeros = 0
      var lastNonZero = 0
      (1 to 63).foreach(i => if (blk(ZigZag(i)) != 0) lastNonZero = i)
      while (k <= lastNonZero) {
        val v = blk(ZigZag(k))
        if (v == 0) zeros += 1
        else {
          while (zeros > 15) { put(acCode(0xf0), 8); zeros -= 16 }
          val s = 32 - Integer.numberOfLeadingZeros(math.abs(v))
          put(acCode((zeros << 4) | s), 8)
          put(if (v < 0) v + (1 << s) - 1 else v, s)
          zeros = 0
        }
        k += 1
      }
      if (lastNonZero < 63) put(acCode(0x00), 8) // EOB
    }
    while (accBits != 0) put(1, 1)
    m(0xd9)
    bos.toByteArray
  }

  /** Naive reference IDCT + level shift + clamp over DEQUANTIZED
    * coefficients (natural order). */
  def referencePixels(coef: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      for (u <- 0 until 8; v <- 0 until 8) {
        val au = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        val av = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
        s += au * av * coef(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16) *
          math.cos((2 * y + 1) * v * math.Pi / 16)
      }
      out(y * 8 + x) = math.max(0, math.min(255, Math.round(s / 4.0).toInt + 128))
    }
    out
  }
}

class Round13JpegSpec extends SparkSpec {
  import JpegFixture._

  test("DC-only main encoder round-trips exactly: decoded = blockwise quantized means") {
    for ((w, h, q0) <- Seq((24, 16, 3), (20, 11, 7), (9, 8, 1), (33, 26, 16))) {
      val img = PngFixture.grayImage(w, h)
      val jpg = Containers.jpegGray8Dc(w, h, img, q0)
      val got = MediaCodec.jpegGray(jpg)
      assert(got.isDefined, s"${w}x$h q=$q0 failed to decode")
      val (gw, gh, gray) = got.get
      assert(gw == w && gh == h)
      // expected: per 8x8 block (edge-replicated), the quantized DC value
      for (by <- 0 until (h + 7) / 8; bx <- 0 until (w + 7) / 8) {
        var s = 0
        for (y <- 0 until 8; x <- 0 until 8)
          s += (img(math.min(by * 8 + y, h - 1) * w +
            math.min(bx * 8 + x, w - 1)) & 0xff) - 128
        val dcQ = Math.floorDiv(2 * s + 8 * q0, 16 * q0)
        val exp = math.max(0, math.min(255,
          Math.floorDiv(dcQ * q0 + 4, 8) + 128))
        for (y <- by * 8 until math.min(by * 8 + 8, h);
             x <- bx * 8 until math.min(bx * 8 + 8, w))
          assert((gray(y * w + x) & 0xff) == exp,
            s"${w}x$h q=$q0 block ($bx,$by) pixel ($x,$y)")
      }
    }
  }

  test("restart markers: DRI + RSTn decode identically to the unrestarted stream") {
    val (w, h) = (48, 40)
    val img = PngFixture.grayImage(w, h)
    val plain = MediaCodec.jpegGray(Containers.jpegGray8Dc(w, h, img, 5)).get._3
    val restarted = Containers.jpegGray8Dc(w, h, img, 5, restartEvery = 4)
    // the restarted stream genuinely carries RSTn markers
    assert((0 until restarted.length - 1).exists(i =>
      (restarted(i) & 0xff) == 0xff && (restarted(i + 1) & 0xff) >= 0xd0 &&
        (restarted(i + 1) & 0xff) <= 0xd7))
    assert(MediaCodec.jpegGray(restarted).get._3.toSeq == plain.toSeq)
    // an out-of-sequence restart index (a lost interval's signature) must
    // refuse, not silently misplace every later MCU (T.81 B.2.4.4 cycle)
    val bad = restarted.clone()
    val rst = (0 until bad.length - 1).find(i =>
      (bad(i) & 0xff) == 0xff && (bad(i + 1) & 0xff) >= 0xd0 &&
        (bad(i + 1) & 0xff) <= 0xd7).get
    bad(rst + 1) = (0xd0 + (((bad(rst + 1) & 0x07) + 3) % 8)).toByte
    assert(MediaCodec.jpegGray(bad).isEmpty)
  }

  test("AC path: arbitrary coefficient blocks decode within ±1 of the reference IDCT") {
    val q0 = 2
    // one block exercising: DC, short runs, a ZRL, high-frequency tail
    val blk1 = new Array[Int](64)
    blk1(0) = 37 // DC (quantized)
    blk1(1) = -9; blk1(8) = 5; blk1(9) = -3
    blk1(ZigZagAt(20)) = 7
    blk1(ZigZagAt(40)) = -2 // forces a 16+ zero run (ZRL) before it
    blk1(63) = 1 // the very last coefficient: no EOB emitted
    val blk2 = new Array[Int](64)
    blk2(0) = -18
    blk2(2) = 11
    val jpg = encodeBlocks(16, 8, q0, Seq(blk1, blk2))
    val got = MediaCodec.jpegGray(jpg)
    assert(got.isDefined)
    val (w, _, gray) = (got.get._1, got.get._2, got.get._3)
    for ((blk, bi) <- Seq(blk1, blk2).zipWithIndex) {
      val deq = blk.map(_ * q0)
      deq(0) = blk(0) * q0
      val ref = referencePixels(deq)
      for (y <- 0 until 8; x <- 0 until 8) {
        val gotPx = gray(y * w + bi * 8 + x) & 0xff
        assert(math.abs(gotPx - ref(y * 8 + x)) <= 1,
          s"block $bi pixel ($x,$y): got $gotPx ref ${ref(y * 8 + x)}")
      }
    }
  }

  test("cross-encoder agreement: DC-only content through both encoders → identical pixels") {
    val (w, h) = (32, 24)
    val img = PngFixture.grayImage(w, h)
    val q0 = 4
    val viaMain = MediaCodec.jpegGray(Containers.jpegGray8Dc(w, h, img, q0)).get._3
    // same quantized DC values through the test encoder's full-AC tables
    val bw = (w + 7) / 8
    var pred = 0
    val blocks = for (by <- 0 until (h + 7) / 8; bx <- 0 until bw) yield {
      var s = 0
      for (y <- 0 until 8; x <- 0 until 8)
        s += (img(math.min(by * 8 + y, h - 1) * w +
          math.min(bx * 8 + x, w - 1)) & 0xff) - 128
      val b = new Array[Int](64)
      b(0) = Math.floorDiv(2 * s + 8 * q0, 16 * q0)
      b
    }
    val viaFixture = MediaCodec.jpegGray(encodeBlocks(w, h, q0, blocks)).get._3
    assert(viaMain.toSeq == viaFixture.toSeq)
  }

  test("q173 fixture JPEGs (text body) still take the byte-pool fallback; refusals hold") {
    val body = ("lorem ipsum dolor sit amet " * 8).getBytes("UTF-8")
    val payload = graft.operators.Multimodal.Containers.jpeg(640, 480, body)
    assert(MediaCodec.jpegGray(payload).isEmpty) // no DHT/SOS: refuse
    assert(MediaCodec.dhashBands(payload).isDefined) // fallback road
    // progressive (SOF2) refuses
    val img = PngFixture.grayImage(16, 16)
    val good = Containers.jpegGray8Dc(16, 16, img, 3)
    val prog = good.clone()
    // find the SOF0 marker and flip it to SOF2
    val sof = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    assert(MediaCodec.jpegGray(prog).isEmpty)
    // truncation refuses
    assert(MediaCodec.jpegGray(java.util.Arrays.copyOf(good, good.length - 9)).isEmpty)
  }

  private def ZigZagAt(k: Int): Int = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)(k)
}
