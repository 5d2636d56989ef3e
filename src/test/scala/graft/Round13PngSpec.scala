package graft

import java.util.zip.{CRC32, Deflater}

import graft.operators.Multimodal.MediaCodec

/** Round-13 PNG pixel-decode laws. The test side carries its own PNG
  * ENCODER (chunk framing, FORWARD scanline filtering per ISO 15948 §9,
  * `java.util.zip.Deflater`) so the decoder and the fixture cross-check
  * from the spec independently — the SqliteFixture discipline. The
  * headline law is recompression invariance: same pixels, different zlib
  * level or filter choices → identical dHash, which is impossible under
  * the body-byte stand-in (different compressed bytes → different hash).
  */
object PngFixture {
  def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](12 + data.length)
    def be32(o: Int, v: Int): Unit = {
      out(o) = ((v >> 24) & 0xff).toByte; out(o + 1) = ((v >> 16) & 0xff).toByte
      out(o + 2) = ((v >> 8) & 0xff).toByte; out(o + 3) = (v & 0xff).toByte
    }
    be32(0, data.length)
    var i = 0
    while (i < 4) { out(4 + i) = typ.charAt(i).toByte; i += 1 }
    System.arraycopy(data, 0, out, 8, data.length)
    val crc = new CRC32
    crc.update(out, 4, 4 + data.length)
    be32(8 + data.length, crc.getValue.toInt)
    out
  }

  def ihdr(w: Int, h: Int, depth: Int, ctype: Int): Array[Byte] = {
    val d = new Array[Byte](13)
    d(0) = ((w >> 24) & 0xff).toByte; d(1) = ((w >> 16) & 0xff).toByte
    d(2) = ((w >> 8) & 0xff).toByte; d(3) = (w & 0xff).toByte
    d(4) = ((h >> 24) & 0xff).toByte; d(5) = ((h >> 16) & 0xff).toByte
    d(6) = ((h >> 8) & 0xff).toByte; d(7) = (h & 0xff).toByte
    d(8) = depth.toByte; d(9) = ctype.toByte
    d
  }

  /** Forward-filter raw sample rows (§9: Filt(x) = Orig(x) − predictor)
    * with a caller-chosen filter type per row, deflate at `level`, frame
    * as signature + IHDR + [PLTE] + IDAT + IEND. */
  def encode(
      w: Int, h: Int, depth: Int, ctype: Int,
      samples: Array[Byte], // raw rows, rowBytes each, no filter bytes
      filterOf: Int => Int,
      level: Int,
      plte: Option[Array[Byte]] = None,
      idatSplit: Int = Int.MaxValue): Array[Byte] = {
    val channels = ctype match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    }
    val bitsPerPixel = channels * depth
    val rb = (w * bitsPerPixel + 7) / 8
    val bpp = math.max(1, bitsPerPixel / 8)
    require(samples.length == h * rb, "bad sample buffer")
    val raw = new Array[Byte](h * (rb + 1))
    var y = 0
    while (y < h) {
      val f = filterOf(y)
      raw(y * (rb + 1)) = f.toByte
      var x = 0
      while (x < rb) {
        val orig = samples(y * rb + x) & 0xff
        val a = if (x >= bpp) samples(y * rb + x - bpp) & 0xff else 0
        val up = if (y > 0) samples((y - 1) * rb + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) samples((y - 1) * rb + x - bpp) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => up
          case 3 => (a + up) >> 1
          case 4 =>
            val pp = a + up - ul
            val pa = math.abs(pp - a); val pb = math.abs(pp - up)
            val pc = math.abs(pp - ul)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) up else ul
        }
        raw(y * (rb + 1) + 1 + x) = ((orig - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val def_ = new Deflater(level)
    def_.setInput(raw); def_.finish()
    val buf = new Array[Byte](raw.length + 1024)
    val n = def_.deflate(buf)
    require(def_.finished(), "deflate buffer too small")
    def_.end()
    val z = java.util.Arrays.copyOf(buf, n)
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(sig)
    bos.write(chunk("IHDR", ihdr(w, h, depth, ctype)))
    plte.foreach(p => bos.write(chunk("PLTE", p)))
    // IDAT may be split into many chunks — the decoder must concatenate
    var off = 0
    while (off < z.length) {
      val take = math.min(idatSplit, z.length - off)
      bos.write(chunk("IDAT", java.util.Arrays.copyOfRange(z, off, off + take)))
      off += take
    }
    bos.write(chunk("IEND", Array.emptyByteArray))
    bos.toByteArray
  }

  /** Deterministic gray test image: pixel (x,y) = (x·37 + y·101 + 13) mod 256. */
  def grayImage(w: Int, h: Int): Array[Byte] = {
    val s = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { s(y * w + x) = ((x * 37 + y * 101 + 13) % 256).toByte; x += 1 }
      y += 1
    }
    s
  }
}

class Round13PngSpec extends SparkSpec {
  import PngFixture._

  private def ham(a: Array[Int], b: Array[Int]): Int =
    (0 until 4).map(i => Integer.bitCount(a(i) ^ b(i))).sum

  test("pngGray decodes a hand-computed 3×2 image through all five filters") {
    // 3×2 gray-8: rows filtered Sub then Paeth — unfilter must recover
    val samples = Array[Byte](10, 30, 60, 110, 90, 200.toByte)
    for (f <- 0 to 4; level <- Seq(0, 1, 9)) {
      val png = encode(3, 2, 8, 0, samples, _ => f, level)
      val got = MediaCodec.pngGray(png)
      assert(got.isDefined, s"filter $f level $level failed to decode")
      val (w, h, gray) = got.get
      assert(w == 3 && h == 2)
      assert(gray.toSeq == samples.toSeq, s"filter $f level $level")
    }
  }

  test("recompression invariance: same pixels, any zlib level / filter / IDAT split → identical dHash") {
    val (w, h) = (40, 24)
    val img = grayImage(w, h)
    val variants = Seq(
      encode(w, h, 8, 0, img, _ => 0, 1),
      encode(w, h, 8, 0, img, _ => 0, 9),
      encode(w, h, 8, 0, img, y => y % 5, 6), // cycle all five filters
      encode(w, h, 8, 0, img, _ => 4, 9), // all-Paeth
      encode(w, h, 8, 0, img, _ => 2, 3, idatSplit = 17)) // many IDATs
    val hashes = variants.map(v => MediaCodec.dhashBands(v))
    assert(hashes.forall(_.isDefined))
    val base = hashes.head.get
    hashes.tail.foreach(o => assert(ham(base, o.get) == 0))
    // and the compressed byte streams genuinely differ (the law is not vacuous)
    assert(variants.map(_.toSeq).distinct.length == variants.length)
  }

  test("representation invariance: gray8, rgb(g,g,g), rgba, gray16 and palette hash identically") {
    val (w, h) = (18, 12)
    val img = grayImage(w, h)
    val rgb = new Array[Byte](w * h * 3)
    val rgba = new Array[Byte](w * h * 4)
    val g16 = new Array[Byte](w * h * 2)
    var i = 0
    while (i < w * h) {
      rgb(3 * i) = img(i); rgb(3 * i + 1) = img(i); rgb(3 * i + 2) = img(i)
      rgba(4 * i) = img(i); rgba(4 * i + 1) = img(i); rgba(4 * i + 2) = img(i)
      rgba(4 * i + 3) = 0xff.toByte
      // exact 8→16 expansion v = g·257 = (g<<8)|g: the correctly-rounded
      // 255/65535 rescale maps it back to g precisely
      g16(2 * i) = img(i); g16(2 * i + 1) = img(i)
      i += 1
    }
    // palette road: 256-entry gray palette, indices = pixels
    val plte = new Array[Byte](768)
    var v = 0
    while (v < 256) { plte(3 * v) = v.toByte; plte(3 * v + 1) = v.toByte; plte(3 * v + 2) = v.toByte; v += 1 }
    val base = MediaCodec.dhashBands(encode(w, h, 8, 0, img, _ => 1, 6)).get
    val asRgb = MediaCodec.dhashBands(encode(w, h, 8, 2, rgb, _ => 4, 9)).get
    val asRgba = MediaCodec.dhashBands(encode(w, h, 8, 6, rgba, _ => 3, 1)).get
    val asG16 = MediaCodec.dhashBands(encode(w, h, 16, 0, g16, _ => 2, 6)).get
    val asPal = MediaCodec.dhashBands(
      encode(w, h, 8, 3, img, _ => 0, 6, plte = Some(plte))).get
    assert(ham(base, asRgb) == 0)
    assert(ham(base, asRgba) == 0)
    assert(ham(base, asG16) == 0)
    assert(ham(base, asPal) == 0)
    // 16-bit rescale is correctly rounded, not high-byte truncation:
    // 0xFFFE → 255, 0x00FF → 1 (truncation would answer 254 and 0)
    val two16 = Array[Byte](0xff.toByte, 0xfe.toByte, 0x00, 0xff.toByte)
    val png16 = encode(2, 1, 16, 0, two16, _ => 0, 6)
    val g = MediaCodec.pngGray(png16)
    // (2×1 is under the dHash grid but pngGray itself must decode it)
    assert(g.isDefined && (g.get._3(0) & 0xff) == 255 && (g.get._3(1) & 0xff) == 1)
  }

  test("sub-byte depths: 1/2/4-bit gray expand by max-value scaling") {
    // 16×8 checkerboard at depth 1: bits packed high-first
    val (w, h) = (16, 8)
    val rb = w / 8
    val s1 = new Array[Byte](h * rb)
    var y = 0
    while (y < h) {
      s1(y * rb) = (if (y % 2 == 0) 0xaa else 0x55).toByte
      s1(y * rb + 1) = (if (y % 2 == 0) 0xaa else 0x55).toByte
      y += 1
    }
    val png = encode(w, h, 1, 0, s1, _ => 0, 6)
    val got = MediaCodec.pngGray(png)
    assert(got.isDefined)
    val (_, _, gray) = got.get
    // checkerboard: alternating 255/0, phase flipping per row
    assert((gray(0) & 0xff) == 255 && (gray(1) & 0xff) == 0)
    assert((gray(w) & 0xff) == 0 && (gray(w + 1) & 0xff) == 255)
  }

  test("q173 fixture PNGs (no zlib body) fall back to the byte-pool stand-in unchanged") {
    val body = ("the quick brown fox jumps over the lazy dog " * 4).getBytes("UTF-8")
    val payload = graft.operators.Multimodal.Containers.png(640, 480, body)
    assert(MediaCodec.pngGray(payload).isEmpty) // decode refuses garbage chunks
    val got = MediaCodec.dhashBands(payload)
    assert(got.isDefined)
    // expected: the documented stand-in — body bytes pooled 72-way
    val n = body.length
    val p = new Array[Int](72)
    for (j <- 0 until 72) {
      val lo = (j.toLong * n / 72).toInt
      val hi = ((j + 1).toLong * n / 72).toInt
      p(j) = (body.slice(lo, hi).map(_ & 0xff).sum / (hi - lo)).toInt
    }
    val exp = new Array[Int](4)
    for (r <- 0 until 8; c <- 0 until 8)
      if (p(r * 9 + c + 1) > p(r * 9 + c)) {
        val bit = r * 8 + c
        exp(bit / 16) |= 1 << (bit % 16)
      }
    assert(got.get.toSeq == exp.toSeq)
  }

  test("decoder refuses what it cannot prove: interlace, truncation, bad depth, length lies") {
    val (w, h) = (12, 10)
    val img = grayImage(w, h)
    val good = encode(w, h, 8, 0, img, _ => 0, 6)
    assert(MediaCodec.pngGray(good).isDefined)
    // interlaced flag set → None (falls back rather than mis-decoding Adam7)
    val inter = good.clone()
    inter(8 + 8 + 12) = 1 // IHDR interlace byte
    // (CRC now wrong — the decoder doesn't check CRC, interlace gate fires)
    assert(MediaCodec.pngGray(inter).isEmpty)
    // truncated IDAT → None
    val trunc = java.util.Arrays.copyOf(good, good.length - 20)
    assert(MediaCodec.pngGray(trunc).isEmpty)
    // depth/type combo the spec forbids (depth 16 palette) → None
    val badDepth = encode(w, h, 8, 0, img, _ => 0, 6).clone()
    badDepth(8 + 8 + 8) = 3 // depth 3 is invalid everywhere
    assert(MediaCodec.pngGray(badDepth).isEmpty)
    // dither on the real road still lands twins at small nonzero Hamming
    val base = MediaCodec.dhashBands(good).get
    val twin = MediaCodec.dhashBands(good, dither = true).get
    assert(ham(base, twin) <= 5)
    // PLTE arriving AFTER the image data it colors (spec-invalid §5.6):
    // reassemble a palette PNG with the chunks swapped → refuse
    val plte = new Array[Byte](768)
    var v = 0
    while (v < 256) { plte(3 * v) = v.toByte; plte(3 * v + 1) = v.toByte; plte(3 * v + 2) = v.toByte; v += 1 }
    val okPal = encode(12, 10, 8, 3, grayImage(12, 10), _ => 0, 6, plte = Some(plte))
    assert(MediaCodec.pngGray(okPal).isDefined)
    // chunk layout: sig(8) IHDR(25) PLTE(12+768) IDAT(...) IEND(12)
    val pStart = 33
    val pLen = 12 + 768
    val iEnd = okPal.length - 12
    val swapped = okPal.slice(0, pStart) ++
      okPal.slice(pStart + pLen, iEnd) ++ // IDAT first
      okPal.slice(pStart, pStart + pLen) ++ // then PLTE
      okPal.slice(iEnd, okPal.length)
    assert(MediaCodec.pngGray(swapped).isEmpty)
  }
}
