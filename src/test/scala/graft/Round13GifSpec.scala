package graft

import graft.operators.Multimodal.{Containers, MediaCodec}

/** Round-13 GIF pixel-decode laws. The test side carries its own
  * INDEPENDENT GIF encoder — the "uncompressed GIF" technique: a clear
  * code before every symbol keeps the LZW dictionary empty and every
  * index a 9-bit literal, which is a perfectly valid stream that shares
  * zero structure with the main encoder's real dictionary-growing LZW
  * (SqliteFixture discipline: two from-spec implementations cross-check
  * the decoder). The headline laws: lossless decode through both
  * encoders, and cross-FORMAT hash identity — the same pixels through
  * the GIF/LZW stack and the PNG/zlib stack land on one dHash. */
object GifFixture {
  /** Valid GIF89a with a 256-gray identity palette and a clear-heavy
    * uncompressed LZW stream (every index emitted as a 9-bit literal
    * behind its own clear code). */
  def encodeUncompressed(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == w * h)
    val bits = new java.io.ByteArrayOutputStream()
    var cur = 0L; var curBits = 0
    def put9(code: Int): Unit = {
      cur |= code.toLong << curBits
      curBits += 9
      while (curBits >= 8) { bits.write((cur & 0xff).toInt); cur >>>= 8; curBits -= 8 }
    }
    pixels.foreach { p => put9(256); put9(p & 0xff) } // clear, literal
    put9(257) // end
    if (curBits > 0) bits.write((cur & 0xff).toInt)
    val z = bits.toByteArray
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    le16(w); le16(h); bos.write(0x80 | 7); bos.write(0); bos.write(0)
    var v = 0
    while (v < 256) { bos.write(v); bos.write(v); bos.write(v); v += 1 }
    bos.write(0x2c); le16(0); le16(0); le16(w); le16(h); bos.write(0)
    bos.write(8) // min LZW code size
    var off = 0
    while (off < z.length) {
      val take = math.min(255, z.length - off)
      bos.write(take); bos.write(z, off, take); off += take
    }
    bos.write(0); bos.write(0x3b)
    bos.toByteArray
  }
}

class Round13GifSpec extends SparkSpec {
  import GifFixture._

  private def ham(a: Array[Int], b: Array[Int]): Int =
    (0 until 4).map(i => Integer.bitCount(a(i) ^ b(i))).sum

  test("gifGray decodes the uncompressed-LZW fixture to the exact pixels") {
    val img = PngFixture.grayImage(23, 14)
    val gif = encodeUncompressed(23, 14, img)
    val got = MediaCodec.gifGray(gif)
    assert(got.isDefined)
    val (w, h, gray) = got.get
    assert(w == 23 && h == 14 && gray.toSeq == img.toSeq)
  }

  test("real-LZW encoder round-trips, plain and interlaced, incl. dictionary growth") {
    // big enough that the dictionary grows through several width bumps
    for ((w, h) <- Seq((64, 48), (9, 8), (200, 120))) {
      val img = PngFixture.grayImage(w, h)
      for (inter <- Seq(false, true)) {
        val gif = Containers.gifGray8(w, h, img, interlaced = inter)
        val got = MediaCodec.gifGray(gif)
        assert(got.isDefined, s"${w}x$h inter=$inter failed to decode")
        assert(got.get._3.toSeq == img.toSeq, s"${w}x$h inter=$inter lossy")
      }
    }
    // low-entropy image: long runs drive the dictionary to 12-bit codes
    // and past full (mid-stream clear road)
    val flat = Array.fill[Byte](256 * 130)(0x40)
    val gif = Containers.gifGray8(256, 130, flat, interlaced = false)
    assert(MediaCodec.gifGray(gif).get._3.toSeq == flat.toSeq)
  }

  test("cross-format invariance: same pixels via GIF/LZW and PNG/zlib → identical dHash") {
    val (w, h) = (40, 24)
    val img = PngFixture.grayImage(w, h)
    val viaPng = MediaCodec.dhashBands(
      PngFixture.encode(w, h, 8, 0, img, _ => 4, 9)).get
    val viaGifReal = MediaCodec.dhashBands(
      Containers.gifGray8(w, h, img, interlaced = false)).get
    val viaGifInter = MediaCodec.dhashBands(
      Containers.gifGray8(w, h, img, interlaced = true)).get
    val viaGifUnc = MediaCodec.dhashBands(encodeUncompressed(w, h, img)).get
    assert(ham(viaPng, viaGifReal) == 0)
    assert(ham(viaPng, viaGifInter) == 0)
    assert(ham(viaPng, viaGifUnc) == 0)
  }

  test("q173 fixture GIFs (text body) still take the byte-pool fallback unchanged") {
    // include a body whose first byte is ',' (0x2C — an image-descriptor
    // introducer): the strict full-canvas gate must still refuse it
    val body = (", the quick brown fox jumps over the lazy dog " * 4).getBytes("UTF-8")
    val payload = graft.operators.Multimodal.Containers.gif(640, 480, body)
    assert(MediaCodec.gifGray(payload).isEmpty)
    val got = MediaCodec.dhashBands(payload)
    assert(got.isDefined)
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

  test("decoder refuses what it cannot prove: truncation, bad codes, partial frames") {
    val img = PngFixture.grayImage(20, 12)
    val good = Containers.gifGray8(20, 12, img, interlaced = false)
    assert(MediaCodec.gifGray(good).isDefined)
    // truncated mid-stream
    assert(MediaCodec.gifGray(java.util.Arrays.copyOf(good, good.length - 30)).isEmpty)
    // a non-full-canvas frame (left=3) must refuse, not mis-place pixels
    val shifted = good.clone()
    // image descriptor sits right after 6+7+768 bytes; left is at +1
    val d = 6 + 7 + 768
    assert((shifted(d) & 0xff) == 0x2c)
    shifted(d + 1) = 3
    assert(MediaCodec.gifGray(shifted).isEmpty)
    // corrupt LZW: splat garbage over the code stream
    val corrupt = good.clone()
    var i = d + 10 + 2
    val splatEnd = math.min(corrupt.length - 2, i + 12)
    while (i < splatEnd) { corrupt(i) = 0xff.toByte; i += 1 }
    assert(MediaCodec.gifGray(corrupt).isEmpty ||
      MediaCodec.gifGray(corrupt).get._3.toSeq != img.toSeq)
  }
}
