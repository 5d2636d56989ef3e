package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal.{Containers, MediaCodec, MediaRow}

/** Round-trip proof for the real container-header codec: every builder's
  * output parses back to the exact (width, height, format) it encoded,
  * including headers with extra segments/chunks before the metadata and
  * truncated/corrupt payloads. */
class MediaCodecSpec extends AnyFunSuite {

  private val body = "the quick brown fox".getBytes("UTF-8")

  test("png round-trips width/height through a real IHDR") {
    val b = Containers.png(1920, 1080, body)
    assert(b.length == 33 + body.length)
    assert(MediaCodec.parseHeader(b) == ((1920, 1080, "png")))
  }

  test("jpeg round-trips through SOF0, and survives extra segments before SOF") {
    val plain = Containers.jpeg(640, 480, body)
    assert(plain.length == 21 + body.length)
    assert(MediaCodec.parseHeader(plain) == ((640, 480, "jpeg")))

    // splice an APP0 (JFIF) segment between SOI and SOF0 — real encoders do
    // declared length 8 = 2 length bytes + 6 payload bytes
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte, 0, 8, 'J', 'F', 'I', 'F', 0, 0)
    val spliced = plain.take(2) ++ app0 ++ plain.drop(2)
    assert(MediaCodec.parseHeader(spliced) == ((640, 480, "jpeg")))
  }

  test("gif round-trips via little-endian logical screen descriptor") {
    val b = Containers.gif(320, 200, body)
    assert(b.length == 13 + body.length)
    assert(MediaCodec.parseHeader(b) == ((320, 200, "gif")))
  }

  test("wav round-trips (sample_rate, channels), and survives a chunk before fmt") {
    val b = Containers.wav(44100, 2, body)
    assert(b.length == 44 + body.length)
    assert(MediaCodec.parseHeader(b) == ((44100, 2, "wav")))

    // insert a JUNK chunk before fmt — chunk scan must skip it (word-aligned)
    val junk = "JUNK".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 1, 2, 3, 0)
    val withJunk = b.take(12) ++ junk ++ b.drop(12)
    assert(MediaCodec.parseHeader(withJunk) == ((44100, 2, "wav")))
  }

  test("edge dims and degenerate payloads") {
    assert(MediaCodec.parseHeader(Containers.png(1, 1, Array.empty)) == ((1, 1, "png")))
    assert(MediaCodec.parseHeader(Containers.gif(65535, 65535, Array.empty)) == ((65535, 65535, "gif")))
    assert(MediaCodec.parseHeader(Array.empty[Byte]) == ((0, 0, "empty")))
    assert(MediaCodec.parseHeader("not a container".getBytes("UTF-8")) == ((0, 0, "unknown")))
    // truncated PNG: signature present, IHDR missing
    assert(MediaCodec.parseHeader(Containers.png(9, 9, Array.empty).take(10)) == ((0, 0, "corrupt")))
    // JPEG whose marker stream ends before any SOF
    assert(MediaCodec.parseHeader(Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x02).map(_.toByte)) == ((0, 0, "corrupt")))
  }

  test("decode derives the exact feature sum-of-squares from parsed metadata") {
    val row = MediaRow(7L, Containers.jpeg(100, 50, body), "image")
    val d = MediaCodec.decode(row)
    assert(d.width == 100 && d.height == 50 && d.format == "jpeg")
    assert(d.n_bytes == 21 + body.length)
    // independent recompute of the documented formula
    val ss = (0 until MediaCodec.FeatureDim).map { k =>
      val m = math.floorMod(100L * (2 * k + 1) + 50L * (3 * k + 2) + d.n_bytes * (k + 1), 2000L) - 1000L
      m * m
    }.sum
    assert(d.feat_ss == ss)
    assert(d.features.length == MediaCodec.FeatureDim)
  }
}
