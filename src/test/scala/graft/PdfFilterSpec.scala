package graft

import java.io.ByteArrayOutputStream
import java.util.zip.Deflater

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.pdf.PdfParser
import graft.sources.pdf.PdfParser.{PArr, PDict, PName, PNum, PStream}

/** ISO 32000 §7.4 stream-filter coverage, decoded through the same
  * `Document.decodeStream` path the importer uses. LZW is pinned by a
  * hand-derived code sequence (not round-tripped against our own encoder
  * alone), plus an encoder round-trip that crosses the 9→10 bit width
  * change to exercise EarlyChange. */
class PdfFilterSpec extends AnyFunSuite {

  private val doc = new PdfParser.Document(Map.empty)

  private def stream(raw: Array[Byte], filters: String*): PStream = {
    val f: PdfParser.PObj =
      if (filters.length == 1) PName(filters.head)
      else PArr(filters.map(PName(_): PdfParser.PObj).toVector)
    PStream(PDict(Map("Filter" -> f)), raw)
  }

  private def decode(raw: Array[Byte], filters: String*): Option[Array[Byte]] =
    doc.decodeStream(stream(raw, filters: _*))

  test("ASCIIHexDecode: pairs, whitespace, EOD, odd-digit pad") {
    assert(decode("48 65 6C\n6C 6F>".getBytes("ISO-8859-1"), "ASCIIHexDecode")
      .map(new String(_, "ISO-8859-1")) == Some("Hello"))
    // odd trailing digit pads with 0: "7" → 0x70 = 'p'
    assert(decode("7>".getBytes("ISO-8859-1"), "ASCIIHexDecode")
      .map(_.toSeq) == Some(Seq(0x70.toByte)))
    assert(decode("4G>".getBytes("ISO-8859-1"), "ASCIIHexDecode").isEmpty)
  }

  test("ASCII85Decode: full groups, z shorthand, partial final group") {
    // independent tiny encoder for the round-trip direction
    def enc(data: Array[Byte]): String = {
      val sb = new StringBuilder
      data.grouped(4).foreach { g =>
        var t = 0L
        g.foreach(b => t = (t << 8) | (b & 0xffL))
        var pad = 4 - g.length
        t = t << (8 * pad)
        if (t == 0 && g.length == 4) sb.append('z')
        else {
          val cs = new Array[Char](5)
          var v = t
          (4 to 0 by -1).foreach { i => cs(i) = ('!' + (v % 85).toInt).toChar; v /= 85 }
          sb.appendAll(cs, 0, 5 - pad)
        }
      }
      sb.append("~>").toString()
    }
    val payloads = Seq(
      "Man is distinguished".getBytes("ISO-8859-1"),
      Array[Byte](0, 0, 0, 0, 1, 2),
      Array[Byte](-1, -2, -3),
      "x".getBytes("ISO-8859-1"))
    payloads.foreach { p =>
      assert(decode(enc(p).getBytes("ISO-8859-1"), "ASCII85Decode")
        .map(_.toSeq) == Some(p.toSeq), s"payload ${p.toSeq}")
    }
    // 'z' at group boundary = 4 zero bytes
    assert(decode("z~>".getBytes("ISO-8859-1"), "ASCII85Decode")
      .map(_.toSeq) == Some(Seq[Byte](0, 0, 0, 0)))
    // lone trailing char is invalid
    assert(decode("!~>".getBytes("ISO-8859-1"), "ASCII85Decode").isEmpty)
  }

  test("RunLengthDecode: literals, runs, EOD") {
    val raw = Array[Byte](2, 'a', 'b', 'c', 0xfe.toByte, 'x', 0x80.toByte, 'Z')
    assert(decode(raw, "RunLengthDecode")
      .map(new String(_, "ISO-8859-1")) == Some("abcxxx"))
  }

  /** MSB-first bit packing at a fixed 9-bit width (hand-vector helper). */
  private def pack9(codes: Seq[Int]): Array[Byte] = {
    var bits = 0L
    var n = 0
    val out = new ByteArrayOutputStream()
    codes.foreach { c =>
      bits = (bits << 9) | c
      n += 9
      while (n >= 8) { out.write(((bits >> (n - 8)) & 0xff).toInt); n -= 8 }
    }
    if (n > 0) out.write(((bits << (8 - n)) & 0xff).toInt)
    out.toByteArray
  }

  test("LZWDecode: hand-derived code sequence for AAAAA (KwKwK case included)") {
    // encode('AAAAA') = clear, 'A', 258 (KwKwK at the decoder), 258, EOD
    val raw = pack9(Seq(256, 'A', 258, 258, 257))
    assert(decode(raw, "LZWDecode")
      .map(new String(_, "ISO-8859-1")) == Some("AAAAA"))
  }

  test("LZWDecode: encoder round-trip across the 9->10 bit width change") {
    // independent encoder (EarlyChange = 1: width grows when the table
    // size reaches 2^w after an add — one code ahead of the decoder's lag)
    def lzwEncode(data: Array[Byte]): Array[Byte] = {
      val dict = scala.collection.mutable.HashMap.empty[Seq[Byte], Int]
      def reset(): Unit = { dict.clear(); (0 until 256).foreach(b => dict(Seq(b.toByte)) = b) }
      reset()
      var nextCode = 258
      var width = 9
      var bits = 0L
      var n = 0
      val out = new ByteArrayOutputStream()
      def emit(c: Int): Unit = {
        bits = (bits << width) | c
        n += width
        while (n >= 8) { out.write(((bits >> (n - 8)) & 0xff).toInt); n -= 8 }
      }
      emit(256)
      var w = Seq(data(0))
      data.drop(1).foreach { b =>
        if (dict.contains(w :+ b)) w = w :+ b
        else {
          emit(dict(w))
          dict(w :+ b) = nextCode
          nextCode += 1
          if (nextCode >= (1 << width) && width < 12) width += 1
          w = Seq(b)
        }
      }
      emit(dict(w))
      emit(257)
      if (n > 0) out.write(((bits << (8 - n)) & 0xff).toInt)
      out.toByteArray
    }
    // enough two-byte variety to mint > 256 dictionary entries → 10-bit codes
    val rnd = new scala.util.Random(7)
    val data = Array.fill[Byte](4000)((rnd.nextInt(8) + 'a').toByte)
    assert(decode(lzwEncode(data), "LZWDecode").map(_.toSeq) == Some(data.toSeq))
  }

  test("filter chains: ASCII85 around Flate decodes through both") {
    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new Deflater(); d.setInput(b); d.finish()
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val payload = "BT (chained) Tj ET".getBytes("ISO-8859-1")
    val flated = deflate(payload)
    // hex-wrap the flate bytes (ASCIIHex chain is simpler to build inline)
    val hexed = (flated.map(b => f"${b & 0xff}%02X").mkString + ">").getBytes("ISO-8859-1")
    assert(decode(hexed, "ASCIIHexDecode", "FlateDecode")
      .map(_.toSeq) == Some(payload.toSeq))
    // unsupported filter in a chain → None, never a throw
    assert(decode(hexed, "ASCIIHexDecode", "DCTDecode").isEmpty)
  }
}
