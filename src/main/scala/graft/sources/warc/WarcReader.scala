package graft.sources.warc

import scala.collection.mutable.ArrayBuffer

/** WARC (Web ARChive, ISO 28500) record-level reader — the CommonCrawl
  * entry path. Hand-rolled from the public spec (the `PdfParser` from-spec
  * discipline):
  *
  *   record  = version-line CRLF *(header-line CRLF) CRLF
  *             block(Content-Length bytes) CRLF CRLF
  *
  * Lenient like every reader here: leading CRLF runs between records are
  * skipped, header names are case-insensitive (the spec mandates it), a
  * record without a parseable Content-Length or with a truncated block
  * ends the scan with the records already framed (never throws), and the
  * version line accepts any `WARC/x.y`.
  *
  * Byte-level, not Reader-level: WARC blocks are binary (gzip members,
  * images) — payloads are returned as raw slices and only headers are
  * decoded (they are ASCII per spec).
  */
object WarcReader {

  final case class WarcRecord(
      headers: Map[String, String], payload: Array[Byte]) {
    /** Case-insensitive header lookup (ISO 28500 §5.1). */
    def header(name: String): Option[String] = headers.get(name.toLowerCase)
  }

  /** Inflate a gzip container if the magic says so — `.warc.gz` is how
    * CommonCrawl actually ships WARCs, one gzip MEMBER per record
    * concatenated back-to-back (ISO 28500 annex; the member boundaries are
    * also the record boundaries). `GZIPInputStream` consumes concatenated
    * members natively, so the inflated stream is the plain WARC byte run
    * `records` already parses. Non-gzip bytes pass through untouched. */
  def gunzipIfNeeded(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 2 || (bytes(0) & 0xff) != 0x1f || (bytes(1) & 0xff) != 0x8b)
      return bytes
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](64 * 1024)
    try {
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) out.write(buf, 0, n)
        n = in.read(buf)
      }
    } finally in.close()
    out.toByteArray
  }

  private def lineEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length && b(i) != '\n') i += 1
    i // index of '\n' (or length)
  }

  /** Split a WARC file's bytes into records. */
  def records(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = ArrayBuffer.empty[WarcRecord]
    var i = 0
    while (i < bytes.length) {
      // skip inter-record CRLF runs
      while (i < bytes.length && (bytes(i) == '\r' || bytes(i) == '\n')) i += 1
      if (i >= bytes.length) return out.toSeq
      // version line
      val ve = lineEnd(bytes, i)
      val version = new String(bytes, i, ve - i, java.nio.charset.StandardCharsets.US_ASCII)
        .stripSuffix("\r")
      if (!version.startsWith("WARC/")) return out.toSeq
      i = ve + 1
      // header lines to the empty line
      val headers = Map.newBuilder[String, String]
      var blank = false
      while (!blank && i < bytes.length) {
        val he = lineEnd(bytes, i)
        val line = new String(bytes, i, he - i, java.nio.charset.StandardCharsets.US_ASCII)
          .stripSuffix("\r")
        i = he + 1
        if (line.isEmpty) blank = true
        else {
          val c = line.indexOf(':')
          if (c > 0)
            headers += line.substring(0, c).trim.toLowerCase ->
              line.substring(c + 1).trim
        }
      }
      if (!blank) return out.toSeq
      val rec = WarcRecord(headers.result(), Array.emptyByteArray)
      val len = rec.header("content-length").flatMap(_.toLongOption)
      len match {
        case Some(l) if i + l <= bytes.length =>
          out += rec.copy(payload =
            java.util.Arrays.copyOfRange(bytes, i, (i + l).toInt))
          i = (i + l).toInt
        case _ => return out.toSeq // unparseable/truncated block: stop
      }
    }
    out.toSeq
  }
}
