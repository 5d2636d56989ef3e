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

  /** One batch of whole gzip MEMBERS of a `.warc.gz` archive: compressed
    * byte range [offset, offset+length) plus the index of its first
    * member. Per the ISO 28500 annex each record is its own gzip member,
    * so member boundaries are record boundaries and a batch's bytes
    * inflate to a self-contained WARC run any task can parse alone. */
  final case class GzBatch(offset: Long, length: Long, firstMember: Long)

  /** Walk a `.warc.gz` archive's gzip-member boundaries from the RFC 1952
    * framing — the index pass behind BulkIngest's big-archive split road.
    * Gzip has no random access, so the file streams through ONCE with a
    * raw `Inflater` whose output is DISCARDED (O(1) memory, inflate-speed
    * — cheap next to the parse work it unlocks); each member's compressed
    * end offset is recorded and consecutive members group into batches of
    * ≥ `targetBatchBytes` compressed bytes (last batch smaller). A
    * CommonCrawl-sized shard (~1 GB, ~50k members) then parses as ~128
    * independent ranged tasks instead of one whole-archive task.
    *
    * Lenient at the edges, strict in the middle: leading non-gzip bytes
    * or EOF end the walk with the members framed so far (matching
    * `GZIPInputStream`'s trailing-garbage behavior), but a member that
    * starts and then lies — truncated deflate, bad CM — throws, and the
    * caller answers Failed rather than silently dropping tail records. */
  def gzMemberBatches(
      path: String, targetBatchBytes: Long = 8L << 20): Seq[GzBatch] = {
    val in = new java.io.BufferedInputStream(
      graft.sources.FsIO.open(path), 1 << 20)
    try {
      val memberEnds = ArrayBuffer.empty[Long]
      var pos = 0L // absolute offset of the next logical byte
      // over-read bytes from the previous member's last inflate chunk
      var carry = Array.emptyByteArray
      var carryOff = 0
      def read1(): Int =
        if (carryOff < carry.length) {
          val v = carry(carryOff) & 0xff; carryOff += 1; pos += 1; v
        } else {
          val v = in.read(); if (v >= 0) pos += 1; v
        }
      def fill(b: Array[Byte]): Int =
        if (carryOff < carry.length) {
          val n = math.min(b.length, carry.length - carryOff)
          System.arraycopy(carry, carryOff, b, 0, n); carryOff += n; n
        } else in.read(b)
      def truncated() = new java.io.EOFException(s"truncated gzip member in $path")

      var more = true
      while (more) {
        // ---- member header (RFC 1952 §2.3)
        val m1 = read1()
        if (m1 < 0) more = false
        else {
          val m2 = read1()
          if (m1 != 0x1f || m2 != 0x8b) more = false // trailing garbage: stop
          else {
            if (read1() != 8) throw new java.io.IOException(s"bad CM in $path")
            val flg = read1()
            if (flg < 0) throw truncated()
            var i = 0
            while (i < 6) { if (read1() < 0) throw truncated(); i += 1 }
            if ((flg & 4) != 0) { // FEXTRA
              val lo = read1(); val hi = read1()
              if (lo < 0 || hi < 0) throw truncated()
              var j = 0
              val xl = lo | (hi << 8)
              while (j < xl) { if (read1() < 0) throw truncated(); j += 1 }
            }
            if ((flg & 8) != 0) { // FNAME: NUL-terminated; EOF is truncation
              var c = read1()
              while (c > 0) c = read1()
              if (c < 0) throw truncated()
            }
            if ((flg & 16) != 0) { // FCOMMENT
              var c = read1()
              while (c > 0) c = read1()
              if (c < 0) throw truncated()
            }
            if ((flg & 2) != 0) { // FHCRC
              if (read1() < 0 || read1() < 0) throw truncated()
            }
            // ---- raw deflate body: inflate-and-discard, count consumption
            val inf = new java.util.zip.Inflater(true)
            try {
              val inBuf = new Array[Byte](64 * 1024)
              val outBuf = new Array[Byte](64 * 1024)
              var lastChunk = 0
              while (!inf.finished()) {
                if (inf.needsInput()) {
                  val n = fill(inBuf)
                  if (n <= 0) throw truncated()
                  inf.setInput(inBuf, 0, n)
                  lastChunk = n
                }
                inf.inflate(outBuf) // throws on corrupt data
                ()
              }
              pos += inf.getBytesRead
              // give unconsumed tail of the last chunk back to the cursor
              val rem = inf.getRemaining
              if (rem > 0) {
                val nc = new Array[Byte](rem)
                System.arraycopy(inBuf, lastChunk - rem, nc, 0, rem)
                carry = nc; carryOff = 0
              } else { carry = Array.emptyByteArray; carryOff = 0 }
            } catch {
              case e: java.util.zip.DataFormatException =>
                throw new java.io.IOException(s"corrupt deflate in $path", e)
            } finally inf.end()
            // ---- trailer: CRC32 + ISIZE
            var t = 0
            while (t < 8) { if (read1() < 0) throw truncated(); t += 1 }
            memberEnds += pos
          }
        }
      }
      // ---- group whole members into ≥target compressed-byte batches
      val batches = ArrayBuffer.empty[GzBatch]
      var bStart = 0L
      var bFirst = 0L
      memberEnds.zipWithIndex.foreach { case (end, idx) =>
        if (end - bStart >= targetBatchBytes) {
          batches += GzBatch(bStart, end - bStart, bFirst)
          bStart = end; bFirst = idx + 1L
        }
      }
      if (memberEnds.nonEmpty && bStart < memberEnds.last)
        batches += GzBatch(bStart, memberEnds.last - bStart, bFirst)
      batches.toSeq
    } finally in.close()
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
