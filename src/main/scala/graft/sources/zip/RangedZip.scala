package graft.sources.zip

import java.io.{EOFException, InputStream}
import java.util.zip.{Inflater, InflaterInputStream}

import graft.sources.FsIO

/** Ranged-read zip access over the Hadoop `FileSystem` byte layer — the
  * metadata/decode road that never copies the container.
  *
  * `java.util.zip.ZipFile` demands a LOCAL file, which forced remote
  * (`hdfs:`/`s3a:`) workbooks through [[FsIO.localize]]'s whole-file
  * spill even when the caller only wanted the sheet list — a few hundred
  * bytes of a multi-GB container. This reader implements the zip
  * container format itself (PKWARE APPNOTE / ISO 21320): find the
  * end-of-central-directory record in a bounded tail read, parse the
  * central directory (entry name → offset/method/sizes, ZIP64 aware),
  * and open any entry as a stream of ranged reads — seek to the local
  * header, skip it, and inflate the bounded compressed range. Total I/O
  * for a sheet-list probe: one tail read + two tiny entry reads,
  * independent of container size; for a sheet decode: exactly the bytes
  * of that sheet's deflate stream.
  *
  * Sizes always come from the CENTRAL directory, never the local header
  * (streamed writers leave local sizes zero and use data descriptors —
  * the central record is the authoritative copy). Unsupported features
  * (encryption, compression methods other than stored/deflate, archives
  * whose central directory exceeds the sanity cap) throw; callers that
  * must tolerate arbitrary containers catch and fall back to the
  * localize road.
  */
object RangedZip {

  /** One central-directory entry. Offsets/sizes are ZIP64-resolved. */
  final case class Entry(
      name: String,
      method: Int,
      compressedSize: Long,
      uncompressedSize: Long,
      localHeaderOffset: Long)

  private val EocdSig = 0x06054b50
  private val Eocd64LocatorSig = 0x07064b50
  private val Eocd64Sig = 0x06064b50
  private val CenSig = 0x02014b50
  private val LocSig = 0x04034b50

  /** Max EOCD search window: 64 KiB comment + fixed record. */
  private val TailWindow = 64 * 1024 + 22
  /** Central directories larger than this are not a workbook's (sanity
    * cap against a corrupt size field driving a giant allocation). */
  private val MaxCdBytes = 256L << 20

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (u16(b, o) | (u16(b, o + 2).toLong << 16)) & 0xffffffffL
  private def u64(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(o + i) & 0xffL); i -= 1 }
    v
  }

  /** Parse the central directory of `path` (len from one getFileStatus
    * unless the caller already has it). */
  def entries(path: String, knownLen: Long = -1L): Map[String, Entry] = {
    val len = if (knownLen >= 0) knownLen else FsIO.len(path)
    val tailLen = math.min(len, TailWindow.toLong).toInt
    val tail = FsIO.readRange(path, len - tailLen, tailLen)
    // EOCD: last occurrence of the signature (a comment could embed the
    // byte pattern, but the REAL record is the one whose comment length
    // reaches exactly to end-of-file)
    var eocd = -1
    var i = tailLen - 22
    while (i >= 0 && eocd < 0) {
      if (u32(tail, i) == (EocdSig & 0xffffffffL) &&
          i + 22 + u16(tail, i + 20) == tailLen) eocd = i
      i -= 1
    }
    if (eocd < 0) throw new EOFException(s"no zip end record: $path")
    var totalEntries: Long = u16(tail, eocd + 10).toLong
    var cdSize: Long = u32(tail, eocd + 12)
    var cdOffset: Long = u32(tail, eocd + 16)
    // ZIP64: maxed 32/16-bit fields defer to the zip64 EOCD, found via
    // the 20-byte locator immediately before the EOCD
    if (totalEntries == 0xffffL || cdSize == 0xffffffffL ||
        cdOffset == 0xffffffffL) {
      val locPos = eocd - 20
      if (locPos >= 0 && u32(tail, locPos) == (Eocd64LocatorSig & 0xffffffffL)) {
        val eocd64Off = u64(tail, locPos + 8)
        val rec = FsIO.readRange(path, eocd64Off, 56)
        if (u32(rec, 0) != (Eocd64Sig & 0xffffffffL))
          throw new EOFException(s"bad zip64 end record: $path")
        totalEntries = u64(rec, 32)
        cdSize = u64(rec, 40)
        cdOffset = u64(rec, 48)
      }
    }
    if (cdSize > MaxCdBytes)
      throw new EOFException(s"central directory too large ($cdSize): $path")
    val cd = FsIO.readRange(path, cdOffset, cdSize.toInt)
    val out = Map.newBuilder[String, Entry]
    var p = 0
    var n = 0L
    while (n < totalEntries && p + 46 <= cd.length) {
      if (u32(cd, p) != (CenSig & 0xffffffffL))
        throw new EOFException(s"bad central entry at $p: $path")
      val method = u16(cd, p + 10)
      var csize = u32(cd, p + 20)
      var usize = u32(cd, p + 24)
      val nameLen = u16(cd, p + 28)
      val extraLen = u16(cd, p + 30)
      val commentLen = u16(cd, p + 32)
      var lho = u32(cd, p + 42)
      val name = new String(cd, p + 46, nameLen, "UTF-8")
      // ZIP64 extra field: 8-byte values present ONLY for maxed fields,
      // in the fixed order usize, csize, offset
      var ep = p + 46 + nameLen
      val eEnd = ep + extraLen
      while (ep + 4 <= eEnd) {
        val id = u16(cd, ep)
        val sz = u16(cd, ep + 2)
        if (id == 0x0001) {
          var vp = ep + 4
          if (usize == 0xffffffffL && vp + 8 <= eEnd) { usize = u64(cd, vp); vp += 8 }
          if (csize == 0xffffffffL && vp + 8 <= eEnd) { csize = u64(cd, vp); vp += 8 }
          if (lho == 0xffffffffL && vp + 8 <= eEnd) { lho = u64(cd, vp); vp += 8 }
        }
        ep += 4 + sz
      }
      out += name -> Entry(name, method, csize, usize, lho)
      p += 46 + nameLen + extraLen + commentLen
      n += 1
    }
    out.result()
  }

  /** Open one entry as a decompressed stream: ranged read of the local
    * header (to find where data starts — its name/extra lengths can
    * differ from the central copy), then a bounded raw or inflate stream
    * over exactly `compressedSize` bytes. */
  def openEntry(path: String, e: Entry): InputStream = {
    val lh = FsIO.readRange(path, e.localHeaderOffset, 30)
    if (u32(lh, 0) != (LocSig & 0xffffffffL))
      throw new EOFException(s"bad local header for ${e.name}: $path")
    val dataStart = e.localHeaderOffset + 30 + u16(lh, 26) + u16(lh, 28)
    val raw = new BoundedRangeStream(path, dataStart, e.compressedSize)
    e.method match {
      case 0 => raw // stored
      case 8 => new InflaterInputStream(raw, new Inflater(true), 64 * 1024)
      case m =>
        raw.close()
        throw new EOFException(s"unsupported zip method $m for ${e.name}")
    }
  }

  def readEntry(
      path: String, es: Map[String, Entry], name: String): Option[Array[Byte]] =
    es.get(name).map { e =>
      val in = openEntry(path, e)
      try in.readAllBytes()
      finally in.close()
    }

  /** A one-open bounded window [offset, offset+len) of the file. */
  private final class BoundedRangeStream(path: String, offset: Long, len: Long)
      extends InputStream {
    private val in = FsIO.openAt(path, offset)
    private var remaining = len
    override def read(): Int =
      if (remaining <= 0) -1
      else {
        val b = in.read()
        if (b >= 0) remaining -= 1
        b
      }
    override def read(buf: Array[Byte], off: Int, n: Int): Int =
      if (remaining <= 0) -1
      else {
        val got = in.read(buf, off, math.min(n.toLong, remaining).toInt)
        if (got > 0) remaining -= got
        got
      }
    override def close(): Unit = in.close()
  }

  /** Open one entry as a stream with the standard fallback policy: ranged
    * road first; containers the ranged reader rejects go through
    * localize+`ZipFile`. Returns the stream plus the closer that releases
    * whatever container resources back it. */
  def entryStreamOrLocalize(
      path: String, entry: String): Option[(InputStream, () => Unit)] =
    try {
      val view = new ZipView(path)
      view.open(entry).map(in => (in, () => in.close()))
    } catch {
      case _: Exception =>
        val localized = FsIO.localize(path)
        try {
          val zip = new java.util.zip.ZipFile(localized.file)
          Option(zip.getEntry(entry)) match {
            case None =>
              zip.close(); localized.close(); None
            case Some(e) =>
              val in = zip.getInputStream(e)
              Some((in, () => { in.close(); zip.close(); localized.close() }))
          }
        } catch {
          case e: Throwable => localized.close(); throw e
        }
    }

  /** A reusable view: one central-directory parse, many entry opens. */
  final class ZipView(val path: String, knownLen: Long = -1L) {
    val entries: Map[String, Entry] = RangedZip.entries(path, knownLen)
    def open(name: String): Option[InputStream] =
      entries.get(name).map(openEntry(path, _))
    def readAll(name: String): Option[Array[Byte]] =
      readEntry(path, entries, name)
  }
}
