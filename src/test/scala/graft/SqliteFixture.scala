package graft

import scala.collection.mutable

/** Hand-built SQLite database files, straight from the file-format spec
  * (sqlite.org/fileformat2.html) — the XlsbFixture discipline: the test
  * side encodes the format independently, so the reader and the fixture
  * cross-check each other byte-for-byte. No sqlite library exists in this
  * container, which makes this the only honest way to test the importer.
  */
object SqliteFixture {

  sealed trait V
  case object VNull extends V
  final case class VInt(v: Long) extends V
  final case class VReal(v: Double) extends V
  final case class VText(s: String) extends V
  final case class VBlob(b: Array[Byte]) extends V

  def varint(v0: Long): Array[Byte] = {
    // 1-9 bytes, big-endian 7-bit groups, high-bit continuation
    if ((v0 >>> 56) != 0) {
      // 9-byte form (any value with bits above position 55, negatives
      // included): 8 continuation bytes + full low byte
      val out = new Array[Byte](9)
      var v = v0
      out(8) = (v & 0xff).toByte
      v >>>= 8
      var i = 7
      while (i >= 0) { out(i) = (0x80 | (v & 0x7f)).toByte; v >>>= 7; i -= 1 }
      out
    } else {
      val groups = mutable.ArrayBuffer.empty[Long]
      var v = v0
      do { groups += (v & 0x7f); v >>>= 7 } while (v != 0)
      val out = new Array[Byte](groups.length)
      var i = 0
      while (i < groups.length) {
        val g = groups(groups.length - 1 - i)
        out(i) = (if (i < groups.length - 1) (0x80 | g) else g).toByte
        i += 1
      }
      out
    }
  }

  /** Record encode: header of serial types + values. Ints take the
    * smallest serial (0/1 literals via types 8/9, else 1/2/3/4/6/8-byte). */
  def record(values: Seq[V], cs: java.nio.charset.Charset): Array[Byte] = {
    val encoded = values.map {
      case VNull => (0L, Array.emptyByteArray)
      case VInt(v) =>
        if (v == 0) (8L, Array.emptyByteArray)
        else if (v == 1) (9L, Array.emptyByteArray)
        else {
          // smallest signed big-endian width: bits needed incl. sign
          val bits = 65 - java.lang.Long.numberOfLeadingZeros(if (v < 0) ~v else v)
          val len = if (bits <= 8) 1 else if (bits <= 16) 2
            else if (bits <= 24) 3 else if (bits <= 32) 4
            else if (bits <= 48) 6 else 8
          val serial = len match {
            case 1 => 1L; case 2 => 2L; case 3 => 3L; case 4 => 4L
            case 6 => 5L; case _ => 6L
          }
          val b = new Array[Byte](len)
          var i = 0
          while (i < len) { b(len - 1 - i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
          (serial, b)
        }
      case VReal(d) =>
        val bits = java.lang.Double.doubleToLongBits(d)
        val b = new Array[Byte](8)
        var i = 0
        while (i < 8) { b(7 - i) = ((bits >>> (8 * i)) & 0xff).toByte; i += 1 }
        (7L, b)
      case VText(s) =>
        val b = s.getBytes(cs)
        (13L + 2 * b.length, b)
      case VBlob(b) => (12L + 2 * b.length, b)
    }
    val serialBytes = encoded.map(e => varint(e._1))
    // header length includes its own varint; sizes here stay 1-byte safe
    var hdrLen = 1 + serialBytes.map(_.length).sum
    if (hdrLen > 127) hdrLen += varint(hdrLen).length - 1
    val out = mutable.ArrayBuffer.empty[Byte]
    out ++= varint(hdrLen)
    serialBytes.foreach(out ++= _)
    encoded.foreach(out ++= _._2)
    out.toArray
  }

  /** One database under construction. Pages are 1-based. */
  final class Builder(val pageSize: Int = 512,
                      textEnc: Int = 1) {
    val cs: java.nio.charset.Charset = textEnc match {
      case 2 => java.nio.charset.StandardCharsets.UTF_16LE
      case 3 => java.nio.charset.StandardCharsets.UTF_16BE
      case _ => java.nio.charset.StandardCharsets.UTF_8
    }
    private val pages = mutable.ArrayBuffer.empty[Array[Byte]]

    def allocPage(): Int = { pages += new Array[Byte](pageSize); pages.length }
    def page(n: Int): Array[Byte] = pages(n - 1)

    private def put16(p: Array[Byte], o: Int, v: Int): Unit = {
      p(o) = ((v >>> 8) & 0xff).toByte; p(o + 1) = (v & 0xff).toByte
    }
    private def put32(p: Array[Byte], o: Int, v: Long): Unit = {
      p(o) = ((v >>> 24) & 0xff).toByte; p(o + 1) = ((v >>> 16) & 0xff).toByte
      p(o + 2) = ((v >>> 8) & 0xff).toByte; p(o + 3) = (v & 0xff).toByte
    }

    private def usable: Int = pageSize // reserved = 0

    /** A table-leaf cell for (rowid, record); allocates overflow pages as
      * the spec's split rule demands. */
    def leafCell(rowid: Long, rec: Array[Byte]): Array[Byte] = {
      val u = usable
      val x = u - 35
      val m = ((u - 12) * 32) / 255 - 23
      val head = varint(rec.length.toLong) ++ varint(rowid)
      if (rec.length <= x) head ++ rec
      else {
        val k = m + ((rec.length - m) % (u - 4))
        val local = if (k <= x) k else m
        // spill rec[local..] across a chain of overflow pages
        var rest = rec.length - local
        var off = local
        val chain = mutable.ArrayBuffer.empty[Int]
        while (rest > 0) {
          val pg = allocPage()
          chain += pg
          val take = math.min(u - 4, rest)
          System.arraycopy(rec, off, page(pg), 4, take)
          off += take; rest -= take
        }
        var i = 0
        while (i < chain.length - 1) {
          put32(page(chain(i)), 0, chain(i + 1).toLong); i += 1
        }
        val ptr = new Array[Byte](4)
        put32(ptr, 0, chain.head.toLong)
        head ++ rec.slice(0, local) ++ ptr
      }
    }

    /** Write a table-leaf page: header at `headerAt` (100 on page 1),
      * cells packed from the page end, pointers in cell order. */
    def writeTableLeaf(pageNo: Int, cells: Seq[Array[Byte]],
                       headerAt: Int = 0): Unit = {
      val p = page(pageNo)
      p(headerAt) = 0x0d
      put16(p, headerAt + 1, 0) // no freeblocks
      put16(p, headerAt + 3, cells.length)
      p(headerAt + 7) = 0 // fragmented bytes
      var contentEnd = pageSize
      var i = 0
      while (i < cells.length) {
        val c = cells(i)
        contentEnd -= c.length
        System.arraycopy(c, 0, p, contentEnd, c.length)
        put16(p, headerAt + 8 + 2 * i, contentEnd)
        i += 1
      }
      put16(p, headerAt + 5, if (contentEnd == 65536) 0 else contentEnd)
      require(headerAt + 8 + 2 * cells.length <= contentEnd, "page overfull")
    }

    /** Write a table-interior page: children = (childPage, maxRowid). */
    def writeTableInterior(pageNo: Int, children: Seq[(Int, Long)],
                           rightmost: Int, headerAt: Int = 0): Unit = {
      val p = page(pageNo)
      p(headerAt) = 0x05
      put16(p, headerAt + 1, 0)
      put16(p, headerAt + 3, children.length)
      p(headerAt + 7) = 0
      put32(p, headerAt + 8, rightmost.toLong)
      var contentEnd = pageSize
      var i = 0
      while (i < children.length) {
        val (child, maxRowid) = children(i)
        val ptr = new Array[Byte](4)
        put32(ptr, 0, child.toLong)
        val cell = ptr ++ varint(maxRowid)
        contentEnd -= cell.length
        System.arraycopy(cell, 0, p, contentEnd, cell.length)
        put16(p, headerAt + 12 + 2 * i, contentEnd)
        i += 1
      }
      put16(p, headerAt + 5, contentEnd)
    }

    /** An index-leaf page (type 0x0a) — enough for the WITHOUT ROWID
      * unsupported-table path. */
    def writeIndexLeaf(pageNo: Int): Unit = {
      val p = page(pageNo)
      p(0) = 0x0a
      put16(p, 3, 0)
      put16(p, 5, pageSize)
    }

    /** sqlite_master rows onto page 1 (must be allocated first). */
    def writeMaster(rows: Seq[(String, String, Long, String)]): Unit = {
      val cells = rows.zipWithIndex.map { case ((typ, name, root, sql), i) =>
        leafCell(i + 1L, record(Seq(
          VText(typ), VText(name), VText(name), VInt(root), VText(sql)), cs))
      }
      writeTableLeaf(1, cells, headerAt = 100)
    }

    def finish(path: String): Unit = {
      val h = page(1)
      System.arraycopy("SQLite format 3".getBytes("ISO-8859-1"), 0, h, 0, 15)
      h(15) = 0
      put16(h, 16, if (pageSize == 65536) 1 else pageSize)
      h(18) = 1; h(19) = 1 // file format write/read versions
      h(20) = 0            // reserved bytes
      h(21) = 64; h(22) = 32; h(23) = 32
      put32(h, 24, 1L)       // change counter
      put32(h, 28, pages.length.toLong)
      put32(h, 44, 4L)       // schema format
      put32(h, 56, textEnc.toLong)
      put32(h, 92, 1L)       // version-valid-for
      put32(h, 96, 3045000L) // library version stamp
      val out = new java.io.FileOutputStream(path)
      try pages.foreach(p => out.write(p))
      finally out.close()
    }
  }
}
