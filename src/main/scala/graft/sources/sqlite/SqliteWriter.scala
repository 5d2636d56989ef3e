package graft.sources.sqlite

import scala.collection.mutable

import graft.sources.sqlite.SqliteParser.{BlobCell, Cell, IntCell, NullCell, RealCell, TextCell}

/** Minimal single-table SQLite database WRITER — the export/sink
  * complement of [[SqliteParser]], from the same public spec: a bounded
  * table (dimension exports, per-shard corpus slices) becomes one
  * `.sqlite` file any stock client opens. Layout produced:
  *
  *   page 1              header + sqlite_master leaf
  *   pages 2..L+1        table leaf pages (cells packed in rowid order)
  *   page  L+2           one interior root when L > 1
  *   remaining pages     overflow chains, spec split rule (X = U−35,
  *                       M = ((U−12)·32)/255 − 23, K-then-M)
  *
  * Bounded by design: one interior level ⇒ up to ~(U/5)·rows-per-leaf
  * rows (hundreds of thousands at 4 KiB pages) — more than any honest
  * driver-side export, and the writer REFUSES (IllegalArgumentException)
  * rather than silently corrupting past the cap. Values reuse the
  * reader's [[SqliteParser.Cell]] ADT; ints take minimal serials
  * (0/1 literals, then 1/2/3/4/6/8-byte big-endian), text is utf-8.
  * An `ipk` column is declared INTEGER PRIMARY KEY and stored NULL —
  * the rowid IS the value, exactly the alias contract the reader
  * implements. Used by q182 to pin writer+reader end-to-end against the
  * field oracle, and law-tested against the importer in
  * SqliteImporterSpec.
  */
object SqliteWriter {

  /** Build a complete database: one table, `rows` = (rowid, cells) in
    * ascending rowid order. `ipk` = index of the INTEGER PRIMARY KEY
    * column (its stored cell is forced NULL), or -1. */
  def build(
      table: String,
      cols: Seq[String],
      ipk: Int,
      rows: Seq[(Long, Seq[Cell])],
      pageSize: Int = 4096): Array[Byte] = {
    require(pageSize >= 512 && (pageSize & (pageSize - 1)) == 0, "bad page size")
    val u = pageSize // reserved = 0
    val x = u - 35
    val m = ((u - 12) * 32) / 255 - 23

    // ---- record encoding (reader's serial-type table, inverted)
    def record(cells: Seq[Cell]): Array[Byte] = {
      val enc: Seq[(Long, Array[Byte])] = cells.map {
        case NullCell => (0L, Array.emptyByteArray)
        case IntCell(0L) => (8L, Array.emptyByteArray)
        case IntCell(1L) => (9L, Array.emptyByteArray)
        case IntCell(v) =>
          val bits = 65 - java.lang.Long.numberOfLeadingZeros(if (v < 0) ~v else v)
          val len = if (bits <= 8) 1 else if (bits <= 16) 2 else if (bits <= 24) 3
            else if (bits <= 32) 4 else if (bits <= 48) 6 else 8
          val serial = len match {
            case 1 => 1L; case 2 => 2L; case 3 => 3L; case 4 => 4L
            case 6 => 5L; case _ => 6L
          }
          val b = new Array[Byte](len)
          var i = 0
          while (i < len) { b(len - 1 - i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
          (serial, b)
        case RealCell(d) =>
          val bits = java.lang.Double.doubleToLongBits(d)
          val b = new Array[Byte](8)
          var i = 0
          while (i < 8) { b(7 - i) = ((bits >>> (8 * i)) & 0xff).toByte; i += 1 }
          (7L, b)
        case TextCell(s) =>
          val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          (13L + 2 * b.length, b)
        case BlobCell(b) => (12L + 2 * b.length, b)
      }
      val serialBytes = enc.map(e => varint(e._1))
      var hdrLen = 1 + serialBytes.map(_.length).sum
      if (hdrLen > 127) hdrLen += varint(hdrLen.toLong).length - 1
      // Exact-size array + arraycopy. The previous ArrayBuffer[Byte]
      // `++=` appends boxed every byte of every payload — on q182's
      // ~100 KB bodies that was the writer's hottest loop by far
      // (optimization guide §1.2 step 2: per-task work).
      val hdrVar = varint(hdrLen.toLong)
      val out = new Array[Byte](
        hdrVar.length + serialBytes.iterator.map(_.length).sum +
          enc.iterator.map(_._2.length).sum)
      var off = 0
      System.arraycopy(hdrVar, 0, out, off, hdrVar.length); off += hdrVar.length
      serialBytes.foreach { b =>
        System.arraycopy(b, 0, out, off, b.length); off += b.length
      }
      enc.foreach { e =>
        System.arraycopy(e._2, 0, out, off, e._2.length); off += e._2.length
      }
      out
    }

    // ---- plan cells: local sizes decide leaf packing BEFORE overflow
    //      page numbers exist; pointer bytes are patched in afterwards
    final case class PlannedCell(
        rowid: Long, rec: Array[Byte], local: Int, cellSize: Int)
    def plan(rowid: Long, rec: Array[Byte]): PlannedCell = {
      val head = varint(rec.length.toLong).length + varint(rowid).length
      if (rec.length <= x) PlannedCell(rowid, rec, rec.length, head + rec.length)
      else {
        val k = m + ((rec.length - m) % (u - 4))
        val local = if (k <= x) k else m
        PlannedCell(rowid, rec, local, head + local + 4)
      }
    }

    def packLeaves(cells: Seq[PlannedCell]): Seq[Seq[PlannedCell]] = {
      val leaves = mutable.ArrayBuffer.empty[Seq[PlannedCell]]
      var cur = mutable.ArrayBuffer.empty[PlannedCell]
      var used = 8 // leaf header
      cells.foreach { c =>
        val need = c.cellSize + 2 // + pointer slot
        require(8 + need <= u, s"one cell (${c.cellSize} B local) exceeds a page")
        if (used + need > u) {
          leaves += cur.toSeq; cur = mutable.ArrayBuffer.empty; used = 8
        }
        cur += c; used += need
      }
      if (cur.nonEmpty) leaves += cur.toSeq
      leaves.toSeq
    }

    val ipkForced = rows.map { case (rid, cs) =>
      val adjusted = cs.zipWithIndex.map { case (c, i) =>
        if (i == ipk) NullCell else c
      }
      rid -> record(adjusted)
    }
    val planned = ipkForced.map { case (rid, rec) => plan(rid, rec) }
    val leaves = packLeaves(planned)
    val nLeaves = math.max(leaves.length, 1)
    val interior = nLeaves > 1
    require(!interior || 12 + nLeaves * (2 + 4 + 9) <= u,
      s"$nLeaves leaves exceed one interior page — table too big for this writer")

    // page numbering
    val firstLeaf = 2
    val rootPage = if (interior) firstLeaf + nLeaves else firstLeaf
    var nextOverflow = (if (interior) rootPage + 1 else firstLeaf + nLeaves)

    // ---- materialize pages
    val pages = mutable.LinkedHashMap.empty[Int, Array[Byte]] // page -> bytes
    def page(n: Int): Array[Byte] =
      pages.getOrElseUpdate(n, new Array[Byte](pageSize))
    def put16(p: Array[Byte], o: Int, v: Int): Unit = {
      p(o) = ((v >>> 8) & 0xff).toByte; p(o + 1) = (v & 0xff).toByte
    }
    def put32(p: Array[Byte], o: Int, v: Long): Unit = {
      p(o) = ((v >>> 24) & 0xff).toByte; p(o + 1) = ((v >>> 16) & 0xff).toByte
      p(o + 2) = ((v >>> 8) & 0xff).toByte; p(o + 3) = (v & 0xff).toByte
    }

    def cellBytes(c: PlannedCell): Array[Byte] = {
      val head = varint(c.rec.length.toLong) ++ varint(c.rowid)
      if (c.local == c.rec.length) head ++ c.rec
      else {
        // spill across a fresh overflow chain
        var rest = c.rec.length - c.local
        var off = c.local
        val chain = mutable.ArrayBuffer.empty[Int]
        while (rest > 0) {
          val pg = nextOverflow; nextOverflow += 1
          chain += pg
          val take = math.min(u - 4, rest)
          System.arraycopy(c.rec, off, page(pg), 4, take)
          off += take; rest -= take
        }
        var i = 0
        while (i < chain.length - 1) {
          put32(page(chain(i)), 0, chain(i + 1).toLong); i += 1
        }
        val ptr = new Array[Byte](4)
        put32(ptr, 0, chain.head.toLong)
        head ++ c.rec.slice(0, c.local) ++ ptr
      }
    }

    def writeLeaf(pageNo: Int, cells: Seq[PlannedCell], headerAt: Int): Unit = {
      val p = page(pageNo)
      p(headerAt) = 0x0d
      put16(p, headerAt + 1, 0)
      put16(p, headerAt + 3, cells.length)
      p(headerAt + 7) = 0
      var contentEnd = pageSize
      cells.zipWithIndex.foreach { case (c, i) =>
        val b = cellBytes(c)
        contentEnd -= b.length
        System.arraycopy(b, 0, p, contentEnd, b.length)
        put16(p, headerAt + 8 + 2 * i, contentEnd)
      }
      // cell content must never reach down into the page/db headers or
      // the pointer array — belt-and-braces behind the packing math
      assert(contentEnd >= headerAt + 8 + 2 * cells.length,
        s"leaf $pageNo cell content ($contentEnd) collides with headers")
      put16(p, headerAt + 5, if (contentEnd == 65536) 0 else contentEnd)
    }

    leaves.zipWithIndex.foreach { case (cells, i) =>
      writeLeaf(firstLeaf + i, cells, headerAt = 0)
    }
    if (leaves.isEmpty) writeLeaf(firstLeaf, Seq.empty, headerAt = 0)
    if (interior) {
      val p = page(rootPage)
      p(0) = 0x05
      put16(p, 1, 0)
      put16(p, 3, nLeaves - 1)
      p(7) = 0
      put32(p, 8, (firstLeaf + nLeaves - 1).toLong) // rightmost = last leaf
      var contentEnd = pageSize
      (0 until nLeaves - 1).foreach { i =>
        val maxRowid = leaves(i).last.rowid
        val cell = {
          val ptr = new Array[Byte](4)
          put32(ptr, 0, (firstLeaf + i).toLong)
          ptr ++ varint(maxRowid)
        }
        contentEnd -= cell.length
        System.arraycopy(cell, 0, p, contentEnd, cell.length)
        put16(p, 12 + 2 * i, contentEnd)
      }
      put16(p, 5, contentEnd)
    }

    // ---- sqlite_master on page 1
    val colDefs = cols.zipWithIndex.map { case (c, i) =>
      val quoted = "\"" + c.replace("\"", "\"\"") + "\""
      if (i == ipk) s"$quoted INTEGER PRIMARY KEY" else s"$quoted TEXT"
    }
    val sql = s"CREATE TABLE ${"\"" + table.replace("\"", "\"\"") + "\""}" +
      s"(${colDefs.mkString(", ")})"
    val masterRec = record(Seq(
      TextCell("table"), TextCell(table), TextCell(table),
      IntCell(rootPage.toLong), TextCell(sql)))
    val masterPlanned = plan(1L, masterRec)
    require(masterPlanned.local == masterRec.length,
      "schema SQL too large for one page") // keep master overflow-free
    // Page 1 has only pageSize-110 bytes of cell room (100-byte db header
    // + 8-byte leaf page header + one 2-byte pointer) — strictly tighter
    // than the overflow threshold X = U-35 checked above. A schema SQL in
    // the gap would pass the overflow check and then be overwritten by
    // the headers: refuse instead of corrupting.
    require(masterPlanned.cellSize + 2 <= pageSize - 100 - 8,
      "schema SQL too large for page 1's cell area")
    writeLeaf(1, Seq(masterPlanned), headerAt = 100)

    // ---- header + assembly
    val nPages = pages.keys.max
    val h = page(1)
    System.arraycopy("SQLite format 3".getBytes("ISO-8859-1"), 0, h, 0, 15)
    h(15) = 0
    put16(h, 16, if (pageSize == 65536) 1 else pageSize)
    h(18) = 1; h(19) = 1
    h(20) = 0
    h(21) = 64; h(22) = 32; h(23) = 32
    put32(h, 24, 1L)
    put32(h, 28, nPages.toLong)
    put32(h, 44, 4L)
    put32(h, 56, 1L) // utf-8
    put32(h, 92, 1L)
    put32(h, 96, 3045000L)

    val out = new Array[Byte](nPages * pageSize)
    (1 to nPages).foreach { n =>
      pages.get(n).foreach(p =>
        System.arraycopy(p, 0, out, (n - 1) * pageSize, pageSize))
    }
    out
  }

  private def varint(v0: Long): Array[Byte] = {
    // 9-byte form whenever the value needs more than 8 seven-bit groups —
    // any v with bits above position 55 (negatives included): the 9th
    // byte carries all 8 low bits, matching SqliteParser.varint.
    if ((v0 >>> 56) != 0) {
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
}
