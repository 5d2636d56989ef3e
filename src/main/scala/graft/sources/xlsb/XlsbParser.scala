package graft.sources.xlsb

import java.util.zip.ZipFile

import scala.collection.mutable

/** Minimal binary-OOXML (`.xlsb`) workbook parser, from the public
  * [MS-XLSB] record layouts — the format pandas reads via pyxlsb
  * (reference `main.py:245-247`). Same container as `.xlsx` (a zip with
  * workbook rels), but the parts are binary record streams:
  * variable-length record type (1-2 bytes, 7 bits each) + varint payload
  * size, then the payload.
  *
  * Coverage for `dtype=str` parity, mirroring the BIFF8 reader: sheet list
  * (BrtBundleSh + rels), shared strings (BrtSSTItem), and the cell records
  * BrtCellRk/Real/Bool/St/Isst/Blank + cached formula results
  * (BrtFmlaNum/String/Bool/Error), positioned by BrtRowHdr + per-cell
  * column. Value rendering is identical to [[graft.sources.xls.XlsParser]]:
  * integral doubles without `.0`, `True`/`False`, error cells → null.
  *
  * Driver-side decode like `.xls`: sheets cap at 1,048,576×16,384 and real
  * .xlsb files are bounded workbook documents, not data-lake inputs; the
  * scale path for big tabular data is the columnar formats.
  */
object XlsbParser {

  final case class XlsbSheet(name: String, rows: Seq[IndexedSeq[String]])

  // record ids ([MS-XLSB] 2.1.2)
  private val BrtRowHdr = 0
  private val BrtCellRk = 2
  private val BrtCellError = 3
  private val BrtCellBool = 4
  private val BrtCellReal = 5
  private val BrtCellSt = 6
  private val BrtCellIsst = 7
  private val BrtFmlaString = 8
  private val BrtFmlaNum = 9
  private val BrtFmlaBool = 10
  private val BrtFmlaError = 11
  private val BrtSSTItem = 19
  private val BrtBundleSh = 156

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Int = u16(b, o) | (u16(b, o + 2) << 16)
  private def f64(b: Array[Byte], o: Int): Double = {
    var bits = 0L
    var i = 7
    while (i >= 0) { bits = (bits << 8) | (b(o + i) & 0xffL); i -= 1 }
    java.lang.Double.longBitsToDouble(bits)
  }

  /** Iterate the (type, payload) records of a binary part. */
  private def records(bytes: Array[Byte]): Iterator[(Int, Array[Byte], Int)] =
    new Iterator[(Int, Array[Byte], Int)] {
      private var pos = 0
      override def hasNext: Boolean = pos < bytes.length
      override def next(): (Int, Array[Byte], Int) = {
        // type: 7 bits per byte, high bit of the FIRST byte = 2-byte type
        var t = bytes(pos) & 0xff
        pos += 1
        if ((t & 0x80) != 0) {
          t = (t & 0x7f) | ((bytes(pos) & 0x7f) << 7)
          pos += 1
        }
        // size: up to 4 varint bytes
        var size = 0
        var shift = 0
        var more = true
        while (more) {
          val b = bytes(pos) & 0xff
          pos += 1
          size |= (b & 0x7f) << shift
          shift += 7
          more = (b & 0x80) != 0 && shift < 28
        }
        val off = pos
        pos += size
        (t, bytes, off)
      }
    }

  private def readEntry(zip: ZipFile, name: String): Option[Array[Byte]] =
    Option(zip.getEntry(name)).map { e =>
      val in = zip.getInputStream(e)
      try in.readAllBytes()
      finally in.close()
    }

  /** XLWideString at `o`: (string, bytes consumed). */
  private def wideString(b: Array[Byte], o: Int): (String, Int) = {
    val cch = u32(b, o)
    if (cch == -1) (null, 4) // XLNullableWideString null marker
    else (new String(b, o + 4, cch * 2, "UTF-16LE"), 4 + cch * 2)
  }

  def parse(path: String): Option[Seq[XlsbSheet]] =
    try graft.sources.FsIO.withLocal(path)(f => parseLocal(new ZipFile(f)))
    catch { case _: Exception => None }

  private def parseLocal(zipIn: ZipFile): Option[Seq[XlsbSheet]] = {
    val zip = zipIn
    try {
      val wbBytes = readEntry(zip, "xl/workbook.bin").getOrElse(return None)
      // sheet list: BrtBundleSh = hsState u32, iTabID u32, relId, name
      val bundles = records(wbBytes).collect {
        case (BrtBundleSh, b, o) =>
          val (relId, n) = wideString(b, o + 8)
          val (name, _) = wideString(b, o + 8 + n)
          (relId, if (name == null) "None" else name)
      }.toSeq
      if (bundles.isEmpty) return None

      // rels XML maps relId → part path (same shape as xlsx)
      val relTargets: Map[String, String] =
        readEntry(zip, "xl/_rels/workbook.bin.rels") match {
          case None => Map.empty
          case Some(rels) =>
            val root = scala.xml.XML.loadString(new String(rels, "UTF-8"))
            (root \\ "Relationship").map { r =>
              val id = r.attribute("Id").map(_.text).getOrElse("")
              val tgt = r.attribute("Target").map(_.text).getOrElse("")
              id -> (if (tgt.startsWith("/")) tgt.drop(1) else "xl/" + tgt)
            }.toMap
        }

      // shared strings: BrtSSTItem = flags u8, XLWideString (extras bounded
      // by the record payload, so they need no explicit skip)
      val sst: IndexedSeq[String] =
        readEntry(zip, "xl/sharedStrings.bin") match {
          case None => IndexedSeq.empty
          case Some(bytes) =>
            records(bytes).collect {
              case (BrtSSTItem, b, o) => wideString(b, o + 1)._1
            }.toIndexedSeq
        }

      val sheets = bundles.zipWithIndex.map { case ((relId, name), i) =>
        val target = relTargets.getOrElse(relId,
          s"xl/worksheets/sheet${i + 1}.bin")
        val rows = readEntry(zip, target) match {
          case None => Seq.empty[IndexedSeq[String]]
          case Some(bytes) => sheetRows(bytes, sst)
        }
        XlsbSheet(name, rows)
      }
      Some(sheets)
    } catch { case _: Exception => None }
    finally zip.close()
  }

  private def renderNum(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  private def decodeRk(rk: Int): String = {
    val x100 = (rk & 1) != 0
    val isInt = (rk & 2) != 0
    val v =
      if (isInt) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    renderNum(if (x100) v / 100.0 else v)
  }

  /** Cell records carry (col u32, style+flags u32) then the value; the row
    * comes from the preceding BrtRowHdr (rw u32 first). */
  private def sheetRows(
      bytes: Array[Byte], sst: IndexedSeq[String]
  ): Seq[IndexedSeq[String]] = {
    val cells = mutable.Map.empty[(Int, Int), String]
    var row = 0
    records(bytes).foreach { case (t, b, o) =>
      def col = u32(b, o)
      t match {
        case BrtRowHdr => row = u32(b, o)
        case BrtCellRk => cells((row, col)) = decodeRk(u32(b, o + 8))
        case BrtCellReal | BrtFmlaNum =>
          cells((row, col)) = renderNum(f64(b, o + 8))
        case BrtCellBool | BrtFmlaBool =>
          cells((row, col)) = if ((b(o + 8) & 0xff) != 0) "True" else "False"
        case BrtCellSt | BrtFmlaString =>
          cells((row, col)) = wideString(b, o + 8)._1
        case BrtCellIsst =>
          cells((row, col)) = sst.lift(u32(b, o + 8)).orNull
        case BrtCellError | BrtFmlaError =>
          cells((row, col)) = null // error cells → NaN under dtype=str
        case _ =>
      }
    }
    if (cells.isEmpty) Seq.empty
    else {
      val byRow = cells.groupBy(_._1._1)
      val maxRow = byRow.keysIterator.max
      (0 to maxRow).map { r =>
        byRow.get(r) match {
          case None => IndexedSeq.empty[String]
          case Some(rowCells) =>
            val w = rowCells.keysIterator.map(_._2).max + 1
            val arr = Array.fill[String](w)(null)
            rowCells.foreach { case ((_, c), v) => arr(c) = v }
            arr.toIndexedSeq
        }
      }
    }
  }
}
