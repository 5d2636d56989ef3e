package graft.sources.ods

import javax.xml.stream.XMLStreamConstants._

import scala.collection.mutable.ArrayBuffer

import graft.sources.StaxUtil
import graft.sources.zip.RangedZip

/** Streaming OpenDocument spreadsheet decode — the DSv2 big-workbook road
  * for `.ods`/`.odf`/`.odt` (VERDICT r6 #2's "if cheap" tail). The whole
  * document lives in ONE zip entry (`content.xml`), so the split unit is
  * the `table:table` element: [[OdsStream.tableShapes]] probes every
  * table's (name, width, rows) in one StAX pass, and [[OdsRowIterator]]
  * streams one table's rows holding one row at a time — the entry itself
  * arrives through a bounded ranged-zip inflate stream, never a container
  * copy. Repeat-filler semantics are [[OdsParser]]'s, reproduced
  * streaming:
  *
  *  - `number-columns-repeated` expands fully for real values, capped at
  *    [[OdsStream.MaxFill]] for empty filler; trailing empty cells trim;
  *  - `number-rows-repeated` expands fully for rows with content, capped
  *    for all-empty rows; trailing all-empty rows never emit (buffered
  *    and flushed only when a later contentful row appears);
  *  - only DIRECT `table-row` children count (header-row groups are out
  *    of scope, matching the DOM reader it replaces).
  *
  * Column pruning here nulls out unselected positions at emission: the
  * XML text must be walked regardless (the format stores values as
  * character data), so unlike xlsx/xlsb there is no decode work to skip —
  * the saving is row-build memory only, and the scaladoc says so instead
  * of overclaiming. */
object OdsStream {

  /** Empty-filler repeat cap (ODS pads sheets with ~16k-column/1M-row
    * empty trailers; real repeated data expands fully). */
  val MaxFill = 4096

  final case class OdsShape(index: Int, name: String, width: Int, rows: Long)

  /** Every table's shape in ONE streaming pass (no row materialization).
    * Width/row counts apply the same trim discipline the row iterator
    * emits, so a DSv2 schema probed here matches the decode exactly. */
  def tableShapes(path: String): Seq[OdsShape] = {
    val sc = new OdsScanner(path)
    try {
      val out = ArrayBuffer.empty[OdsShape]
      var idx = 0
      var name = sc.nextTable()
      while (name.isDefined) {
        var width = 0
        var emitted = 0L
        var lastContent = -1L
        var row = sc.nextRow()
        while (row != null) {
          val (cells, rep) = row
          if (cells.nonEmpty) {
            if (cells.length > width) width = cells.length
            lastContent = emitted + rep - 1
          }
          emitted += rep
          row = sc.nextRow()
        }
        out += OdsShape(idx, name.get, width, lastContent + 1)
        idx += 1
        name = sc.nextTable()
      }
      out.toSeq
    } finally sc.close()
  }
}

/** Low-level cursor over `content.xml`: advance table by table, then row
  * by row within the current table. One (row, repeat) pair in memory at a
  * time. */
private[ods] final class OdsScanner(path: String) extends java.io.Closeable {
  import OdsParser.{OfficeNs, TableNs}

  private val (in, closer) =
    RangedZip.entryStreamOrLocalize(path, "content.xml")
      .getOrElse(throw new java.io.FileNotFoundException(s"content.xml in $path"))
  private val r =
    try StaxUtil.reader(in)
    catch { case e: Throwable => closer(); throw e }
  private var closed = false
  // relative depth inside the current table element (0 = at table level)
  private var tableDepth = -1

  /** Advance to the next `table:table`; its name, or None at document
    * end. Callable whether or not the previous table's rows were
    * drained (tables never nest, so a forward scan is safe). */
  def nextTable(): Option[String] = {
    while (r.hasNext) {
      r.next() match {
        case START_ELEMENT
            if r.getLocalName == "table" && r.getNamespaceURI == TableNs =>
          tableDepth = 0
          return Some(
            Option(r.getAttributeValue(TableNs, "name")).getOrElse("None"))
        case _ =>
      }
    }
    None
  }

  /** Next (trimmed cells, repeat) of the current table; null when the
    * table ends. Repeat is already capped for all-empty rows. */
  def nextRow(): (IndexedSeq[String], Int) = {
    if (tableDepth < 0) return null
    while (r.hasNext) {
      r.next() match {
        case START_ELEMENT =>
          tableDepth += 1
          if (tableDepth == 1 && r.getNamespaceURI == TableNs &&
              r.getLocalName == "table-row") {
            val row = parseRow() // consumes through </table-row>
            tableDepth -= 1
            return row
          }
        case END_ELEMENT =>
          tableDepth -= 1
          if (tableDepth < 0) return null // </table>
        case _ =>
      }
    }
    null
  }

  /** Cursor is ON the row START; consume through its END. */
  private def parseRow(): (IndexedSeq[String], Int) = {
    val rawRowRepeat = Option(
      r.getAttributeValue(TableNs, "number-rows-repeated"))
      .map(_.toInt).getOrElse(1)
    val cells = ArrayBuffer.empty[String]
    var depth = 0 // relative to the row element
    while (r.hasNext && depth >= 0) {
      r.next() match {
        case START_ELEMENT =>
          depth += 1
          if (depth == 1 && r.getNamespaceURI == TableNs &&
              r.getLocalName == "table-cell") {
            val (v, rawRepeat) = parseCell() // consumes through </table-cell>
            depth -= 1
            val repeat =
              if (v == null) rawRepeat.min(OdsStream.MaxFill) else rawRepeat
            var i = 0
            while (i < repeat) { cells += v; i += 1 }
          }
        case END_ELEMENT =>
          depth -= 1
        case _ =>
      }
    }
    // trim the trailing-empty filler produced by repeated empty cells
    while (cells.nonEmpty && cells.last == null) cells.remove(cells.length - 1)
    val rowRepeat =
      if (cells.isEmpty) rawRowRepeat.min(OdsStream.MaxFill) else rawRowRepeat
    (cells.toIndexedSeq, rowRepeat)
  }

  /** Cursor is ON the cell START; consume through its END. Returns
    * (value, raw columns-repeated). Value semantics match the DOM
    * reader: strings concatenate each `p` paragraph's text with \n;
    * date/time/boolean read their typed attribute; numerics read
    * `office:value` raw. */
  private def parseCell(): (String, Int) = {
    val rawRepeat = Option(
      r.getAttributeValue(TableNs, "number-columns-repeated"))
      .map(_.toInt).getOrElse(1)
    val vt = Option(r.getAttributeValue(OfficeNs, "value-type"))
    val attrValue = vt match {
      case Some("string") | None => null
      case Some("date") => r.getAttributeValue(OfficeNs, "date-value")
      case Some("time") => r.getAttributeValue(OfficeNs, "time-value")
      case Some("boolean") =>
        Option(r.getAttributeValue(OfficeNs, "boolean-value"))
          .map(v => if (v == "true") "True" else "False").orNull
      case _ => r.getAttributeValue(OfficeNs, "value")
    }
    val stringTyped = vt.forall(_ == "string")
    val paragraphs = ArrayBuffer.empty[StringBuilder]
    var pDepth = 0 // >0 ⇒ inside a p subtree
    var depth = 0
    while (r.hasNext && depth >= 0) {
      r.next() match {
        case START_ELEMENT =>
          depth += 1
          if (stringTyped) {
            if (r.getLocalName == "p" && pDepth == 0)
              paragraphs += new StringBuilder
            if (r.getLocalName == "p" || pDepth > 0) pDepth += 1
          }
        case CHARACTERS | CDATA =>
          if (stringTyped && pDepth > 0) paragraphs.last.append(r.getText)
        case END_ELEMENT =>
          depth -= 1
          if (stringTyped && pDepth > 0) pDepth -= 1
        case _ =>
      }
    }
    val v =
      if (!stringTyped) attrValue
      else {
        val text = paragraphs.map(_.toString).mkString("\n")
        if (text.isEmpty) null else text
      }
    (v, rawRepeat)
  }

  override def close(): Unit = if (!closed) {
    closed = true
    try r.close() catch { case _: Exception => () }
    closer()
  }
}

/** One-row-at-a-time decode of ODS table `tableIdx`. `needed` = DSv2
  * pruned column ordinals: unselected positions emit as nulls (row width
  * preserved). Trailing all-empty rows are buffered and dropped at table
  * end, matching the materialized reader. */
final class OdsRowIterator(
    path: String,
    tableIdx: Int,
    needed: Option[Set[Int]] = None
) extends Iterator[IndexedSeq[String]] with java.io.Closeable {

  private val sc = new OdsScanner(path)
  locally {
    var i = 0
    var n =
      try sc.nextTable()
      catch { case e: Throwable => sc.close(); throw e }
    while (n.isDefined && i < tableIdx) {
      i += 1
      n = try sc.nextTable()
          catch { case e: Throwable => sc.close(); throw e }
    }
    if (n.isEmpty) {
      sc.close()
      throw new java.io.FileNotFoundException(s"table $tableIdx in $path")
    }
  }

  private var pendingEmpties = 0L
  private var flushEmpties = 0L
  private var queued: IndexedSeq[String] = _
  private var queuedCount = 0L
  private var done = false

  override def hasNext: Boolean =
    flushEmpties > 0 || queuedCount > 0 || (!done && fetch())

  override def next(): IndexedSeq[String] = {
    if (!hasNext) throw new NoSuchElementException("table exhausted")
    if (flushEmpties > 0) { flushEmpties -= 1; IndexedSeq.empty }
    else { queuedCount -= 1; queued }
  }

  private def fetch(): Boolean = {
    var row = sc.nextRow()
    while (row != null) {
      val (cells, rep) = row
      if (cells.isEmpty) pendingEmpties += rep
      else {
        flushEmpties = pendingEmpties
        pendingEmpties = 0
        queued = needed match {
          case None => cells
          case Some(keep) =>
            cells.zipWithIndex.map { case (v, i) =>
              if (keep.contains(i)) v else null
            }
        }
        queuedCount = rep
        return true
      }
      row = sc.nextRow()
    }
    done = true
    close()
    false
  }

  override def close(): Unit = sc.close()
}
