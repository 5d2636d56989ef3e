package graft.sources.ods

import java.util.zip.ZipFile

import scala.xml.{Elem, Node, XML}

/** OpenDocument spreadsheet decode (`.ods`/`.odf`/`.odt` — the formats the
  * reference reads through pandas' odf engine, `main.py:245`): zip →
  * `content.xml` → `table:table` elements, with the ODS repeat-filler
  * discipline (empty-cell/row repeats capped, trailing filler trimmed —
  * real repeated data expands fully). Pure path→cells function, usable on
  * the driver (ExcelImporter) or inside executor tasks (BulkIngest). */
object OdsParser {

  val TableNs = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
  val OfficeNs = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"

  /** All sheets as (name, ragged rows); None when the file has no content
    * document or no tables (→ Failed answer upstream). */
  def sheets(path: String): Option[Seq[(String, Seq[IndexedSeq[String]])]] =
    graft.sources.FsIO.withLocal(path) { f =>
      val zip = new ZipFile(f)
      try {
        val content = loadZipXml(zip, "content.xml").getOrElse(return None)
        val tables = (content \\ "table").filter(_.namespace == TableNs)
        if (tables.isEmpty) return None
        Some(tables.map { t =>
          val name = t.attribute(TableNs, "name").map(_.text).getOrElse("None")
          (name, parseTable(t))
        })
      } finally zip.close()
    }

  /** Repeat cap applies ONLY to empty filler (ODS pads sheets with
    * number-columns/rows-repeated ~16k/1M trailers); non-empty repeats are
    * real data and expand fully — capping them would silently drop
    * values. */
  def parseTable(table: Node): Seq[IndexedSeq[String]] = {
    val MaxFill = 4096
    val out = scala.collection.mutable.ArrayBuffer.empty[IndexedSeq[String]]
    (table \ "table-row").filter(_.namespace == TableNs).foreach { row =>
      val cells = scala.collection.mutable.ArrayBuffer.empty[String]
      (row \ "table-cell").filter(_.namespace == TableNs).foreach { cell =>
        val rawRepeat = cell.attribute(TableNs, "number-columns-repeated")
          .map(_.text.toInt).getOrElse(1)
        val v = cellValue(cell)
        val repeat = if (v == null) rawRepeat.min(MaxFill) else rawRepeat
        (0 until repeat).foreach(_ => cells += v)
      }
      // trim the trailing-empty filler produced by repeated empty cells
      while (cells.nonEmpty && cells.last == null) cells.remove(cells.length - 1)
      val rawRowRepeat = row.attribute(TableNs, "number-rows-repeated")
        .map(_.text.toInt).getOrElse(1)
      val rowRepeat =
        if (cells.forall(_ == null)) rawRowRepeat.min(MaxFill) else rawRowRepeat
      (0 until rowRepeat).foreach(_ => out += cells.toIndexedSeq)
    }
    // drop trailing all-empty rows (ODS files end with huge repeated fillers)
    while (out.nonEmpty && out.last.forall(_ == null)) out.remove(out.length - 1)
    out.toSeq
  }

  def cellValue(cell: Node): String = {
    val vt = cell.attribute(OfficeNs, "value-type").map(_.text)
    vt match {
      case Some("string") | None =>
        val text = (cell \\ "p").map(_.text).mkString("\n")
        if (text.isEmpty) null else text
      case Some("date") =>
        cell.attribute(OfficeNs, "date-value").map(_.text).orNull
      case Some("time") =>
        cell.attribute(OfficeNs, "time-value").map(_.text).orNull
      case Some("boolean") =>
        cell.attribute(OfficeNs, "boolean-value")
          .map(v => if (v.text == "true") "True" else "False").orNull
      case _ => cell.attribute(OfficeNs, "value").map(_.text).orNull
    }
  }

  def loadZipXml(zip: ZipFile, entry: String): Option[Elem] =
    Option(zip.getEntry(entry)).map { e =>
      val in = zip.getInputStream(e)
      try XML.load(in)
      finally in.close()
    }
}
