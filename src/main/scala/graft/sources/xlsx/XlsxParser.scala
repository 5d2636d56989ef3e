package graft.sources.xlsx

import java.util.zip.ZipFile

import scala.xml.{Elem, Node, XML}

/** Pure OOXML (`.xlsx`) workbook parser — no Spark dependencies, so the
  * same code runs on the DRIVER (sheet enumeration, schema inference in
  * [[graft.sources.ExcelImporter]]) and on EXECUTORS (row decoding inside
  * the DSv2 [[ExcelDataSource]] partitions).
  *
  * Parses the three container parts pandas' openpyxl engine reads
  * (reference `main.py:249-259` semantics): `xl/workbook.xml` for sheet
  * order, the workbook rels for sheet targets, `xl/sharedStrings.xml`, and
  * per-sheet `sheetData`. Cell semantics (gap cells → null, raw stored
  * numerics, `True`/`False` booleans, multi-run shared strings) are
  * documented on [[graft.sources.ExcelImporter]].
  */
object XlsxParser {

  private val RelsNs =
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

  final case class Workbook(
      sheets: Seq[SheetRef],
      shared: IndexedSeq[String]
  )
  final case class SheetRef(name: String, target: String)

  def openWorkbook(path: String): Option[Workbook] = {
    val zip = new ZipFile(path)
    try {
      loadZipXml(zip, "xl/workbook.xml").map { workbook =>
        val relTargets: Map[String, String] =
          loadZipXml(zip, "xl/_rels/workbook.xml.rels") match {
            case Some(rels) =>
              (rels \\ "Relationship").map { r =>
                val id = r.attribute("Id").map(_.text).getOrElse("")
                val tgt = r.attribute("Target").map(_.text).getOrElse("")
                id -> (if (tgt.startsWith("/")) tgt.drop(1) else "xl/" + tgt)
              }.toMap
            case None => Map.empty
          }
        val sheets = (workbook \\ "sheet").zipWithIndex.map { case (s, i) =>
          val name = s.attribute("name").map(_.text).getOrElse("None")
          val rid = s.attribute(RelsNs, "id").map(_.text).getOrElse("")
          SheetRef(name,
            relTargets.getOrElse(rid, s"xl/worksheets/sheet${i + 1}.xml"))
        }
        val shared = loadZipXml(zip, "xl/sharedStrings.xml") match {
          case Some(sst) =>
            (sst \ "si").map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq
          case None => IndexedSeq.empty
        }
        Workbook(sheets, shared)
      }
    } finally zip.close()
  }

  /** Decode one sheet into ragged rows (null = gap cell). Gap row numbers
    * (no `<row>` element) appear as empty rows, bounded by the max present
    * row — openpyxl `max_row` semantics. */
  def sheetRows(
      path: String,
      target: String,
      shared: IndexedSeq[String]
  ): Seq[IndexedSeq[String]] = {
    val zip = new ZipFile(path)
    try {
      loadZipXml(zip, target) match {
        case None => Seq.empty
        case Some(sheet) =>
          val rowNodes = sheet \\ "row"
          if (rowNodes.isEmpty) return Seq.empty
          val byNumber =
            scala.collection.mutable.LinkedHashMap.empty[Int, IndexedSeq[String]]
          var autoRow = 0
          rowNodes.foreach { rn =>
            val rowNum = rn.attribute("r").map(_.text.toInt).getOrElse(autoRow + 1)
            autoRow = rowNum
            val cells = scala.collection.mutable.ArrayBuffer.empty[String]
            var autoCol = -1
            (rn \ "c").foreach { c =>
              val colIdx = c.attribute("r").map(_.text).flatMap(colOf)
                .getOrElse(autoCol + 1)
              autoCol = colIdx
              while (cells.length < colIdx) cells += null
              cells += cellValue(c, shared)
            }
            byNumber(rowNum) = cells.toIndexedSeq
          }
          val maxRow = byNumber.keys.max
          (1 to maxRow).map(r => byNumber.getOrElse(r, IndexedSeq.empty))
      }
    } finally zip.close()
  }

  /** `A1` → column 0, `C5` → 2. */
  def colOf(ref: String): Option[Int] = {
    val letters = ref.takeWhile(_.isLetter).toUpperCase
    if (letters.isEmpty) None
    else Some(letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1)
  }

  private def cellValue(c: Node, shared: IndexedSeq[String]): String = {
    val t = c.attribute("t").map(_.text).getOrElse("n")
    t match {
      case "s" =>
        (c \ "v").headOption.map(_.text.trim.toInt).flatMap(shared.lift).orNull
      case "inlineStr" =>
        (c \ "is").headOption.map(is => (is \\ "t").map(_.text).mkString).orNull
      case "str" => (c \ "v").headOption.map(_.text).orNull
      case "b" =>
        (c \ "v").headOption
          .map(v => if (v.text.trim == "1") "True" else "False").orNull
      case _ => (c \ "v").headOption.map(_.text).orNull // numeric/error: raw
    }
  }

  def loadZipXml(zip: ZipFile, entry: String): Option[Elem] =
    Option(zip.getEntry(entry)).map { e =>
      val in = zip.getInputStream(e)
      try XML.load(in)
      finally in.close()
    }
}
