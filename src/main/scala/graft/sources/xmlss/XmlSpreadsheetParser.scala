package graft.sources.xmlss

import scala.xml.{Elem, Node, XML}

/** Pure MS SpreadsheetML parser — no Spark dependencies, shared between the
  * driver-side [[graft.sources.XmlImporter]] (sheet enumeration, shape
  * probing) and the executor-side DSv2 readers ([[XmlSpreadsheetDataSource]]).
  *
  * Semantics per reference `main.py:268-324` (documented in detail on
  * XmlImporter): namespace-filtered Worksheet/Table/Row/Data walk, rows with
  * zero Data cells skipped, table-without-worksheet fallback named
  * `"Not defined"`, lenient recovery on malformed input.
  */
object XmlSpreadsheetParser {

  val Ns = "urn:schemas-microsoft-com:office:spreadsheet"

  /** One logical table in the document: its sheet name and its rows. */
  final case class TableRef(index: Int, sheetName: String)

  private def inNs(n: Node, label: String): Boolean =
    n.label == label && n.namespace == Ns

  /** Enumerate tables in document order as (global index, sheet name). */
  def tables(root: Elem): Seq[TableRef] = {
    val worksheets = (root \\ "Worksheet").filter(inNs(_, "Worksheet"))
    if (worksheets.nonEmpty) {
      var i = -1
      worksheets.flatMap { ws =>
        val name = ws.attribute(Ns, "Name").map(_.text).getOrElse("None")
        (ws \\ "Table").filter(inNs(_, "Table")).map { _ =>
          i += 1
          TableRef(i, name)
        }
      }
    } else {
      (root \\ "Table").filter(inNs(_, "Table")).zipWithIndex.map {
        case (_, i) => TableRef(i, "Not defined")
      }
    }
  }

  /** Rows of the table at global index `idx` (ragged, no padding). */
  def tableRows(root: Elem, idx: Int): Seq[Seq[String]] = {
    val worksheets = (root \\ "Worksheet").filter(inNs(_, "Worksheet"))
    val tableNodes =
      if (worksheets.nonEmpty)
        worksheets.flatMap(ws => (ws \\ "Table").filter(inNs(_, "Table")))
      else (root \\ "Table").filter(inNs(_, "Table"))
    tableNodes.lift(idx) match {
      case None => Seq.empty
      case Some(table) =>
        (table \\ "Row")
          .filter(inNs(_, "Row"))
          .map { row =>
            (row \\ "Data")
              .filter(inNs(_, "Data"))
              .map(d => if (d.child.isEmpty) null else d.text)
          }
          .filter(_.nonEmpty) // zero-Data rows skipped (main.py:320)
          .map(_.toSeq)
    }
  }

  /** Strict parse, then `recover=True`-style cleanup before giving up. */
  def loadLenient(path: String): Elem = {
    try XML.loadFile(path)
    catch {
      case _: Exception =>
        val raw = new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
          "UTF-8")
        val cleaned = raw
          .replaceAll("&(?!(?:amp|lt|gt|quot|apos|#\\d+|#x[0-9a-fA-F]+);)", "&amp;")
          .replaceAll("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", "")
        XML.loadString(cleaned)
    }
  }
}
