package graft.sources

import graft.model.ParserAnswer
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import scala.xml.{Elem, Node, XML}

/** MS SpreadsheetML XML importer — the reference's `ImportXML`
  * (reference `main.py:268-324`).
  *
  * Semantics reproduced:
  *  - namespace `urn:schemas-microsoft-com:office:spreadsheet`; `Worksheet`
  *    nodes anywhere in the tree (`.//` search, `main.py:280`), each
  *    worksheet's `Table` descendants one frame each (`main.py:284-291`).
  *  - fallback when no `Worksheet` exists: `Table` nodes under the root,
  *    sheet name `"Not defined"` (`main.py:293-304`).
  *  - neither → single Failed answer (`main.py:305-307`).
  *  - a `Row` contributes a frame row only if it has ≥1 `Data` descendant —
  *    zero-`Data` rows are SKIPPED, not emitted empty (`main.py:316-323`).
  *  - ragged rows null-padded to the widest row (pandas
  *    `from_dict(orient='index', dtype=str)` NaN-padding, `main.py:324`);
  *    columns positional `0..n-1`, all strings; empty `Data` elements
  *    (`point.text is None`) become null.
  *  - lenient parsing (`recover=True` parity, `main.py:276`): strict parse
  *    first, then a recovery pass (escape bare `&`, drop control chars)
  *    before giving up.
  *
  * Scale note: SpreadsheetML is a driver-side format here (like the
  * reference); the produced plan is a `LocalRelation`, which Catalyst
  * folds/prunes freely. Genuinely huge XML would need a DSv2 reader —
  * out of parity scope since the reference is also whole-file in memory.
  */
class XmlImporter(val spark: SparkSession, val filePath: String)
    extends Importer {
  override def engineName: String = "ImportXML"

  private val Ns = "urn:schemas-microsoft-com:office:spreadsheet"

  def work(): Seq[ParserAnswer] = {
    val root: Elem =
      try loadLenient(filePath)
      catch { case _: Exception => return failedAnswer() }

    def inNs(n: Node, label: String): Boolean =
      n.label == label && n.namespace == Ns

    val worksheets = (root \\ "Worksheet").filter(inNs(_, "Worksheet"))
    if (worksheets.nonEmpty) {
      worksheets.flatMap { ws =>
        val name = ws.attribute(Ns, "Name").map(_.text).getOrElse("None")
        (ws \\ "Table").filter(inNs(_, "Table")).map { table =>
          answerFor(table, name)
        }
      }
    } else {
      val tables = (root \\ "Table").filter(inNs(_, "Table"))
      if (tables.nonEmpty) tables.map(answerFor(_, "Not defined"))
      else failedAnswer()
    }
  }

  private def answerFor(table: Node, sheetName: String): ParserAnswer = {
    val df = parseTableSection(table)
    ParserAnswer(
      data = df._1,
      filePathRaw = filePath,
      sheetName = sheetName,
      engine = engineName,
      knownRowCount = Some(df._2)
    )
  }

  /** `parse_table_section` parity (`main.py:309-324`): collect the text of
    * every `Data` descendant per `Row`, skip zero-`Data` rows, null-pad to
    * max arity. Returns (frame, rowCount). */
  private def parseTableSection(table: Node): (DataFrame, Long) = {
    val rows: Seq[Seq[String]] = (table \\ "Row")
      .filter(n => n.label == "Row" && n.namespace == Ns)
      .map { row =>
        (row \\ "Data")
          .filter(n => n.label == "Data" && n.namespace == Ns)
          .map(d => if (d.child.isEmpty) null else d.text)
      }
      .filter(_.nonEmpty) // zero-Data rows skipped, main.py:320
      .map(_.toSeq)

    if (rows.isEmpty) (spark.emptyDataFrame, 0L)
    else {
      val width = rows.map(_.length).max
      val schema = TextImporter.positionalSchema(width)
      val padded = rows.map(r => Row.fromSeq(r.padTo(width, null)))
      import scala.jdk.CollectionConverters._
      (spark.createDataFrame(padded.asJava, schema), rows.length.toLong)
    }
  }

  /** Strict parse, then `recover=True`-style cleanup on failure. */
  private def loadLenient(path: String): Elem = {
    try XML.loadFile(path)
    catch {
      case _: Exception =>
        val raw = new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
          "UTF-8")
        val cleaned = raw
          // escape bare ampersands not already part of an entity
          .replaceAll("&(?!(?:amp|lt|gt|quot|apos|#\\d+|#x[0-9a-fA-F]+);)", "&amp;")
          // drop XML-invalid control characters
          .replaceAll("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", "")
        XML.loadString(cleaned)
    }
  }
}
