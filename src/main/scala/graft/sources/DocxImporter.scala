package graft.sources

import scala.jdk.CollectionConverters._

import graft.model.ParserAnswer
import graft.sources.docx.DocxParser
import org.apache.spark.sql.{Row, SparkSession}

/** Word-document importer — `.docx` (beyond the reference's extension
  * table, reference `main.py:147-165`, like `.html`: office documents are
  * a staple enterprise-corpus source and the container/markup is public
  * ECMA-376). Frame shapes mirror [[HtmlImporter]]:
  *
  *  - document has `<w:tbl>` tables → one answer per table (`table0`,
  *    `table1`, …), rows null-padded to the widest row, positional string
  *    columns — the SpreadsheetML frame discipline;
  *  - no tables → one answer, one row per non-empty body paragraph in a
  *    single positional column (the text-corpus shape);
  *  - neither, or an unreadable container → single Failed answer (the
  *    `main.py:140-144` never-throw contract).
  *
  * Driver-side by design, like [[PdfImporter]]/[[HtmlImporter]]: one
  * document is one file; at scale parallelism comes from many files, not
  * from inside one. The container read itself is the ranged-zip road
  * ([[graft.sources.zip.RangedZip]]) — only `word/document.xml` is pulled,
  * never the (often image-heavy) rest of the package.
  */
class DocxImporter(val spark: SparkSession, val filePath: String)
    extends Importer {
  override def engineName: String = "ImportDocx"

  def work(): Seq[ParserAnswer] = {
    try {
      DocxParser.parse(filePath) match {
        case None => failedAnswer()
        case Some(doc) if doc.tables.nonEmpty =>
          doc.tables.zipWithIndex.map { case (rows, idx) =>
            val width = rows.map(_.length).max
            val schema = TextImporter.positionalSchema(width)
            val padded =
              rows.map(r => Row.fromSeq(r.padTo(width, null).map(v => v: Any)))
            ParserAnswer(
              spark.createDataFrame(padded.asJava, schema), filePath,
              sheetName = s"table$idx",
              engine = engineName, knownRowCount = Some(rows.length.toLong))
          }
        case Some(doc) if doc.paragraphs.nonEmpty =>
          val schema = TextImporter.positionalSchema(1)
          val rows = doc.paragraphs.map(p => Row(p))
          Seq(ParserAnswer(
            spark.createDataFrame(rows.asJava, schema), filePath,
            sheetName = "document text",
            engine = engineName,
            knownRowCount = Some(doc.paragraphs.length.toLong)))
        case _ => failedAnswer()
      }
    } catch { case _: Exception => failedAnswer() }
  }
}
