package graft.sources

import graft.model.ParserAnswer
import graft.operators.UnionByArity
import graft.sources.pdf.{PdfParser, PdfTextExtractor}
import org.apache.spark.sql.{Row, SparkSession}

/** PDF table importer — the reference's `ImportPDF` (`main.py:371-412`),
  * which shells out to the tabula JAR via tabula-py (`pages="all"`,
  * `header=None`). No PDF jar exists on the offline classpath, so the
  * extraction itself is the hand-rolled [[graft.sources.pdf.PdfParser]] +
  * [[graft.sources.pdf.PdfTextExtractor]] pair (built from the public ISO
  * 32000 spec — same decision as the BIFF8 `.xls` reader): lenient object
  * scan, FlateDecode, text-operator interpretation, stream-mode row/column
  * clustering. One table per page with any text; pages without text are
  * skipped, matching tabula's "tables found" list shape.
  *
  * Reference dataflow reproduced exactly (`main.py:382-404`):
  *  - `concat = true` (default): tables whose column count equals the
  *    FIRST table's are positionally concatenated into the
  *    `"PDF file content (concated)"` answer; the rest into
  *    `"PDF file content (unsized)"`, emitted only when non-empty. Both
  *    carry the `reset_index` surplus `index` column (the observable
  *    pandas quirk) — [[graft.operators.UnionByArity]] with
  *    `withIndexColumn = true`.
  *  - `concat = false`: one `"PDF file content (by page)"` answer per
  *    table.
  *
  * Cells are all-string positional columns (tabula `header=None` parity).
  * Zero extractable tables → the never-throw Failed answer. Decode is
  * driver-side by design: a PDF's pages aren't independently addressable
  * without parsing the whole object graph (the reference's tabula
  * subprocess is single-file single-threaded too); at scale parallelism
  * comes from many files, not from inside one.
  */
class PdfImporter(
    val spark: SparkSession,
    val filePath: String,
    val concat: Boolean = true
) extends Importer {
  override def engineName: String = "ImportPDF"

  def work(): Seq[ParserAnswer] = {
    try {
      val bytes = graft.sources.FsIO.readAllBytes(filePath)
      // one entry per extracted TABLE (pages can hold several, split at
      // large vertical gaps — tabula's list-of-tables granularity)
      val tables: Seq[Seq[IndexedSeq[String]]] = PdfParser.parse(bytes) match {
        case None => Nil
        case Some(doc) =>
          doc.pages.flatMap { page =>
            val fonts = doc.pageFonts(page)
            doc.pageContent(page).toSeq
              .flatMap(c =>
                PdfTextExtractor.tables(PdfTextExtractor.page(c, fonts)))
              .filter(_.nonEmpty)
          }
      }
      if (tables.isEmpty) return failedAnswer()
      val frames = tables.map(frameOf)
      if (concat) {
        val r = UnionByArity(frames, withIndexColumn = true)
        val valid = ParserAnswer(
          data = r.valid.get, // first table is always in the valid group
          filePathRaw = filePath,
          sheetName = "PDF file content (concated)",
          engine = engineName)
        r.invalid match {
          case Some(inv) =>
            Seq(valid, ParserAnswer(
              data = inv,
              filePathRaw = filePath,
              sheetName = "PDF file content (unsized)",
              engine = engineName))
          case None => Seq(valid)
        }
      } else {
        tables.zip(frames).map { case (rows, df) =>
          ParserAnswer(
            data = df,
            filePathRaw = filePath,
            sheetName = "PDF file content (by page)",
            engine = engineName,
            knownRowCount = Some(rows.length.toLong))
        }
      }
    } catch { case _: Exception => failedAnswer() }
  }

  /** Ragged rows → null-pad to the table's max arity; positional
    * all-string columns (tabula emits `header=None` frames). */
  private def frameOf(rows: Seq[IndexedSeq[String]]): org.apache.spark.sql.DataFrame = {
    val width = rows.map(_.length).max
    val schema = TextImporter.positionalSchema(width)
    val padded = rows.map(r => Row.fromSeq(r.padTo(width, null)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(padded.asJava, schema)
  }
}
