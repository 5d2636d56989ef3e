package graft.sources

import scala.jdk.CollectionConverters._

import graft.model.ParserAnswer
import graft.sources.pptx.PptxParser
import org.apache.spark.sql.{Row, SparkSession}

/** Presentation importer — `.pptx` (beyond the reference's extension
  * table, completing the Office family next to [[DocxImporter]] and the
  * xlsx road). Per slide, mirroring the docx/html frame discipline:
  *
  *  - DrawingML tables → one answer per table (`slide1_table0`, …),
  *    ragged rows null-padded, positional string columns;
  *  - a slide with no tables but text → one answer (`slide1`), one row
  *    per paragraph in a single positional column;
  *  - empty slides contribute nothing; a package with no extractable
  *    content at all → single Failed answer (never throws).
  *
  * Driver-side like [[DocxImporter]]; only `ppt/slides/slideN.xml` parts
  * are pulled from the container.
  */
class PptxImporter(val spark: SparkSession, val filePath: String)
    extends Importer {
  override def engineName: String = "ImportPptx"

  def work(): Seq[ParserAnswer] = {
    try {
      PptxParser.parse(filePath) match {
        case None => failedAnswer()
        case Some(slides) =>
          val answers = slides.flatMap { sl =>
            val tableAnswers = sl.tables.zipWithIndex.map { case (rows, idx) =>
              val width = rows.map(_.length).max
              val schema = TextImporter.positionalSchema(width)
              val padded = rows.map(r =>
                Row.fromSeq(r.padTo(width, null).map(v => v: Any)))
              ParserAnswer(
                spark.createDataFrame(padded.asJava, schema), filePath,
                sheetName = s"${sl.name}_table$idx",
                engine = engineName, knownRowCount = Some(rows.length.toLong))
            }
            if (tableAnswers.nonEmpty) tableAnswers
            else if (sl.paragraphs.nonEmpty) {
              val schema = TextImporter.positionalSchema(1)
              val rows = sl.paragraphs.map(p => Row(p))
              Seq(ParserAnswer(
                spark.createDataFrame(rows.asJava, schema), filePath,
                sheetName = sl.name, engine = engineName,
                knownRowCount = Some(sl.paragraphs.length.toLong)))
            } else Seq.empty
          }
          if (answers.isEmpty) failedAnswer() else answers
      }
    } catch { case _: Exception => failedAnswer() }
  }
}
