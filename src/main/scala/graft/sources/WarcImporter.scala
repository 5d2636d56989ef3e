package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.model.ParserAnswer
import graft.sources.warc.WarcReader

/** WARC importer for the one-file API — the AnyFile twin of BulkIngest's
  * `.warc`/`.warc.gz` catalog route (beyond the reference's extension
  * table; ISO 28500, CommonCrawl's shipping format). One answer, one row
  * per record with the catalog columns (target URI, record type, block
  * length) in positional string columns — payload decoding is the
  * consumer's job, exactly as in the distributed road, and the two roads
  * are cell-for-cell parity-tested. Zero framed records → Failed (the
  * error-answer contract).
  *
  * Driver-side by design like [[PdfImporter]]: one archive is one
  * document here; at scale the parallelism is BulkIngest's — many
  * archives file-grain, one BIG `.warc.gz` split at gzip-member
  * boundaries into ranged tasks. */
class WarcImporter(val spark: SparkSession, val filePath: String)
    extends Importer {
  override def engineName: String = "ImportWARC"

  def work(): Seq[ParserAnswer] = {
    try {
      // decoded read handles any codec suffix (.warc.gz, .warc.bz2);
      // gunzipIfNeeded stays as the net for gzip bytes behind a plain name
      val recs = WarcReader.records(
        WarcReader.gunzipIfNeeded(FsIO.readAllBytesDecoded(filePath)))
      if (recs.isEmpty) return failedAnswer()
      val schema = TextImporter.positionalSchema(3)
      val rows = recs.map { r =>
        org.apache.spark.sql.Row(
          r.header("warc-target-uri").getOrElse(""),
          r.header("warc-type").getOrElse(""),
          r.payload.length.toString)
      }
      Seq(ParserAnswer(
        spark.createDataFrame(rows.asJava, schema), filePath,
        sheetName = "WARC records", engine = engineName,
        knownRowCount = Some(recs.length.toLong)))
    } catch { case _: Exception => failedAnswer() }
  }
}
