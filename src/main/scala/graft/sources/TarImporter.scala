package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.model.ParserAnswer
import graft.sources.tar.TarWalk

/** Tar importer for the one-file API — the AnyFile twin of BulkIngest's
  * `.tar`/`.tar.gz`/`.tgz`/`.tar.zst` catalog route (beyond the
  * reference's extension table; the WebDataset shard layout multimodal
  * corpora ship in). One answer, one row per regular member with the
  * catalog columns (name, typeflag, size, payload md5) in positional
  * string columns — member payload decoding and sample pairing are the
  * consumer's job ([[graft.operators.WebDataset.samples]]), exactly as in
  * the distributed road, and the two roads share
  * [[TarWalk.memberCells]] so they are cell-identical by construction.
  * Zero members / a malformed walk → Failed (the error-answer contract).
  *
  * Driver-side by design like [[WarcImporter]]: one shard is one document
  * here; at scale the parallelism is BulkIngest's — many shards
  * file-grain, one BIG plain `.tar` split at member boundaries into
  * ranged tasks ([[TarWalk.memberBatches]]). */
class TarImporter(val spark: SparkSession, val filePath: String)
    extends Importer {
  override def engineName: String = "ImportTar"

  def work(): Seq[ParserAnswer] = {
    try {
      // openDecoded covers every codec form, the .tgz contraction included
      val in = FsIO.openDecoded(filePath)
      val cells =
        try TarWalk.walk(in)(TarWalk.memberCells)
        finally in.close()
      if (cells.isEmpty) return failedAnswer()
      val schema = TextImporter.positionalSchema(4)
      val rows = cells.map(c => org.apache.spark.sql.Row(c: _*))
      Seq(ParserAnswer(
        spark.createDataFrame(rows.asJava, schema), filePath,
        sheetName = "TAR members", engine = engineName,
        knownRowCount = Some(cells.length.toLong)))
    } catch { case _: Exception => failedAnswer() }
  }
}
