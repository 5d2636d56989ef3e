package graft.sources

import graft.model.ParserAnswer
import org.apache.spark.sql.SparkSession

/** Per-format parser strategy — the reference's `AbstractImporter` contract
  * (reference `main.py:171-187`): a single `work()` producing one answer per
  * sheet. Shared sniffing helpers (encoding detection, delimiter voting) live
  * in [[Sniffers]] rather than on the trait, since only the text importer
  * uses them (`main.py:189-236`).
  */
trait Importer {
  def spark: SparkSession
  def filePath: String

  /** Parser class name, recorded as `ParserAnswer.engine`
    * (`main.py:253` uses `self.__class__.__name__`). */
  def engineName: String = getClass.getSimpleName.stripSuffix("$")

  /** Parse the file into one answer per sheet. Must not throw: failure paths
    * return a single Failed answer (`main.py:140-144` parity). */
  def work(): Seq[ParserAnswer]

  protected def failedAnswer(): Seq[ParserAnswer] =
    Seq(ParserAnswer.failed(spark, filePath, engineName))
}
