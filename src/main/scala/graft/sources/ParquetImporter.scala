package graft.sources

import graft.model.ParserAnswer
import org.apache.spark.sql.SparkSession

/** Parquet importer — the reference's `ImportParquet` (`main.py:415-425`):
  * native types preserved, single answer named "Parquet file content".
  * Maps directly onto Spark's built-in vectorized parquet scan: column
  * pruning / predicate pushdown / partition pruning all apply to whatever
  * plan the caller builds on `data`.
  */
class ParquetImporter(val spark: SparkSession, val filePath: String)
    extends Importer {
  override def engineName: String = "ImportParquet"

  def work(): Seq[ParserAnswer] = {
    try {
      val df = spark.read.parquet(filePath)
      Seq(
        ParserAnswer(
          data = df,
          filePathRaw = filePath,
          sheetName = "Parquet file content",
          engine = engineName
        )
      )
    } catch { case _: Exception => failedAnswer() }
  }
}

/** JSON importer — the reference's `ImportJSON` (`main.py:428-438`), which
  * delegates to `pd.read_json`: the WHOLE document is one JSON value
  * (records orient `[{...},{...}]` or columns orient `{"col":{"idx":v}}`),
  * not JSON-lines. We sniff the first structural character driver-side:
  *
  *  - `[` → records orient: `spark.read.option("multiLine", true).json`,
  *    Spark's native schema inference (executor-side parse — scales).
  *  - `{` → columns orient: driver-side pivot (outer keys = columns, inner
  *    keys = rows, first-appearance order) re-serialized to JSON-lines and
  *    fed to `spark.read.json` so type inference matches the records path.
  *    Columns-orient documents are driver-sized by construction in pandas
  *    too, so the driver pivot is not a scale regression.
  */
/** JSON-lines importer — `.jsonl`/`.ndjson` (beyond the reference's
  * extension table — THE LLM-corpus interchange format: one JSON object
  * per line). Reads through Spark's NATIVE line-delimited json source, so
  * unlike the whole-document `.json` orients (single-document by
  * construction) the scan is splittable and fully distributed, schema
  * inference and column pruning reach the reader, and a multi-TB corpus
  * file parallelizes across executors with no custom code at all. A file
  * with no parseable objects answers Failed (never throws). */
class JsonLinesImporter(val spark: SparkSession, val filePath: String)
    extends Importer {
  override def engineName: String = "ImportJSONL"

  def work(): Seq[ParserAnswer] = {
    try {
      // `.jsonl.zst` decodes through the graft-zstd-lines DSv2 source
      // (Spark's native json scan can't decode zstd here); the json
      // parse then runs distributed over that Dataset[String] with the
      // same PERMISSIVE corrupt-record semantics as the path road
      val lower = filePath.toLowerCase
      val df =
        if (lower.endsWith(".zst") || lower.endsWith(".zstd"))
          spark.read.json(
            spark.read.format("graft-zstd-lines").load(filePath)
              .select("value")
              .as[String](org.apache.spark.sql.Encoders.STRING))
        else spark.read.json(filePath)
      // PERMISSIVE mode turns a file of entirely-unparseable lines into a
      // lone corrupt-record column, not an empty schema — that is "no
      // parseable objects" too and must answer Failed, not raw garbage.
      val corruptCol =
        spark.conf.get("spark.sql.columnNameOfCorruptRecord", "_corrupt_record")
      if (df.columns.isEmpty || df.columns.sameElements(Array(corruptCol)))
        failedAnswer()
      else Seq(ParserAnswer(
        data = df,
        filePathRaw = filePath,
        sheetName = "JSON lines content",
        engine = engineName))
    } catch { case _: Exception => failedAnswer() }
  }
}

class JsonImporter(val spark: SparkSession, val filePath: String)
    extends Importer {
  override def engineName: String = "ImportJSON"

  def work(): Seq[ParserAnswer] = {
    try {
      val lower = filePath.toLowerCase
      val zst = lower.endsWith(".zst") || lower.endsWith(".zstd")
      val df =
        if (zst) {
          // Spark's multiLine json scan can't decode zstd here (native
          // ZStandardCodec), so BOTH orients parse from ONE capped
          // decoded byte image (FsIO.readAllBytesDecodedCapped — the
          // shared 256 MiB refusal; a decompression bomb must refuse
          // BEFORE any parse, columns orient included, not drive a
          // driver-heap allocation). The json reader explodes a root
          // array into one row per element — the same rows the path
          // scan's multiLine road yields.
          val bytes = FsIO.readAllBytesDecodedCapped(filePath)
            .getOrElse(return failedAnswer())
          var i = 0
          while (i < bytes.length &&
            Character.isWhitespace((bytes(i) & 0xff).toChar)) i += 1
          if (i >= bytes.length) return failedAnswer()
          bytes(i) match {
            case '[' =>
              import spark.implicits._
              spark.read.json(spark.createDataset(Seq(
                new String(bytes, java.nio.charset.StandardCharsets.UTF_8))))
            case '{' => pivotColumnsOrient(
              new com.fasterxml.jackson.databind.ObjectMapper().readTree(bytes))
            case _ => return failedAnswer()
          }
        } else firstStructuralChar(filePath) match {
          case Some('[') =>
            spark.read.option("multiLine", "true").json(filePath)
          case Some('{') => pivotColumnsOrient(
            new com.fasterxml.jackson.databind.ObjectMapper()
              .readTree(FsIO.openDecoded(filePath)))
          case _ => return failedAnswer()
        }
      Seq(
        ParserAnswer(
          data = df,
          filePathRaw = filePath,
          sheetName = "JSON file content",
          engine = engineName
        )
      )
    } catch { case _: Exception => failedAnswer() }
  }

  private def firstStructuralChar(path: String): Option[Char] = {
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(
      graft.sources.FsIO.openDecoded(path),
      java.nio.charset.StandardCharsets.UTF_8))
    try {
      var c = in.read()
      while (c != -1 && Character.isWhitespace(c)) c = in.read()
      if (c == -1) None else Some(c.toChar)
    } finally in.close()
  }

  /** `{"a":{"0":1,"1":2},"b":{"0":"x","1":"y"}}` → rows `(1,"x"),(2,"y")`
    * — pandas columns-orient semantics (`pd.read_json` default for a
    * top-level object whose values are objects). The caller supplies the
    * parsed root so the zst road's capped byte image and the plain road's
    * stream share one pivot. */
  private def pivotColumnsOrient(
      root: com.fasterxml.jackson.databind.JsonNode): org.apache.spark.sql.DataFrame = {
    import com.fasterxml.jackson.databind.ObjectMapper
    import scala.jdk.CollectionConverters._
    val mapper = new ObjectMapper()
    require(root.isObject, "columns-orient JSON must be an object")
    val cols = root.fieldNames().asScala.toSeq
    // row index keys in first-appearance order across columns
    val rowKeys = scala.collection.mutable.LinkedHashSet.empty[String]
    cols.foreach { c =>
      val v = root.get(c)
      require(v.isObject, "columns-orient JSON values must be objects")
      v.fieldNames().asScala.foreach(rowKeys += _)
    }
    val lines = rowKeys.toSeq.map { rk =>
      val row = mapper.createObjectNode()
      cols.foreach { c =>
        val cell = root.get(c).get(rk)
        if (cell != null) row.set[com.fasterxml.jackson.databind.JsonNode](c, cell)
      }
      mapper.writeValueAsString(row)
    }
    import spark.implicits._
    spark.read.json(spark.createDataset(lines))
  }
}

/** Pickle importer — documented gap: Python pickle encodes arbitrary Python
  * object graphs (`main.py:441-451`), not portable to the JVM; always the
  * error answer. */
class PickleImporter(val spark: SparkSession, val filePath: String)
    extends Importer {
  override def engineName: String = "ImportPickle"
  def work(): Seq[ParserAnswer] = failedAnswer()
}
