package graft.sources.zstd

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 LINE reader for codec-suffixed text Spark's native scans
  * cannot decode in this container — `.zst`/`.zstd` (Hadoop's
  * ZStandardCodec needs native libhadoop; zstd-jni is what
  * `FsIO.openDecoded` routes the suffix through): `spark.read
  * .format("graft-zstd-lines").load(path)` → one `value: STRING` row per
  * `\n`-terminated line.
  *
  * This is the missing road that lets the ONE-FILE AnyFile importers
  * (TextImporter / JsonLinesImporter) parse `.csv.zst`/`.jsonl.zst`
  * corpora with the same plan shape their `.gz` twins get from the Hadoop
  * codec layer. Parity with `spark.read.option("lineSep", "\n").text`:
  * lines split on `\n` ONLY (a CR in CRLF files stays in the line — the
  * reference's `readlines` behavior TextImporter reproduces), a trailing
  * newline yields no phantom empty row, UTF-8 decode.
  *
  * Scale shape: one InputPartition per file — a zstd stream has no random
  * access (no splittable frames without a seekable-format index), exactly
  * the one-task shape gzip already forces on the native road. Many-file
  * corpora parallelize file-grain (BulkIngest), and the decode runs
  * EXECUTOR-side: the driver never touches payload bytes. */
class ZstdLinesDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-zstd-lines"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZstdLinesDataSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-zstd-lines requires a path"))
    new ZstdLinesTable(path)
  }
}

object ZstdLinesDataSource {
  val Schema: StructType =
    StructType(Seq(StructField("value", StringType, nullable = false)))
}

class ZstdLinesTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-zstd-lines:$path"
  override def schema(): StructType = ZstdLinesDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = ZstdLinesDataSource.Schema
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] =
          Array(ZstdLinesPartition(path))
        override def createReaderFactory(): PartitionReaderFactory = {
          // ship the driver's Hadoop conf so executor-side byte access
          // works on hdfs:/s3a: URIs (factories serialize to executors)
          val props = org.apache.spark.sql.SparkSession.getActiveSession
            .map(graft.sources.FsIO.captureProps)
            .getOrElse(Map.empty[String, String])
          new ZstdLinesReaderFactory(props)
        }
      }
    }
}

case class ZstdLinesPartition(path: String) extends InputPartition

class ZstdLinesReaderFactory(fsProps: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    if (fsProps.nonEmpty) graft.sources.FsIO.install(fsProps)
    new ZstdLinesReader(p.asInstanceOf[ZstdLinesPartition].path)
  }
}

class ZstdLinesReader(path: String) extends PartitionReader[InternalRow] {
  // openDecoded routes .zst/.zstd through zstd-jni (and any other codec
  // suffix through the Hadoop layer), so the reader itself is codec-blind
  private val in = new java.io.InputStreamReader(
    graft.sources.FsIO.openDecoded(path), java.nio.charset.StandardCharsets.UTF_8)
  private val buf = new StringBuilder
  private var line: UTF8String = _
  private var eof = false

  override def next(): Boolean = {
    if (eof) return false
    buf.setLength(0)
    var c = in.read()
    // split on '\n' ONLY — '\r' is payload (see scaladoc)
    while (c != -1 && c != '\n') { buf.append(c.toChar); c = in.read() }
    if (c == -1) {
      eof = true
      if (buf.isEmpty) return false // trailing newline: no phantom row
    }
    line = UTF8String.fromString(buf.toString)
    true
  }

  override def get(): InternalRow = InternalRow(line)

  override def close(): Unit = in.close()
}
