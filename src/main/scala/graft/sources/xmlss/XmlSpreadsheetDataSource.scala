package graft.sources.xmlss

import java.util

import graft.sources.TextImporter
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsMetadataColumns, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 reader for MS SpreadsheetML: `spark.read
  * .format("graft-xmlss").option("table", idx).load(path)`.
  *
  * Same division of labor as the `graft-excel` source: driver touches the
  * file only for schema inference; the partition reader re-parses on the
  * executor and emits one table's rows, column-pruned
  * ([[SupportsPushDownRequiredColumns]]).
  *
  * Options: `table` — global table ordinal in document order (default 0).
  */
class XmlSpreadsheetDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-xmlss"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = XmlSpreadsheetDataSource.pathOf(options)
    val idx = options.getInt("table", 0)
    // streaming shape probe — no row materialization on the driver
    val (_, shapes) = XmlSpreadsheetParser.tableShapes(path)
    val width = shapes.lift(idx).map(_.width).getOrElse(0)
    TextImporter.positionalSchema(width)
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val path = XmlSpreadsheetDataSource.pathOf(options)
    new XmlssTable(path, options.getInt("table", 0),
      XmlSpreadsheetDataSource.worksheetMode(path, options), schema,
      Option(options.get("sheetname")))
  }
}

object XmlSpreadsheetDataSource {
  def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-xmlss requires a path"))

  /** `mode` option (`worksheet`/`standalone`) set by XmlImporter's probe;
    * a direct `spark.read.format("graft-xmlss")` without it re-probes. */
  def worksheetMode(path: String, options: CaseInsensitiveStringMap): Boolean =
    Option(options.get("mode")) match {
      case Some(m) => m == "worksheet"
      case None    => XmlSpreadsheetParser.tableShapes(path)._1 == "worksheet"
    }
}

class XmlssTable(
    path: String, tableIdx: Int, worksheetMode: Boolean, schema: StructType,
    sheetNameOpt: Option[String] = None)
    extends Table with SupportsRead with SupportsMetadataColumns {
  override def name(): String = s"graft-xmlss:$path#$tableIdx"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new XmlssScanBuilder(path, tableIdx, worksheetMode, schema, sheetNameOpt)
  // same metadata-column contract as graft-excel: hidden unless selected
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(graft.sources.xlsx.ExcelTable.SheetCol,
      graft.sources.xlsx.ExcelTable.RowIdxCol)
}

class XmlssScanBuilder(
    path: String, tableIdx: Int, worksheetMode: Boolean, fullSchema: StructType,
    sheetNameOpt: Option[String] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      // sheet name only resolves (one driver streaming probe) when the
      // metadata column could be asked for and the caller didn't pass it
      val name = sheetNameOpt.getOrElse {
        if (required.fieldNames.contains(
            graft.sources.xlsx.ExcelTable.SheetColName))
          XmlSpreadsheetParser.tableShapes(path)._2
            .lift(tableIdx).map(_.sheetName).getOrElse("None")
        else "None"
      }
      Array(XmlssPartition(path, tableIdx, worksheetMode, name))
    }
    override def createReaderFactory(): PartitionReaderFactory = {
      // ship the driver's Hadoop conf so executor-side byte access works
      // on hdfs:/s3a: URIs — same discipline as the graft-excel factory
      val props = org.apache.spark.sql.SparkSession.getActiveSession
        .map(graft.sources.FsIO.captureProps).getOrElse(Map.empty[String, String])
      new XmlssReaderFactory(required, props)
    }
  }
}

case class XmlssPartition(
    path: String, tableIdx: Int, worksheetMode: Boolean,
    sheetName: String = "None")
    extends InputPartition

class XmlssReaderFactory(required: StructType, fsProps: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    if (fsProps.nonEmpty) graft.sources.FsIO.install(fsProps)
    new XmlssReader(p.asInstanceOf[XmlssPartition], required)
  }
}

class XmlssReader(p: XmlssPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  // executor-side: STREAM the target table's rows (one at a time)
  private val rows = new XmlssRowIterator(p.path, p.worksheetMode, p.tableIdx)
  private var current: Seq[String] = _
  private var rowIdx: Long = -1L
  private val sheetNameUtf8 = UTF8String.fromString(p.sheetName)

  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); rowIdx += 1; true } else false

  override def get(): InternalRow =
    InternalRow.fromSeq(required.fields.toIndexedSeq.map { f =>
      f.name match {
        case graft.sources.xlsx.ExcelTable.SheetColName  => sheetNameUtf8
        case graft.sources.xlsx.ExcelTable.RowIdxColName => rowIdx
        case n =>
          val i = n.toInt
          val v = if (i < current.length) current(i) else null
          if (v == null) null else UTF8String.fromString(v)
      }
    })

  override def close(): Unit = rows.close()
}
