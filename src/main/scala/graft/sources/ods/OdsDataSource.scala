package graft.sources.ods

import java.util

import graft.sources.TextImporter
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 reader for OpenDocument spreadsheets: `spark.read
  * .format("graft-ods").option("table", idx).load(path)` — completing the
  * big-workbook DSv2 road across the Excel flavors (xlsx/xlsb/xmlss/ods).
  *
  * Division of labor mirrors `graft-xmlss` (the other one-big-XML
  * format): the driver runs only the streaming shape probe; each
  * partition streams ONE `table:table`'s rows executor-side through
  * [[OdsRowIterator]] (ranged-zip entry stream — no container copy).
  * Pruning nulls unselected positions at emission; the XML text must be
  * walked regardless, so there is no decode work to skip (documented on
  * [[OdsStream]], not overclaimed).
  *
  * Options: `table` — table ordinal in document order (default 0);
  * `sheetname` — metadata-column value when the caller already probed it.
  */
class OdsDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-ods"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = OdsDataSource.pathOf(options)
    val idx = options.getInt("table", 0)
    val width = OdsStream.tableShapes(path).lift(idx).map(_.width).getOrElse(0)
    TextImporter.positionalSchema(width)
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new OdsTable(OdsDataSource.pathOf(options), options.getInt("table", 0),
      schema, Option(options.get("sheetname")))
  }
}

object OdsDataSource {
  def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-ods requires a path"))
}

class OdsTable(
    path: String, tableIdx: Int, schema: StructType,
    sheetNameOpt: Option[String])
    extends Table with SupportsRead with SupportsMetadataColumns {
  override def name(): String = s"graft-ods:$path#$tableIdx"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new OdsScanBuilder(path, tableIdx, schema, sheetNameOpt)
  // shared metadata-column identities across the workbook sources
  override def metadataColumns(): Array[MetadataColumn] =
    Array(graft.sources.xlsx.ExcelTable.SheetCol,
      graft.sources.xlsx.ExcelTable.RowIdxCol)
}

class OdsScanBuilder(
    path: String, tableIdx: Int, fullSchema: StructType,
    sheetNameOpt: Option[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      // sheet name resolves (one driver streaming probe) only when the
      // metadata column could be asked for and the caller didn't pass it
      val name = sheetNameOpt.getOrElse {
        if (required.fieldNames.contains(
            graft.sources.xlsx.ExcelTable.SheetColName))
          OdsStream.tableShapes(path)
            .lift(tableIdx).map(_.name).getOrElse("None")
        else "None"
      }
      Array(OdsPartition(path, tableIdx, name))
    }
    override def createReaderFactory(): PartitionReaderFactory = {
      val props = org.apache.spark.sql.SparkSession.getActiveSession
        .map(graft.sources.FsIO.captureProps).getOrElse(Map.empty[String, String])
      new OdsReaderFactory(required, props)
    }
  }
}

case class OdsPartition(path: String, tableIdx: Int, sheetName: String)
  extends InputPartition

class OdsReaderFactory(required: StructType, fsProps: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    if (fsProps.nonEmpty) graft.sources.FsIO.install(fsProps)
    new OdsReader(p.asInstanceOf[OdsPartition], required)
  }
}

class OdsReader(p: OdsPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val dataCols: Set[Int] =
    required.fields.map(_.name).flatMap(_.toIntOption).toSet
  private val rows = new OdsRowIterator(p.path, p.tableIdx, Some(dataCols))
  private var current: IndexedSeq[String] = _
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
