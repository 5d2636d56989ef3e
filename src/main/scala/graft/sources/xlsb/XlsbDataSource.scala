package graft.sources.xlsb

import java.util

import graft.sources.TextImporter
import graft.sources.xlsx.{ExcelDataSource, ExcelTable}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 reader for `.xlsb` workbooks: `spark.read
  * .format("graft-xlsb").option("sheet", name).load(path)` — the binary
  * twin of `graft-excel`, closing VERDICT r6's big-binary-workbook gap.
  *
  * Same division of labor as the xlsx source: the driver touches only the
  * zip central directory + `workbook.bin`/rels (sheet list) and a
  * streaming width probe; each executor partition decodes ONE sheet with
  * [[XlsbRowIterator]] (one row in memory at a time, ranged entry reads —
  * no whole-container copy). Column pruning reaches the decode: pruned
  * cells skip SST lookups and string materialization. `_sheet`/`_row_idx`
  * metadata columns let BulkIngest's size-split planner get
  * CellRow-shaped output from the range-split road.
  *
  * Options: `sheet` — sheet name (default: first sheet).
  * Schema: positional all-string (`0..n-1`), reference `dtype=str` parity.
  */
class XlsbDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-xlsb"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = ExcelDataSource.pathOf(options)
    val sheets = XlsbStream.openSheetList(path)
      .getOrElse(throw new IllegalArgumentException(s"not an xlsb: $path"))
    val sheet = ExcelDataSource.resolveSheet(sheets, options)
    val (width, _) = XlsbStream.sheetShape(path, sheet.target)
    TextImporter.positionalSchema(width)
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new XlsbTable(ExcelDataSource.pathOf(options), options, schema)
  }
}

class XlsbTable(
    path: String,
    options: CaseInsensitiveStringMap,
    schema: StructType
) extends Table with SupportsRead with SupportsMetadataColumns {
  override def name(): String = s"graft-xlsb:$path"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new XlsbScanBuilder(path, options, schema)
  // shared metadata-column identities with graft-excel, so the planner's
  // CellRow projection is source-agnostic
  override def metadataColumns(): Array[MetadataColumn] =
    Array(ExcelTable.SheetCol, ExcelTable.RowIdxCol)
}

class XlsbScanBuilder(
    path: String,
    options: CaseInsensitiveStringMap,
    fullSchema: StructType
) extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      val sheets = XlsbStream.openSheetList(path).getOrElse(
        throw new IllegalArgumentException(s"not an xlsb: $path"))
      val sheet = ExcelDataSource.resolveSheet(sheets, options)
      Array(XlsbSheetPartition(path, sheet.target, sheet.name))
    }
    override def createReaderFactory(): PartitionReaderFactory = {
      val props = org.apache.spark.sql.SparkSession.getActiveSession
        .map(graft.sources.FsIO.captureProps).getOrElse(Map.empty[String, String])
      new XlsbReaderFactory(required, props)
    }
  }
}

/** One partition = one sheet (the natural split unit — a row-range
  * sub-split would need random access inside the part's deflate stream). */
case class XlsbSheetPartition(path: String, target: String, sheetName: String)
  extends InputPartition

class XlsbReaderFactory(required: StructType, fsProps: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    if (fsProps.nonEmpty) graft.sources.FsIO.install(fsProps)
    val sp = p.asInstanceOf[XlsbSheetPartition]
    new XlsbSheetReader(sp, required)
  }
}

class XlsbSheetReader(p: XlsbSheetPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val dataCols: Array[Int] =
    required.fields.map(_.name).flatMap(_.toIntOption)
  // SST is the one retained table; the sheet part itself streams
  private val rows = {
    val sst = XlsbStream.loadSst(p.path)
    new XlsbRowIterator(p.path, p.target, sst, Some(dataCols.toSet))
  }
  private var current: IndexedSeq[String] = _
  private var rowIdx: Long = -1L
  private val sheetNameUtf8 = UTF8String.fromString(p.sheetName)

  override def next(): Boolean = {
    if (rows.hasNext) { current = rows.next(); rowIdx += 1; true } else false
  }

  override def get(): InternalRow = {
    InternalRow.fromSeq(required.fields.toIndexedSeq.map { f =>
      f.name match {
        case ExcelTable.SheetColName  => sheetNameUtf8
        case ExcelTable.RowIdxColName => rowIdx
        case n =>
          val i = n.toInt
          val v = if (i < current.length) current(i) else null
          if (v == null) null else UTF8String.fromString(v)
      }
    })
  }

  override def close(): Unit = rows.close()
}
