package graft.sources.xlsx

import java.util

import graft.sources.TextImporter
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 reader for `.xlsx` workbooks: `spark.read
  * .format("graft-excel").option("sheet", name).load(path)`.
  *
  * Division of labor (the scale story, SURVEY.md §4):
  *  - DRIVER: open the container once for metadata — sheet list, shared
  *    strings, schema inference (max arity over the chosen sheet).
  *  - EXECUTORS: each [[SheetPartition]] re-opens the file locally and
  *    decodes its sheet's cells there, so cell decoding is off the driver
  *    and sheets of one workbook (or many workbooks via UNION) decode in
  *    parallel.
  *  - Column pruning IS pushed down ([[SupportsPushDownRequiredColumns]]):
  *    a `select("0","3")` decodes only those positional columns' values
  *    into rows (the XML walk still scans the sheet — the format is not
  *    columnar — but row building and memory are pruned).
  *
  * Options: `sheet` — sheet name (default: first sheet).
  * Schema: positional all-string (`0..n-1`), reference `dtype=str` parity.
  */
class ExcelDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-excel"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = ExcelDataSource.pathOf(options)
    // sheet list only — shared strings never load on the driver (cell
    // ARITY doesn't depend on string values, so the width probe passes an
    // empty table; ExcelImporter's executor-side probe does the same)
    val sheets = XlsxParser.openSheetList(path)
      .getOrElse(throw new IllegalArgumentException(s"not an xlsx: $path"))
    val sheet = ExcelDataSource.resolveSheet(sheets, options)
    // streaming width probe — no row materialization on the driver
    val (width, _) = XlsxParser.sheetShape(path, sheet.target, IndexedSeq.empty)
    TextImporter.positionalSchema(width)
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new ExcelTable(ExcelDataSource.pathOf(options), options, schema)
  }
}

object ExcelDataSource {
  def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-excel requires a path"))

  def resolveSheet(
      wb: XlsxParser.Workbook,
      options: CaseInsensitiveStringMap): XlsxParser.SheetRef =
    resolveSheet(wb.sheets, options)

  def resolveSheet(
      sheets: Seq[XlsxParser.SheetRef],
      options: CaseInsensitiveStringMap): XlsxParser.SheetRef = {
    Option(options.get("sheet")) match {
      case None => sheets.headOption.getOrElse(
        throw new IllegalArgumentException("workbook has no sheets"))
      case Some(name) => sheets.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no sheet named '$name'"))
    }
  }
}

class ExcelTable(
    path: String,
    options: CaseInsensitiveStringMap,
    schema: StructType
) extends Table with SupportsRead with SupportsMetadataColumns {
  override def name(): String = s"graft-excel:$path"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ExcelScanBuilder(path, options, schema)
  // hidden unless selected (DSv2 metadata-column contract): the sheet
  // name and the 0-based within-sheet row index — what lets a caller
  // (BulkIngest.parseTreeAuto) get CellRow-shaped output from the
  // range-split executor decode instead of a one-task whole-file parse
  override def metadataColumns(): Array[MetadataColumn] =
    Array(ExcelTable.SheetCol, ExcelTable.RowIdxCol)
}

object ExcelTable {
  val SheetColName = "_sheet"
  val RowIdxColName = "_row_idx"
  object SheetCol extends MetadataColumn {
    override def name(): String = SheetColName
    override def dataType(): DataType = StringType
    override def isNullable: Boolean = false
  }
  object RowIdxCol extends MetadataColumn {
    override def name(): String = RowIdxColName
    override def dataType(): DataType = LongType
    override def isNullable: Boolean = false
  }
}

class ExcelScanBuilder(
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
      // sheet-LIST open only (zip central directory + two tiny metadata
      // entries): the driver must never load a multi-GB workbook's
      // shared-string table — executors re-open the container themselves
      val sheets = XlsxParser.openSheetList(path).getOrElse(
        throw new IllegalArgumentException(s"not an xlsx: $path"))
      val sheet = ExcelDataSource.resolveSheet(sheets, options)
      Array(SheetPartition(path, sheet.target, sheet.name))
    }
    override def createReaderFactory(): PartitionReaderFactory = {
      // ship the driver's Hadoop conf so executor-side byte access works
      // on hdfs:/s3a: URIs (factories serialize driver → executor)
      val props = org.apache.spark.sql.SparkSession.getActiveSession
        .map(graft.sources.FsIO.captureProps).getOrElse(Map.empty[String, String])
      new SheetReaderFactory(required, props)
    }
  }
}

/** One partition = one sheet (the natural split unit of the format; a
  * row-range sub-split would need random access inside the deflate stream).
  */
case class SheetPartition(path: String, target: String, sheetName: String)
  extends InputPartition

class SheetReaderFactory(required: StructType, fsProps: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    if (fsProps.nonEmpty) graft.sources.FsIO.install(fsProps)
    val sp = p.asInstanceOf[SheetPartition]
    new SheetReader(sp, required)
  }
}

class SheetReader(p: SheetPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  // executor-side: open the container locally, STREAM this sheet's rows
  // (one row in memory at a time — a 1M-row sheet never builds a DOM or a
  // row list; shared strings are the only retained table). Localize ONCE
  // per task: local paths pass through, a remote (hdfs:/s3a:) workbook
  // spills to a single task-local temp serving both the shared-string
  // load and the row stream.
  private val localized = graft.sources.FsIO.localize(p.path)
  private val localPath = localized.file.getPath
  // data ordinals = numeric field names; _sheet/_row_idx are the DSv2
  // metadata columns (present in `required` only when explicitly selected)
  private val dataCols: Array[Int] =
    required.fields.map(_.name).flatMap(_.toIntOption)
  // construction past localize() must release the spill on failure —
  // close() never runs for a reader that didn't finish constructing
  private val rows =
    try {
      val wb = XlsxParser.openWorkbook(localPath)
        .getOrElse(throw new IllegalStateException(s"not an xlsx: ${p.path}"))
      // pushed-down pruning reaches the DECODE: cells outside the required
      // ordinals are never materialized (no shared-string lookup, no text)
      new SheetRowIterator(localPath, p.target, wb.shared, Some(dataCols.toSet))
    } catch { case e: Throwable => localized.close(); throw e }
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

  override def close(): Unit = { rows.close(); localized.close() }
}
