package graft.sources

import scala.jdk.CollectionConverters._

import graft.model.ParserAnswer
import graft.sources.sqlite.SqliteParser
import graft.sources.sqlite.SqliteParser.{Cell, Header, NullCell, TableMeta}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** SQLite database importer — `.sqlite`/`.sqlite3`/`.db` (beyond the
  * reference's extension table, like `.html`/`.docx`: single-file
  * databases are a common exchange format and the file layout is a public
  * spec). One [[ParserAnswer]] per user table (the multi-sheet Excel
  * shape), sheetName = table name, REAL column names from the schema,
  * every value rendered to its text form ([[SqliteParser.render]]) so the
  * frame discipline stays all-string like the other importers. A column
  * declared `INTEGER PRIMARY KEY` is the rowid alias: its stored NULL is
  * replaced by the cell's rowid, as SQLite itself answers.
  *
  * Unreadable tables (WITHOUT ROWID, virtual, corrupt trees) yield a
  * per-table Failed answer rather than wrong data; a file that is not a
  * SQLite database at all yields the single Failed answer
  * (`main.py:140-144` contract).
  *
  * Scale road, xlsx-style: the driver reads ONLY the header and the
  * schema/interior pages (a few ranged reads) to enumerate each table's
  * leaf pages; for databases past a small threshold the leaf decode runs
  * as a Spark job, a task per leaf-page batch, each page fetched with its
  * own ranged read — the database file is never copied, localized, or
  * held whole in any heap. Small files decode on the driver to skip the
  * job overhead.
  */
class SqliteImporter(val spark: SparkSession, val filePath: String)
    extends Importer {
  override def engineName: String = "ImportSqlite"

  /** Databases at most this big decode on the driver. */
  private val DriverDecodeBytes = 4L << 20

  def work(): Seq[ParserAnswer] = {
    try {
      // small files: ONE whole read, then decode from the byte image —
      // per-page FS opens on a tiny file cost more than the decode. Big
      // files stay on the ranged road (and their leaf decode runs as a
      // Spark job below).
      val fileLen = try FsIO.len(filePath) catch { case _: Exception => -1L }
      val lower = filePath.toLowerCase
      val driverSrc: SqliteParser.Source =
        if (lower.endsWith(".zst") || lower.endsWith(".zstd")) {
          // .sqlite.zst: the page tree needs random access a zstd stream
          // can't give — materialize the decoded image through the
          // SHARED cap reader (BulkIngest's sqlite zst road, same
          // refusal law, same constant)
          val bytes = FsIO.readAllBytesDecodedCapped(filePath)
            .getOrElse(return failedAnswer())
          SqliteParser.BytesSource(bytes)
        } else if (fileLen >= 512 && fileLen <= DriverDecodeBytes)
          SqliteParser.BytesSource(FsIO.readAllBytes(filePath))
        else SqliteParser.PathSource(filePath)
      SqliteParser.header(driverSrc) match {
        case None => failedAnswer()
        case Some(h) =>
          val tables = SqliteParser.tables(driverSrc, h)
          if (tables.isEmpty) failedAnswer()
          else tables.map(t => answerForTable(driverSrc, h, t))
      }
    } catch { case _: Exception => failedAnswer() }
  }

  private def failedTable(name: String): ParserAnswer =
    ParserAnswer(spark.emptyDataFrame, filePath, sheetName = name,
      engine = engineName, knownRowCount = Some(0L))

  private def answerForTable(
      driverSrc: SqliteParser.Source, h: Header, t: TableMeta): ParserAnswer = {
    if (t.virtual || t.withoutRowid || t.rootPage < 1 || t.cols.isEmpty)
      return failedTable(t.name)
    try {
      val leaves = SqliteParser.leafPages(driverSrc, h, t.rootPage)
        .getOrElse(return failedTable(t.name))
      val schema = StructType(dedupNames(t.cols).map(StructField(_, StringType, nullable = true)))
      val ncols = t.cols.length
      val ipk = t.ipk
      val path = filePath

      // a val closure over locals only: the executor road ships it, and it
      // must not capture `this` (the importer holds the SparkSession)
      val toRow: (Long, IndexedSeq[Cell]) => Row = (rowid, cells) => {
        val vals = new Array[Any](ncols)
        var i = 0
        while (i < ncols) {
          val c: Cell = if (i < cells.length) cells(i) else NullCell
          vals(i) =
            if (i == ipk && c == NullCell) rowid.toString
            else SqliteParser.render(c)
          i += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      }

      if (leaves.isEmpty) {
        ParserAnswer(spark.createDataFrame(Seq.empty[Row].asJava, schema),
          filePath, sheetName = t.name, engine = engineName,
          knownRowCount = Some(0L))
      } else if (driverSrc.isInstanceOf[SqliteParser.BytesSource] ||
          h.nPages * h.pageSize.toLong <= DriverDecodeBytes) {
        // BytesSource stays on the in-image road regardless of size: a
        // decoded-from-zstd image has NO path the executor road could
        // ranged-read (the file on disk is compressed bytes) — and the
        // image is ≤ the 256 MiB decode cap by construction
        val rows = leaves.flatMap(pg =>
          SqliteParser.leafRows(driverSrc, h, pg)
            .map { case (rid, cs) => toRow(rid, cs) })
        ParserAnswer(spark.createDataFrame(rows.asJava, schema), filePath,
          sheetName = t.name, engine = engineName,
          knownRowCount = Some(rows.length.toLong))
      } else {
        val fsProps = FsIO.captureProps(spark)
        val parts = math.min(leaves.length, 64)
        val rdd = spark.sparkContext
          .parallelize(leaves, parts)
          .mapPartitions { it =>
            FsIO.install(fsProps) // executor-side hdfs:/s3a: access
            it.flatMap(pg => SqliteParser.leafRows(path, h, pg)
              .map { case (rid, cs) => toRow(rid, cs) })
          }
        ParserAnswer(spark.createDataFrame(rdd, schema), filePath,
          sheetName = t.name, engine = engineName, knownRowCount = None)
      }
    } catch { case _: Exception => failedTable(t.name) }
  }

  /** Schema column names, made non-empty and unique (Spark frames reject
    * duplicate names): empty → positional, later duplicates suffixed. */
  private def dedupNames(cols: IndexedSeq[String]): IndexedSeq[String] = {
    val seen = scala.collection.mutable.HashSet.empty[String]
    cols.zipWithIndex.map { case (c0, i) =>
      val c = if (c0.isEmpty) s"c$i" else c0
      if (seen.add(c.toLowerCase)) c
      else {
        var k = s"${c}_$i"
        while (!seen.add(k.toLowerCase)) k = k + "_"
        k
      }
    }
  }
}
