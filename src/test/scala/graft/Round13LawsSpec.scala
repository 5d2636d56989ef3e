package graft

import SqliteFixture._

/** Round-13 laws: the five ADVICE findings pinned as tests — SQLite
  * parser quoted-identifier and stale-header robustness, writer page-1
  * guard and spec-exact varint, JSONL all-corrupt answers Failed. */
class Round13LawsSpec extends SparkSpec {

  test("quoted constraint-keyword column names are columns, not constraints") {
    // CREATE TABLE t("check" INT, [primary] TEXT, `unique` INT, v TEXT):
    // per SQL quoting rules every quoted identifier is a column name even
    // when it spells a constraint keyword — dropping one shifts every
    // later column's values left (silently wrong data).
    val b = new Builder()
    b.allocPage()
    val root = b.allocPage()
    b.writeMaster(Seq(("table", "t", root.toLong,
      "CREATE TABLE t(\"check\" INT, [primary] TEXT, `unique` INT, v TEXT)")))
    b.writeTableLeaf(root, Seq(
      b.leafCell(1L, record(Seq(VInt(7L), VText("a"), VInt(70000L),
        VText("x")), b.cs)),
      b.leafCell(2L, record(Seq(VInt(0L), VText("b"), VNull,
        VText("y")), b.cs))))
    val dir = tmpDir("sqlite_quoted")
    val path = dir.resolve("quoted.db").toString
    b.finish(path)

    val a = AnyFile.parse(spark, path).head
    assert(!a.isFailed)
    assert(a.data.columns.toSeq == Seq("check", "primary", "unique", "v"))
    val rows = a.data.collect().map(_.toSeq).sortBy(_.head.toString)
    assert(rows(0) == Seq("0", "b", null, "y"))
    assert(rows(1) == Seq("7", "a", "70000", "x"))
    // bare keywords are still table constraints, not columns
    val b2 = new Builder()
    b2.allocPage()
    val root2 = b2.allocPage()
    b2.writeMaster(Seq(("table", "t2", root2.toLong,
      "CREATE TABLE t2(a INT, b TEXT, PRIMARY KEY (a), UNIQUE (b))")))
    b2.writeTableLeaf(root2, Seq(
      b2.leafCell(1L, record(Seq(VInt(3L), VText("z")), b2.cs))))
    val path2 = dir.resolve("bare.db").toString
    b2.finish(path2)
    val a2 = AnyFile.parse(spark, path2).head
    assert(a2.data.columns.toSeq == Seq("a", "b"))
  }

  test("writer page-1 guard: every schema either builds AND round-trips, or refuses") {
    import graft.sources.sqlite.SqliteWriter
    import graft.sources.sqlite.SqliteParser.{Cell, TextCell}
    // Sweep the master-record size across page 1's cell-room boundary at
    // pageSize=512 (cell area is 512-110 bytes — tighter than the X=477
    // overflow threshold). Pre-fix, sizes in the gap built "successfully"
    // and the db header overwrote the master cell: silent corruption. The
    // law: a build that returns must parse back with the exact schema; a
    // size the writer can't honor must throw, never corrupt.
    var refused = 0
    var built = 0
    (280 to 470 by 6).foreach { pad =>
      val colName = "c" * pad
      val rows: Seq[(Long, Seq[Cell])] = Seq((1L, Seq[Cell](TextCell("v"))))
      try {
        val bytes = SqliteWriter.build("t", Seq(colName), ipk = -1, rows,
          pageSize = 512)
        built += 1
        val dir = tmpDir("sqlite_guard")
        val path = dir.resolve(s"g$pad.db").toString
        java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
        val a = AnyFile.parse(spark, path).head
        assert(!a.isFailed, s"pad=$pad built but failed to parse back")
        assert(a.data.columns.toSeq == Seq(colName),
          s"pad=$pad column name corrupted")
        assert(a.data.collect().map(_.getString(0)).toSeq == Seq("v"))
      } catch {
        case _: IllegalArgumentException => refused += 1
      }
    }
    assert(built > 0, "sweep never exercised the build road")
    assert(refused > 0, "sweep never reached the page-1 refusal road")
  }

  test("writer varint: rowids in [2^56, 2^63) take the 9-byte form and round-trip") {
    import graft.sources.sqlite.SqliteWriter
    import graft.sources.sqlite.SqliteParser.{Cell, NullCell, TextCell}
    val rids = Seq((1L << 56) - 1, 1L << 56, (1L << 56) + 123, Long.MaxValue)
    val rows: Seq[(Long, Seq[Cell])] =
      rids.map(r => (r, Seq[Cell](NullCell, TextCell(s"r$r"))))
    val bytes = SqliteWriter.build("big", Seq("id", "v"), ipk = 0, rows)
    val dir = tmpDir("sqlite_varint")
    val path = dir.resolve("big.db").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
    val a = AnyFile.parse(spark, path).head
    assert(!a.isFailed)
    val got = a.data.collect().map(r => (r.getString(0), r.getString(1)))
      .sortBy(_._1.toLong)
    assert(got.toSeq == rids.map(r => (r.toString, s"r$r")))
    // and the test-side fixture encoder agrees byte-for-byte with the spec
    assert(SqliteFixture.varint(1L << 56).length == 9)
    assert(SqliteFixture.varint((1L << 56) - 1).length == 8)
  }

  test("stale in-header page count (change counter ≠ version-valid-for) still reads") {
    import graft.sources.sqlite.SqliteWriter
    import graft.sources.sqlite.SqliteParser.{Cell, NullCell, TextCell}
    // A db last written by a pre-3.7.0 library can carry a stale size at
    // offset 28; it is only authoritative when u32@24 == u32@92. Patch a
    // multi-page db to the stale shape: size=1 page, counters disagreeing
    // — valid page pointers must still resolve via the file length.
    val rows: Seq[(Long, Seq[Cell])] = (1 to 200).map { i =>
      (i.toLong, Seq[Cell](NullCell, TextCell(s"row-$i-" + "x" * 30)))
    }
    val bytes = SqliteWriter.build("t", Seq("id", "v"), ipk = 0, rows,
      pageSize = 512)
    assert(bytes.length > 512 * 3) // genuinely multi-page
    def put32(o: Int, v: Long): Unit = {
      bytes(o) = ((v >>> 24) & 0xff).toByte
      bytes(o + 1) = ((v >>> 16) & 0xff).toByte
      bytes(o + 2) = ((v >>> 8) & 0xff).toByte
      bytes(o + 3) = (v & 0xff).toByte
    }
    put32(24, 7L) // change counter bumped by the "old library"
    put32(28, 1L) // stale: claims a single page
    put32(92, 1L) // version-valid-for left behind
    val dir = tmpDir("sqlite_stale")
    val path = dir.resolve("stale.db").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
    val a = AnyFile.parse(spark, path).head
    assert(!a.isFailed, "stale header made a readable table answer Failed")
    assert(a.data.count() == 200L)
  }

  test("JSONL with zero parseable objects answers Failed, not corrupt-record rows") {
    val dir = tmpDir("jsonl_corrupt")
    val path = writeFile(dir, "garbage.jsonl",
      "not json at all\n{truncated\n<html>nope</html>\n")
    val a = AnyFile.parse(spark, path)
    assert(a.length == 1 && a.head.isFailed)
    // and a healthy file still answers OK with its real schema
    val ok = writeFile(dir, "ok.jsonl",
      "{\"a\":1,\"b\":\"x\"}\n{\"a\":2,\"b\":\"y\"}\n")
    val a2 = AnyFile.parse(spark, ok).head
    assert(!a2.isFailed && a2.data.columns.toSeq == Seq("a", "b"))
    assert(a2.data.count() == 2L)
  }
}
