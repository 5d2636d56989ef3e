package graft.sources.pdf

import scala.collection.mutable

import PdfParser._

/** Content-stream text extraction + table reconstruction — the analysis
  * half of the tabula-equivalent (reference `main.py:381`): positioned
  * text chunks are clustered into rows by baseline y and into columns by
  * x, tabula's lattice-free "stream" mode in miniature.
  *
  * Interpreter scope (documented subset, mirroring simple machine-written
  * table PDFs): text operators `BT ET Td TD TL T* Tm Tj TJ ' "` with full
  * text-matrix tracking; byte strings decoded as Latin-1 (PDF
  * StandardEncoding and WinAnsiEncoding agree with Latin-1 over printable
  * ASCII — composite/CID fonts are out of scope). Graphics operators are
  * ignored except `cm` is tracked for translation so tables drawn under a
  * translated CTM still land on the right grid.
  */
object PdfTextExtractor {

  /** One coalesced text run: device-space baseline origin + decoded text. */
  final case class Chunk(x: Double, y: Double, text: String)

  private val RowTolerance = 2.0 // pts: chunks within this Δy share a row
  private val ColTolerance = 4.0 // pts: x-starts within this Δx share a column
  private val MergeTolerance = 3.0 // pts: pen-continuation gap that still
  // glues successive shows into ONE chunk (intra-cell TJ kerning / split
  // Tj runs), so a cell never fractures into spurious columns

  private final class MutChunk(val x: Double, val y: Double,
      val text: StringBuilder, var endX: Double)

  // ---------------------------------------------------------- interpreter

  /** Run the text operators of one decoded content stream. */
  def chunks(content: Array[Byte]): Seq[Chunk] = {
    val out = mutable.ArrayBuffer.empty[MutChunk]
    var last: MutChunk = null
    val lex = new Lexer(content)
    // text state: text matrix, line matrix (each a,b,c,d,e,f), leading
    var tm = Matrix.identity
    var tlm = Matrix.identity
    var leading = 0.0
    var fontSize = 1.0
    // CTM translation (cm): enough for translated tables; rotation/scale
    // of whole pages is out of scope
    var ctm = Matrix.identity
    val ctmStack = mutable.Stack.empty[Matrix]
    // operand stack for the postfix operator syntax
    val operands = mutable.ArrayBuffer.empty[PObj]

    def num(i: Int): Double = operands.lift(operands.length - i) match {
      case Some(PNum(v)) => v
      case _             => 0.0
    }

    def emit(bytes: Array[Byte]): Unit = {
      val (dx, dy) = ctm.apply(tm.e, tm.f)
      val text = decodeText(bytes)
      // advance x by a rough width so consecutive shows don't stack;
      // 0.5 em/char approximates Helvetica's average advance
      tm = Matrix.translation(text.length * 0.5 * fontSize, 0).multiply(tm)
      val (ex, _) = ctm.apply(tm.e, tm.f)
      if (text.nonEmpty) {
        val continues = last != null &&
          math.abs(last.y - dy) <= 0.5 &&
          dx >= last.endX - 0.1 && dx - last.endX <= MergeTolerance
        if (continues) { last.text.append(text); last.endX = ex }
        else { last = new MutChunk(dx, dy, new StringBuilder(text), ex); out += last }
      }
    }

    def nextLine(tx: Double, ty: Double): Unit = {
      tlm = Matrix.translation(tx, ty).multiply(tlm)
      tm = tlm
    }

    var tok = lex.next()
    while (tok.isDefined) {
      tok.get match {
        case TKeyword(op) =>
          op match {
            case "BT" => tm = Matrix.identity; tlm = Matrix.identity
            case "ET" => ()
            case "Td" => nextLine(num(2), num(1))
            case "TD" => leading = -num(1); nextLine(num(2), num(1))
            case "TL" => leading = num(1)
            case "T*" => nextLine(0, -leading)
            case "Tm" =>
              tm = Matrix(num(6), num(5), num(4), num(3), num(2), num(1))
              tlm = tm
            case "Tf" => fontSize = num(1)
            case "Tj" =>
              operands.lastOption.collect { case PString(b) => emit(b) }
            case "'" =>
              nextLine(0, -leading)
              operands.lastOption.collect { case PString(b) => emit(b) }
            case "\"" => // aw ac string "
              nextLine(0, -leading)
              operands.lastOption.collect { case PString(b) => emit(b) }
            case "TJ" =>
              operands.lastOption.collect { case PArr(items) =>
                items.foreach {
                  case PString(b) => emit(b)
                  case PNum(adj) =>
                    // thousandths of em; large negative gaps are
                    // inter-cell spacing → move the pen
                    tm = Matrix
                      .translation(-adj / 1000.0 * fontSize, 0)
                      .multiply(tm)
                  case _ => ()
                }
              }
            case "cm" =>
              ctm = Matrix(num(6), num(5), num(4), num(3), num(2), num(1))
                .multiply(ctm)
            case "q" => ctmStack.push(ctm)
            case "Q" => if (ctmStack.nonEmpty) ctm = ctmStack.pop()
            case _   => () // path/color/XObject operators — ignored
          }
          operands.clear()
        case other =>
          operands += lex.parseValue(other)
      }
      tok = lex.next()
    }
    out.map(m => Chunk(m.x, m.y, m.text.toString)).toSeq
  }

  /** a b c d e f — PDF's row-vector convention: [x y 1] × M. */
  final case class Matrix(a: Double, b: Double, c: Double, d: Double,
      e: Double, f: Double) {
    def multiply(m: Matrix): Matrix = Matrix(
      a * m.a + b * m.c,
      a * m.b + b * m.d,
      c * m.a + d * m.c,
      c * m.b + d * m.d,
      e * m.a + f * m.c + m.e,
      e * m.b + f * m.d + m.f)
    def apply(x: Double, y: Double): (Double, Double) =
      (a * x + c * y + e, b * x + d * y + f)
  }
  object Matrix {
    val identity: Matrix = Matrix(1, 0, 0, 1, 0, 0)
    def translation(tx: Double, ty: Double): Matrix = Matrix(1, 0, 0, 1, tx, ty)
  }

  /** Latin-1 byte decode with the PDF escapes already resolved by the
    * lexer; control bytes (other than tab) are dropped. */
  private def decodeText(bytes: Array[Byte]): String = {
    val s = new String(bytes, "ISO-8859-1")
    s.filter(ch => ch == '\t' || ch >= ' ').trim
  }

  // ------------------------------------------------------ table clustering

  /** Positioned chunks → the page's TABLES, in top-to-bottom order —
    * tabula's `pages="all"` returns a LIST of tables per page, and the
    * reference's union-by-arity dataflow depends on that granularity
    * (`main.py:382-404`). Row bands are split into separate tables at
    * vertical gaps larger than `max(3 × median row gap, 2 row heights)`:
    * a machine-written table has a steady line pitch, so a break several
    * times that pitch is inter-table whitespace, not a tall row. Pages
    * with a single uniform grid always yield exactly one table. */
  def tables(cs: Seq[Chunk]): Seq[Seq[IndexedSeq[String]]] = {
    if (cs.isEmpty) return Nil
    val rows = clusterRows(cs)
    if (rows.length <= 2) return Seq(tableOf(rows.map(_.toSeq)))
    val ys = rows.map(_.map(_.y).max)
    val gaps = ys.sliding(2).map { case Seq(a, b) => a - b }.toIndexedSeq
    val sortedGaps = gaps.sorted
    val medianGap = sortedGaps(sortedGaps.length / 2)
    val threshold = math.max(3 * medianGap, 2 * RowTolerance * 4)
    val groups = mutable.ArrayBuffer(mutable.ArrayBuffer(rows.head))
    rows.tail.zip(gaps).foreach { case (row, gap) =>
      if (gap > threshold) groups += mutable.ArrayBuffer(row)
      else groups.last += row
    }
    groups.map(g => tableOf(g.map(_.toSeq).toSeq)).toSeq
  }

  /** Single-table view (chunk grid already known to be one table). */
  def table(cs: Seq[Chunk]): Seq[IndexedSeq[String]] =
    if (cs.isEmpty) Nil else tableOf(clusterRows(cs).map(_.toSeq))

  /** Row clustering: sweep y descending, new row when gap > tolerance. */
  private def clusterRows(cs: Seq[Chunk]): Seq[mutable.ArrayBuffer[Chunk]] = {
    val byY = cs.sortBy(-_.y)
    val rows = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Chunk]]
    var rowY = Double.NaN
    byY.foreach { ch =>
      if (rows.isEmpty || (rowY - ch.y) > RowTolerance) {
        rows += mutable.ArrayBuffer(ch)
        rowY = ch.y
      } else rows.last += ch
    }
    rows.toSeq
  }

  /** One row-group → grid: columns by clustered x-start. Cells sharing a
    * (row, column) are joined with a space in x order; absent cells are
    * null — the all-string ragged grid the importer null-pads, same
    * contract as the Excel/XML readers. */
  private def tableOf(rows: Seq[Seq[Chunk]]): Seq[IndexedSeq[String]] = {
    val cs = rows.flatten
    if (cs.isEmpty) return Nil

    // column clustering: sweep all x-starts ascending, same sweep rule
    val xs = cs.map(_.x).sorted
    val colStarts = mutable.ArrayBuffer.empty[Double]
    xs.foreach { x =>
      if (colStarts.isEmpty || (x - colStarts.last) > ColTolerance)
        colStarts += x
    }
    def colOf(x: Double): Int = {
      // nearest cluster start (colStarts is sorted)
      var lo = 0
      var hi = colStarts.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) / 2
        if (colStarts(mid) <= x + ColTolerance) lo = mid else hi = mid - 1
      }
      lo
    }

    rows.map { rcs =>
      val cells = Array.fill[String](colStarts.length)(null)
      rcs.sortBy(_.x).foreach { ch =>
        val c = colOf(ch.x)
        cells(c) = if (cells(c) == null) ch.text else cells(c) + " " + ch.text
      }
      // trim trailing all-null tail so narrow pages keep their true arity
      var last = cells.length - 1
      while (last >= 0 && cells(last) == null) last -= 1
      cells.take(last + 1).toIndexedSeq
    }.toSeq
  }
}
