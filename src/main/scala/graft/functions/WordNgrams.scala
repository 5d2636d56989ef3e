package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_ngrams(text, n)` — a table-generating function (UDTF analog): one
  * output row per n-word shingle of the whitespace-split input, the
  * candidate-generation primitive of the dedup suites (q21/q22/q24/q26/q38).
  *
  * This is the third custom-extension kind next to scalar `Expression`s
  * (RollingHash64 &c.) and `TypedImperativeAggregate`s (ArrayLongFold &c.):
  * a Catalyst `Generator`, planned into `GenerateExec` exactly like
  * `explode`. Two properties matter at corpus scale:
  *
  *   - it does NOT materialize the shingle set: the equivalent composition
  *     `explode(sequence(...))` + `concat_ws(slice(...))` (or a
  *     `transform` building the full array first) allocates per-document
  *     intermediate arrays; the generator walks the token array once and
  *     emits each shingle lazily through a row iterator;
  *   - it implements `doGenCode`, so `GenerateExec` keeps it INSIDE
  *     whole-stage codegen (the `codeGenIterableOnce` path — the generated
  *     loop calls [[WordNgrams.ngrams]] and iterates in place). A Scala UDF
  *     returning `Seq[String]` + `explode` would break the codegen stage
  *     and pay SerDe per row.
  *
  * Semantics match the split-based composition bit-for-bit (same Java regex
  * `\s+`, limit -1, same `max(len - n + 1, 1)` short-document rule that
  * emits one truncated shingle for texts of fewer than n words), so the
  * DuckDB oracles of every consumer keep hash-matching. Null text emits no
  * rows (DuckDB `unnest(NULL)` behavior).
  */
case class WordNgrams(child: Expression, n: Int) extends Generator {
  require(n >= 1, s"word_ngrams: n must be >= 1, got $n")

  override def children: Seq[Expression] = child :: Nil

  override def elementSchema: StructType =
    new StructType().add("sh", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires a string argument, got ${child.dataType}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] =
    WordNgrams.ngrams(child.eval(input).asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val it = ctx.freshName("ngramIter")
    val javaCode =
      code"""
         |${childGen.code}
         |scala.collection.Iterator $it = graft.functions.WordNgrams.ngrams(
         |  ${childGen.isNull} ? null : ${childGen.value}, $n);
       """.stripMargin
    ev.copy(code = javaCode, isNull = FalseLiteral,
      value = JavaCode.variable(it, classOf[scala.collection.Iterator[_]]))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WordNgrams =
    copy(child = newChildren.head)

  override def prettyName: String = "word_ngrams"
}

object WordNgrams {

  /** Java regex `\s` is the ASCII set [ \t\n\x0B\f\r] (no UNICODE flag), and
    * UTF-8 continuation/lead bytes are >= 0x80, so a BYTE scan splits at
    * exactly the positions `split(text, '\s+')` does — without decoding the
    * string. (RE2's `\s` on the DuckDB side is the same ASCII set.) */
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Static so generated code can call it directly. One allocation-free
    * boundary scan per document, then lazy per-shingle emission — each
    * `next()` is a couple of `System.arraycopy`s straight from the source
    * bytes to the output `UTF8String`; the text is never decoded and the
    * shingle set is never materialized. */
  def ngrams(t: UTF8String, n: Int): Iterator[InternalRow] = {
    if (t == null) return Iterator.empty
    val bytes = t.getBytes
    val len = bytes.length
    // Token segments under split-with-limit -1 semantics: an empty leading
    // token if the text starts with whitespace, an empty trailing token if
    // it ends with it, "" -> one empty token. Verified against
    // String.split("\\s+", -1) in WordNgramsSpec.
    var cap = 16
    var ss = new Array[Int](cap)
    var es = new Array[Int](cap)
    var m = 0
    def push(s: Int, e: Int): Unit = {
      if (m == cap) {
        cap *= 2
        ss = java.util.Arrays.copyOf(ss, cap)
        es = java.util.Arrays.copyOf(es, cap)
      }
      ss(m) = s; es(m) = e; m += 1
    }
    var i = 0
    var tokStart = 0
    while (i < len) {
      if (isWs(bytes(i))) {
        push(tokStart, i)
        while (i < len && isWs(bytes(i))) i += 1
        tokStart = i
      } else i += 1
    }
    push(tokStart, len)
    val nTok = m
    val total = math.max(nTok - n + 1, 1)
    val starts = ss
    val ends = es
    new Iterator[InternalRow] {
      private var idx = 0
      override def hasNext: Boolean = idx < total
      override def next(): InternalRow = {
        val s = idx
        idx += 1
        val end = math.min(s + n, nTok)
        var size = end - s - 1 // single-space joiners
        var j = s
        while (j < end) { size += ends(j) - starts(j); j += 1 }
        val out = new Array[Byte](size)
        var pos = 0
        j = s
        while (j < end) {
          if (j > s) { out(pos) = ' '; pos += 1 }
          val l = ends(j) - starts(j)
          System.arraycopy(bytes, starts(j), out, pos, l)
          pos += l
          j += 1
        }
        new GenericInternalRow(Array[Any](UTF8String.fromBytes(out)))
      }
    }
  }
}
