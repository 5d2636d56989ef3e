package graft.operators

import graft.operators.Materialize.MaterializeOps
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{JoinedRow, SpecificInternalRow, UnsafeProjection}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SqlShims
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Distributed word-level suffix arrays by Manber–Myers prefix doubling —
  * the machinery behind exact substring-level corpus dedup ("find every
  * phrase that occurs more than once anywhere in the corpus", the
  * suffix-array formulation popularized for LLM training data by Lee et
  * al. 2021, *Deduplicating Training Data Makes Language Models Better*).
  * The shingle family (q26/q91/q134) answers that question for FIXED
  * window sizes; the suffix array answers it for ALL lengths at once: the
  * longest repeated phrase at a position is its max LCP with the suffix-
  * order neighbors, with no k chosen in advance.
  *
  * Scale design — why this shape survives 100 TB:
  *
  *  - A suffix is never materialized. Each of the ≤ log2(maxDocLen)
  *    doubling rounds compares suffixes by an integer pair
  *    `(rank[pos], rank[pos + 2^k])`, so after round 0 every exchange
  *    carries (doc_id, pos, rank) rows — ≤ 32 bytes — never text. Round 0
  *    is the only word-keyed exchange, and what it ranks is the corpus
  *    position table keyed by adjacent WORD PAIRS (bounded-width keys,
  *    the classic wider-initial-alphabet start — it buys 2-word prefix
  *    order up front, so the k=1 doubling round never runs), not
  *    suffixes.
  *  - Global dense ranking is in-place and two-phase, with no
  *    single-partition stage and no join-back: range-partition + sort by
  *    the rank pair (per-task slice bounded by the range split), one
  *    statistics pass collecting (firstKey, lastKey, nDistinct) per
  *    partition — #partitions rows on the driver — then each task
  *    assigns `offset(p) + local dense index` in one scan. The class
  *    count falls out of the same statistics, so the Manber–Myers
  *    fixpoint test costs no extra job.
  *  - The `rank[pos + 2^k]` lookup is a `lead(r, 2^k)` window partitioned
  *    by doc_id — suffixes never cross documents, so the window is
  *    per-document, never global, and replaces a second corpus-wide
  *    self-join exchange per round.
  *  - Each round cuts lineage (`materialized` — localCheckpoint in bench,
  *    reliable checkpoint under preemption, see [[Materialize]]);
  *    otherwise round k would recompute rounds 0..k-1 through every
  *    ranking pass again.
  *  - Rounds stop at the Manber–Myers fixpoint: when a doubling step
  *    splits no rank class, no longer offset can split one either, so the
  *    loop exits well before log2(maxDocLen) on real text (only
  *    genuinely-equal suffixes — e.g. exact duplicate documents — still
  *    share a class, and those never separate).
  */
object SuffixArray {

  /** Key access over (possibly buffer-reused) `InternalRow`s — the
    * Tungsten lane of [[denseRank]]. `read` returns a self-contained
    * boxed copy, safe to retain across `next()` calls and to ship to the
    * driver; `matches` compares a row against such a copy without
    * deserializing or allocating (beyond primitive unboxing). The
    * all-`LongType` lane (every doubling round: keys `(r, r2)`) reads
    * primitives straight out of the `UnsafeRow`; the generic lane (round
    * 0's word key) clones `UTF8String`s on class boundaries only. */
  private sealed trait KeyOps extends Serializable {
    def read(r: InternalRow): Seq[Any]
    def matches(r: InternalRow, k: Seq[Any]): Boolean
  }

  private def keyOpsFor(keyIdx: Array[Int], keyTypes: Array[DataType]): KeyOps = {
    val nk = keyIdx.length
    if (keyTypes.forall(_ == LongType)) new KeyOps {
      def read(r: InternalRow): Seq[Any] = {
        val a = new Array[Any](nk)
        var i = 0
        while (i < nk) { a(i) = r.getLong(keyIdx(i)); i += 1 }
        scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
      }
      def matches(r: InternalRow, k: Seq[Any]): Boolean = {
        var i = 0
        while (i < nk) {
          if (r.getLong(keyIdx(i)) != k(i).asInstanceOf[Long]) return false
          i += 1
        }
        true
      }
    } else new KeyOps {
      def read(r: InternalRow): Seq[Any] = {
        val a = new Array[Any](nk)
        var i = 0
        while (i < nk) {
          a(i) = r.get(keyIdx(i), keyTypes(i)) match {
            case s: UTF8String => s.clone()
            case v => v
          }
          i += 1
        }
        scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
      }
      def matches(r: InternalRow, k: Seq[Any]): Boolean = {
        var i = 0
        while (i < nk) {
          val v = r.get(keyIdx(i), keyTypes(i))
          val kv = k(i)
          val eq = if (v == null) kv == null else v.equals(kv)
          if (!eq) return false
          i += 1
        }
        true
      }
    }
  }

  /** Wrap a stamp-job iterator so exhaustion checks the consumed-row
    * count against the stats job's count for the same partition. Both
    * jobs re-read the range exchange's shuffle files (skipped stages)
    * and the in-partition sort is a total order, so the sequences are
    * identical — this turns a violated assumption (nondeterministic
    * upstream recompute) into a loud error instead of silently
    * misaligned offsets. */
  private def countGuard[T](
      it: Iterator[T], pid: Int, expected: Long, op: String): Iterator[T] =
    new Iterator[T] {
      private var n = 0L
      def hasNext: Boolean = {
        val h = it.hasNext
        if (!h) require(n == expected,
          s"$op: partition $pid stamped $n rows but the stats job counted " +
            s"$expected — nondeterministic recompute between the two jobs")
        h
      }
      def next(): T = { n += 1; it.next() }
    }

  /** In-place two-phase dense rank: append to `df` an order-preserving
    * dense 1-based ordinal `out` of its `keys` columns, plus the total
    * distinct-key count. Shape: range-partition + sort by `keys`; one
    * bounded statistics job (per-partition firstKey/lastKey/nDistinct —
    * #partitions rows to the driver); then every task stamps
    * `offset + local dense index` in a single scan. Equal keys land in
    * one range partition, but the offset arithmetic still reconciles a
    * key straddling a partition boundary (defensive — costs nothing).
    * No join back, no single-partition window, no corpus-sized driver
    * state.
    *
    * Execution tier: both jobs run on `RDD[InternalRow]` (`SqlShims
    * .toRdd`) — keys are compared as primitives straight out of the
    * sorted `UnsafeRow`s and the stamped ordinal is appended through a
    * reused `UnsafeProjection`, so no row is ever deserialized to a
    * `GenericRow` and the only per-row allocation on the doubling-round
    * lane is the projection's output buffer. */
  private[graft] def denseRank(
      df: DataFrame, keys: Seq[String], out: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    val kc = keys.map(col)
    val sorted = df.repartitionByRange(kc: _*).sortWithinPartitions(kc: _*)
    val schema = sorted.schema
    val keyIdx = keys.map(schema.fieldIndex).toArray
    val keyTypes = keyIdx.map(i => schema.fields(i).dataType)
    val ops = keyOpsFor(keyIdx, keyTypes)
    val rdd = SqlShims.toRdd(sorted)
    val nParts = rdd.getNumPartitions
    // Job 1 (bounded): per-partition (firstKey, lastKey, nDistinct, nRows).
    val stats = rdd.mapPartitionsWithIndex { (pid, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val first = ops.read(it.next())
        var prev = first
        var n = 1L
        var rows = 1L
        while (it.hasNext) {
          val r = it.next()
          rows += 1
          if (!ops.matches(r, prev)) { n += 1; prev = ops.read(r) }
        }
        Iterator.single((pid, first, prev, n, rows))
      }
    }.collect().sortBy(_._1)
    // Driver-side offsets: distinct keys strictly before each partition,
    // discounting a first key that continues the previous partition's
    // last key (cannot happen under range partitioning; kept defensive).
    val offsets = new Array[Long](nParts)
    val carries = new Array[Seq[Any]](nParts)
    val expectRows = new Array[Long](nParts)
    var acc = 0L
    var carry: Seq[Any] = null
    stats.foreach { case (pid, firstKey, lastKey, n, rows) =>
      offsets(pid) = acc
      carries(pid) = carry
      expectRows(pid) = rows
      acc += (if (carry != null && firstKey == carry) n - 1 else n)
      carry = lastKey
    }
    val total = acc
    val outSchema = StructType(
      schema.fields :+ StructField(out, LongType, nullable = false))
    // Job 2 (deferred): stamp the ordinal in one scan per task. Re-reads
    // the already-written shuffle output; nothing upstream recomputes.
    val stamped = rdd.mapPartitionsWithIndex { (pid, it) =>
      val proj = UnsafeProjection.create(outSchema)
      val cell = new SpecificInternalRow(Seq(LongType))
      val joined = new JoinedRow
      var rk = offsets(pid)
      var prev: Seq[Any] = carries(pid)
      countGuard(it, pid, expectRows(pid), "denseRank").map { r =>
        if (prev == null || !ops.matches(r, prev)) { rk += 1; prev = ops.read(r) }
        cell.setLong(0, rk)
        proj(joined(r, cell)): InternalRow
      }
    }
    (SqlShims.internalCreateDataFrame(spark, stamped, outSchema), total)
  }

  /** `(doc_id, pos, suffix_rank)` — the dense global lexicographic rank of
    * the word-level suffix starting at each position of each document
    * (suffixes run to the END OF THEIR DOCUMENT; shorter-is-smaller on
    * prefix ties, the usual suffix-array order). Equal suffixes — which
    * exist whenever documents share an exact tail — share a rank, so the
    * rank is `DENSE_RANK` over suffix order. */
  def suffixRanks(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), split(col("text"), "\\s+").as("w"))
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    // Lead-word start (the classic wider-initial-alphabet cut, widened
    // 2 → 4 in the r15 optimization pass): round 0 ranks each position
    // by its (word, +1, …, +Lead−1) tuple, so the ranks already encode
    // Lead-word prefix order and the k = 1 … Lead/2 integer doubling
    // rounds — each a full corpus-sized range exchange + sort + two jobs
    // — never run. The extra leads ride the SAME per-doc window sort the
    // 2-word form already paid; only round 0's range exchange widens. A
    // suffix that ends early has NULLs from its first missing position
    // on: NULL sorts FIRST (Spark's ASC default), which is exactly the
    // shorter-is-smaller suffix rule the doubling rounds encode as
    // r2 = -1, and once one lead is NULL all later leads are too, so the
    // column-wise order equals true suffix order on the first Lead
    // words. NULL cannot collide with data: split() never yields null
    // tokens. Lead = 8 was ALSO measured (r15): flat at sf0.1 (×0.97
    // against ×0.9–1.1 controls) while doubling round 0's corpus-sized
    // exchange width — 4 keeps the narrow exchange and the measured win.
    val Lead = 4
    val leadCols = (2 to Lead).map(i => s"word$i")
    val pos = leadCols.zipWithIndex.foldLeft(
      toks.select(col("doc_id"),
        posexplode(col("w")).as(Seq("pos", "word")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("word"))
    ) { case (df, (c, i)) => df.withColumn(c, lead(col("word"), i + 1).over(byDoc)) }
    val (ranked, classes0) =
      denseRank(pos, "word" +: leadCols, "r")
    var classes = classes0
    var cur = ranked.select(col("doc_id"), col("pos"), col("r"))
    // Bounded scalars, one agg job: the longest document's word count
    // caps the rounds, and the total position count detects an
    // already-saturated round 0. max()/sum() over an empty corpus are
    // NULL — 0 short-circuits the loop.
    val lenStats = toks.agg(max(size(col("w"))), sum(size(col("w")))).head()
    val maxLen = Option(lenStats.get(0))
      .map(_.asInstanceOf[Int].toLong).getOrElse(0L)
    val totalPos = Option(lenStats.get(1))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    var k = Lead.toLong
    // Saturation skip: when every Lead-word prefix is already distinct
    // (classes0 == position count — common on real text), the ranks are
    // final and the k=Lead corpus-sized range exchange would run once
    // just to discover nothing changed.
    var fixed = classes0 == totalPos
    while (k < maxLen && !fixed) {
      // Suffix shorter than pos+2^k sorts before any continuation: -1.
      val withR2 = cur.select(col("doc_id"), col("pos"), col("r"),
        coalesce(lead(col("r"), k.toInt).over(byDoc), lit(-1L)).as("r2"))
      val (next, newClasses) = denseRank(withR2, Seq("r", "r2"), "rn")
      cur = next.select(col("doc_id"), col("pos"), col("rn").as("r"))
      fixed = newClasses == classes
      classes = newClasses
      k *= 2
    }
    // No per-round checkpoint: every round's denseRank runs an EAGER
    // stats job that materializes that round's range exchange, and later
    // jobs reuse those shuffle files (skipped stages) — recompute is
    // bounded to the cheap post-shuffle stamping map, never the whole
    // prefix of rounds. One cut at the end for the multi-consumer callers
    // (and the `reliable` mode under preemption).
    cur.withColumnRenamed("r", "suffix_rank").materialized
  }

  /** `(doc_id, pos, sidx, l, g)` — contiguous ordinal `sidx` of each word
    * position in CAPPED suffix order (lexicographic by the `cap`-word
    * window starting there, shorter-is-smaller, ties broken (doc_id,
    * pos)), the LCP `l` (≤ `cap`) between each window and its SUCCESSOR
    * in that order, and `g` = max(l, predecessor's l) — the longest
    * phrase (≤ `cap` words) starting at the position that also occurs
    * anywhere else in the corpus.
    *
    * Capped order, not full suffix order, on purpose: every capped LCP
    * depends only on the `cap`-word windows, windows sharing a prefix
    * sort contiguously in BOTH orders, and within an equal-window block
    * every member's capped LCP to any other row is the same — so `l`/`g`
    * per (doc_id, pos) are identical under any block-respecting order
    * (SuffixArraySpec pins this to brute force ∀ corpora, and the
    * full-order oracles of q157/q158/q160 hash-match). What it buys: the
    * ≤ log₂(maxDocLen) prefix-doubling rounds collapse into ONE range
    * exchange carrying the window column that any LCP step must exchange
    * anyway, and the adjacent LCP needs no self-join — after the range
    * sort, the successor IS the next row of the partition, so `sidx`,
    * `l`, and `g` are all stamped in the denseRank discipline: one
    * bounded stats job also collecting each partition's head/tail window
    * (#partitions × `cap` words to the driver), then one scan per task
    * with the neighbor partitions' boundary windows in the closure. Full
    * UNCAPPED ranks (q156's contract) stay on [[suffixRanks]]. */
  def adjacentLcp(docs: DataFrame, cap: Int = 31): DataFrame = {
    val spark = docs.sparkSession
    val toks = docs.select(col("doc_id"), split(col("text"), "\\s+").as("w"))
    val wins = toks
      .select(col("doc_id"), col("w"), posexplode(col("w")).as(Seq("pos", "word")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        slice(col("w"), col("pos") + 1, lit(cap)).as("win"))
    val sorted = wins
      .repartitionByRange(col("win"), col("doc_id"), col("pos"))
      .sortWithinPartitions("win", "doc_id", "pos")
    val rdd = SqlShims.toRdd(sorted)
    val nParts = rdd.getNumPartitions
    // One bounded job: per-partition row count + boundary windows. No
    // per-row copies: the first window is extracted before the second
    // `next()` invalidates its buffer, and the running `cur` reference is
    // only read (for the last window) after the final `next()`.
    val stats = rdd.mapPartitionsWithIndex { (pid, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        var cur = it.next()
        val firstWin = winStrings(cur)
        var n = 1L
        while (it.hasNext) { cur = it.next(); n += 1 }
        Iterator.single((pid, n, firstWin, winStrings(cur)))
      }
    }.collect().sortBy(_._1)
    val offsets = new Array[Long](nParts)
    val expectRows = new Array[Long](nParts)
    val nextHead = new Array[Array[String]](nParts)
    val prevTail = new Array[Array[String]](nParts)
    var acc = 0L
    var tail: Array[String] = null
    stats.foreach { case (pid, n, _, lastWin) =>
      offsets(pid) = acc; prevTail(pid) = tail; expectRows(pid) = n
      acc += n; tail = lastWin
    }
    var head: Array[String] = null
    stats.reverseIterator.foreach { case (pid, _, firstWin, _) =>
      nextHead(pid) = head; head = firstWin
    }
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("pos", LongType, nullable = false),
      StructField("sidx", LongType, nullable = false),
      StructField("l", LongType, nullable = false),
      StructField("g", LongType, nullable = false)))
    // Stamp scan on InternalRow: each row is copied ONCE when pulled
    // (single buffer memcpy — it must outlive the lookahead pull), LCPs
    // compare UTF8String bytes in place, and output rows go through a
    // reused UnsafeProjection — no GenericRow deserialization anywhere.
    val stamped = rdd.mapPartitionsWithIndex { (pid, it) =>
      val proj = UnsafeProjection.create(outSchema)
      val outRow = new SpecificInternalRow(outSchema.map(_.dataType))
      val pt = toU8(prevTail(pid))
      val nh = toU8(nextHead(pid))
      val guarded = countGuard(it, pid, expectRows(pid), "adjacentLcp")
      var sidx = offsets(pid)
      var prevL = 0L
      new Iterator[InternalRow] {
        private var cur: InternalRow =
          if (guarded.hasNext) guarded.next().copy() else null
        private var first = true
        def hasNext: Boolean = cur != null
        def next(): InternalRow = {
          val nxt: InternalRow =
            if (guarded.hasNext) guarded.next().copy() else null
          if (first) { prevL = lcpBound(cur, pt); first = false }
          val l = if (nxt != null) lcpRows(cur, nxt) else lcpBound(cur, nh)
          sidx += 1
          outRow.setLong(0, cur.getLong(0))
          outRow.setLong(1, cur.getLong(1))
          outRow.setLong(2, sidx)
          outRow.setLong(3, l)
          outRow.setLong(4, math.max(prevL, l))
          prevL = l
          cur = nxt
          proj(outRow)
        }
      }
    }
    SqlShims.internalCreateDataFrame(spark, stamped, outSchema)
  }

  /** The `win` column (ordinal 2) of a window row as a self-contained
    * `Array[String]` — safe to retain, buffer, or ship to the driver. */
  private def winStrings(r: InternalRow): Array[String] = {
    val a = r.getArray(2)
    val n = a.numElements()
    val out = new Array[String](n)
    var i = 0
    while (i < n) { out(i) = a.getUTF8String(i).toString; i += 1 }
    out
  }

  private def toU8(a: Array[String]): Array[UTF8String] =
    if (a == null) null else a.map(UTF8String.fromString)

  /** LCP of the `win` arrays (ordinal 2) of two window rows — UTF8String
    * byte comparison in place, no materialization. */
  private def lcpRows(a: InternalRow, b: InternalRow): Long = {
    val aa = a.getArray(2)
    val ba = b.getArray(2)
    val n = math.min(aa.numElements(), ba.numElements())
    var i = 0
    while (i < n && aa.getUTF8String(i) == ba.getUTF8String(i)) i += 1
    i.toLong
  }

  /** LCP of a window row's `win` against a boundary window (null = no
    * neighbor partition → 0, matching suffix-order edge semantics). */
  private def lcpBound(a: InternalRow, b: Array[UTF8String]): Long =
    if (b == null) 0L
    else {
      val aa = a.getArray(2)
      val n = math.min(aa.numElements(), b.length)
      var i = 0
      while (i < n && aa.getUTF8String(i) == b(i)) i += 1
      i.toLong
    }

  /** Repeat-count sweep: for each k in `ks`, the length (capped at
    * `cap` words) of the LONGEST phrase occurring at ≥ k positions
    * anywhere in the corpus, how many suffix-order windows achieve it,
    * and the lexicographically smallest achieving phrase. The classic
    * suffix-array identity one level up from [[adjacentLcp]]: a phrase
    * occurs ≥ k times iff some k consecutive suffixes in suffix order
    * share it as a prefix, so `longest(k) = max over i of
    * min(l_i .. l_{i+k-2})` — a sliding-window minimum over the
    * adjacent-LCP sequence. Fixed-width shingle counting (q26/q38/q140)
    * answers "which L-word phrases repeat"; the sweep answers "how LONG
    * does boilerplate get at each repetition tier" with no L chosen in
    * advance.
    *
    * Scale shape: the one capped-window range exchange [[adjacentLcp]]
    * pays (the sort by `win` is reused across the stats and sweep jobs
    * as skipped stages), plus a bounded stats job — each partition ships
    * its row count and FIRST `max(ks)-1` windows, ≤ #partitions × 15 ×
    * `cap` words to the driver — so every partition can extend its
    * sliding windows across its boundary without a second exchange or a
    * global window. Partials are ≤ |ks| rows per partition (local max,
    * count-at-max, min phrase); the global roll-up is |ks|-row work.
    * Output is order-invariant under the capped sort's tie-breaking:
    * the adjacent-LCP sequence is block-invariant (equal capped windows
    * form atomic runs), counts/lengths depend only on that sequence,
    * and the phrase report takes the MINIMUM string over achieving
    * windows. */
  def repeatSweep(
      docs: DataFrame,
      ks: Seq[Int] = Seq(2, 4, 8, 16),
      cap: Int = 31): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 2), s"ks must all be >= 2: $ks")
    val spark = docs.sparkSession
    import spark.implicits._
    val ksArr = ks.distinct.sorted.toArray
    val maxM = ksArr.last - 1
    val toks = docs.select(col("doc_id"), split(col("text"), "\\s+").as("w"))
    val wins = toks
      .select(col("doc_id"), col("w"),
        posexplode(col("w")).as(Seq("pos", "word")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        slice(col("w"), col("pos") + 1, lit(cap)).as("win"))
    val sorted = wins
      .repartitionByRange(col("win"), col("doc_id"), col("pos"))
      .sortWithinPartitions("win", "doc_id", "pos")
    val rdd = SqlShims.toRdd(sorted)
    // Bounded stats job: per-partition row count + first maxM windows.
    val stats = rdd.mapPartitionsWithIndex { (pid, it) =>
      val head = new scala.collection.mutable.ArrayBuffer[Array[String]](maxM)
      var n = 0L
      while (it.hasNext) {
        val r = it.next()
        if (n < maxM) head += winStrings(r)
        n += 1
      }
      if (n == 0L) Iterator.empty else Iterator.single((pid, n, head.toSeq))
    }.collect().sortBy(_._1)
    val nByPid = stats.map(s => s._1 -> s._2).toMap
    // Each partition's boundary extension: the next maxM windows in
    // global order, chained across short/empty following partitions.
    val exts: Map[Int, Seq[Array[String]]] = stats.indices.map { i =>
      stats(i)._1 ->
        stats.view.slice(i + 1, stats.length).flatMap(_._3).take(maxM).toSeq
    }.toMap
    val sc = spark.sparkContext
    val extB = sc.broadcast(exts)
    val nB = sc.broadcast(nByPid)
    def lcp(a: Array[String], b: Array[String]): Long = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n && a(i) == b(i)) i += 1
      i.toLong
    }
    val nk = ksArr.length
    val partials = rdd.mapPartitionsWithIndex { (pid, it) =>
      val nOwn = nB.value.getOrElse(pid, 0L)
      if (nOwn == 0L) Iterator.empty
      else {
        // countGuard fires when the partition's own rows drain (the sweep
        // always pulls past them into the boundary extension) — a count
        // drift vs the stats job dies loudly instead of misattributing
        // windows across the partition boundary.
        val source = countGuard(it, pid, nOwn, "repeatSweep")
          .map(winStrings) ++ extB.value.getOrElse(pid, Nil).iterator
        val buf = scala.collection.mutable.ArrayDeque.empty[Array[String]]
        val lq = scala.collection.mutable.ArrayDeque.empty[Long]
        while (buf.size < maxM + 1 && source.hasNext) {
          val w = source.next()
          if (buf.nonEmpty) lq += lcp(buf.last, w)
          buf += w
        }
        val best = new Array[Long](nk)
        val cnt = new Array[Long](nk)
        val phr = new Array[String](nk)
        var i = 0L
        while (i < nOwn) {
          var ki = 0
          while (ki < nk) {
            val m = ksArr(ki) - 1
            if (lq.size >= m) {
              var mn = Long.MaxValue
              var j = 0
              while (j < m) { val v = lq(j); if (v < mn) mn = v; j += 1 }
              if (mn >= 1L) {
                if (mn > best(ki)) {
                  best(ki) = mn; cnt(ki) = 1L
                  phr(ki) = buf.head.take(mn.toInt).mkString(" ")
                } else if (mn == best(ki)) {
                  cnt(ki) += 1L
                  val ph = buf.head.take(mn.toInt).mkString(" ")
                  if (ph.compareTo(phr(ki)) < 0) phr(ki) = ph
                }
              }
            }
            ki += 1
          }
          buf.removeHead()
          if (lq.nonEmpty) lq.removeHead()
          if (source.hasNext) {
            val w = source.next()
            lq += lcp(buf.last, w)
            buf += w
          }
          i += 1
        }
        (0 until nk).iterator.filter(best(_) >= 1L).map(ki =>
          Row(ksArr(ki).toLong, best(ki), cnt(ki), phr(ki)))
      }
    }
    val pschema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("len", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("phrase", StringType, nullable = false)))
    val partial = spark.createDataFrame(partials, pschema)
    val mx = partial.groupBy("k").agg(max(col("len")).as("max_len"))
    val top = partial.join(mx, Seq("k"))
      .filter(col("len") === col("max_len"))
      .groupBy("k", "max_len")
      .agg(sum(col("cnt")).as("n_max"), min(col("phrase")).as("phrase"))
    ksArr.map(_.toLong).toSeq.toDF("k")
      .join(top, Seq("k"), "left")
      .select(col("k"),
        coalesce(col("max_len"), lit(0L)).as("max_len"),
        coalesce(col("n_max"), lit(0L)).as("n_max"),
        coalesce(col("phrase"), lit("")).as("phrase"))
  }

  /** `(doc_id, pos, g)` — for EVERY word position, the length (capped at
    * `cap`) of the longest phrase starting there that also occurs
    * anywhere else in the corpus (another position of any document,
    * itself included). The classic suffix-array identity: the longest
    * repeat at a position is its max LCP with the two NEIGHBORS in
    * suffix order — which [[adjacentLcp]] already stamps as `g` in its
    * single sorted scan. The primitive under q157 (per-doc profile) and
    * q158 (excision sweep). */
  def positionDupLens(docs: DataFrame, cap: Int = 31): DataFrame =
    adjacentLcp(docs, cap).select(col("doc_id"), col("pos"), col("g"))

  /** Append to `df` the INCLUSIVE running count of `flagCol` over the
    * global `orderCol` order, plus the flag total — the same two-phase
    * shape as [[denseRank]]: range-partition + sort, one bounded
    * per-partition count job (#partitions rows to the driver), then each
    * task stamps `offset + local running count` in one scan. No
    * single-partition window anywhere. */
  private[graft] def withPrefixCount(
      df: DataFrame, orderCol: String, flagCol: String, out: String)
      : (DataFrame, Long) = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(col(orderCol))
      .sortWithinPartitions(orderCol)
    val schema = sorted.schema
    val fi = schema.fieldIndex(flagCol)
    val rdd = SqlShims.toRdd(sorted)
    val counts = rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L
      var rows = 0L
      while (it.hasNext) {
        if (it.next().getBoolean(fi)) n += 1
        rows += 1
      }
      Iterator.single((pid, n, rows))
    }.collect().sortBy(_._1)
    val offsets = counts.map(_._2).scanLeft(0L)(_ + _)
    val expectRows = counts.map(_._3)
    val total = offsets.last
    val outSchema = StructType(
      schema.fields :+ StructField(out, LongType, nullable = false))
    val stamped = rdd.mapPartitionsWithIndex { (pid, it) =>
      val proj = UnsafeProjection.create(outSchema)
      val cell = new SpecificInternalRow(Seq(LongType))
      val joined = new JoinedRow
      var c = offsets(pid)
      countGuard(it, pid, expectRows(pid), "withPrefixCount").map { r =>
        if (r.getBoolean(fi)) c += 1
        cell.setLong(0, c)
        proj(joined(r, cell)): InternalRow
      }
    }
    (SqlShims.internalCreateDataFrame(spark, stamped, outSchema), total)
  }

  /** Benchmark decontamination at ANY phrase length: for every document
    * NOT in the benchmark set, the length (words, capped at `cap`) of the
    * longest phrase it shares with ANY benchmark document, plus how many
    * of its positions start a shared phrase of ≥ `minRun` words. The
    * verbatim-contamination question q38/q96/q148 answer for FIXED
    * shingle widths, answered for all widths at once — Lee et al.'s
    * decontamination formulation.
    *
    * Suffix-array identity, cross-set form: the max LCP between suffix i
    * and any BENCHMARK suffix equals the max over its nearest benchmark
    * neighbors above and below in suffix order, and LCP to a non-adjacent
    * suffix is the running MIN of adjacent LCPs between them. So after
    * [[adjacentLcp]]: one two-phase prefix count of benchmark positions
    * assigns every row its preceding/following benchmark-segment ids, and
    * two segment-partitioned running-min windows (never global — each
    * partition spans one inter-benchmark gap) produce both LCPs. */
  def phraseContam(
      docs: DataFrame, isBench: Column, cap: Int = 31, minRun: Int = 8)
      : DataFrame = {
    val adj = adjacentLcp(docs, cap)
      .select(col("doc_id"), col("sidx"), col("l"))
      .withColumn("is_bench", isBench)
    val (pc, nBench) = withPrefixCount(adj, "sidx", "is_bench", "pcnt")
    val g = pc
      .withColumn("fwdgrp", col("pcnt"))
      .withColumn("bwdgrp",
        col("pcnt") + when(col("is_bench"), 0L).otherwise(1L))
    val wf = Window.partitionBy("fwdgrp").orderBy("sidx")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wb = Window.partitionBy("bwdgrp").orderBy(col("sidx").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // The benchmark leader's own l belongs to the NEXT gap, not the span
    // back to it — mask it out of the backward running min.
    val lMasked = when(col("is_bench"), lit(1000000L)).otherwise(col("l"))
    g
      .withColumn("fwd", when(col("fwdgrp") >= 1,
        coalesce(min(col("l")).over(wf), lit(0L))).otherwise(lit(0L)))
      .withColumn("bwd", when(col("bwdgrp") <= nBench,
        coalesce(min(lMasked).over(wb), lit(0L))).otherwise(lit(0L)))
      .filter(!col("is_bench"))
      .select(col("doc_id"), greatest(col("fwd"), col("bwd")).as("cl"))
      .groupBy("doc_id")
      .agg(max(col("cl")).as("max_shared_words"),
        sum(when(col("cl") >= minRun, 1L).otherwise(0L))
          .as("n_contam_starts"))
  }

  /** Per-document longest-repeated-phrase profile: max duplicate length
    * and count of positions starting a ≥ `minRun`-word phrase that
    * occurs elsewhere — the doc-grain roll-up of [[positionDupLens]]. */
  def lrsPerDoc(docs: DataFrame, cap: Int = 31, minRun: Int = 8): DataFrame =
    positionDupLens(docs, cap)
      .groupBy("doc_id")
      .agg(max(col("g")).as("lrs_words"),
        sum(when(col("g") >= minRun, 1L).otherwise(0L)).as("n_dup_starts"))
}
