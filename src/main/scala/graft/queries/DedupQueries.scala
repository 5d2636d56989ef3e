package graft.queries

import graft.operators.Materialize.MaterializeOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Deduplication suite over the `documents` table — the LLM-training-data
  * operators (BASELINE.json north star): exact content dedup, MinHash-LSH
  * near-dup, SimHash near-dup, and exact n-gram Jaccard verification.
  *
  * Scale design: exact dedup groups on `md5(text)` (fixed-width key — the
  * shuffle carries 32-byte hashes, not document bodies). The near-dup
  * pipelines follow the standard shingle → signature → band → bucket-join
  * shape: candidate generation is a self-join on band buckets (shuffle keys
  * are small band hashes; cost scales with collisions, not with n²), and
  * only candidates are verified.
  *
  * Cross-engine hash family: every hash is derived from `md5` (bit-identical
  * in Spark and DuckDB) — base value = two 32-bit halves of the digest's
  * first 16 hex chars, k-th permutation = `(a_k·lo + b_k·hi + c_k) mod
  * (2^61-1)` with plan-time literal 29-bit constants. All products stay
  * below 2^62, so the SAME integer arithmetic runs without overflow in both
  * engines (DuckDB BIGINT overflow throws; Java wraps — neither is hit).
  * That makes the whole LSH pipeline SQL-expressible and hash-checked by
  * the DuckDB oracle, and — equally important at scale — independent of
  * partitioning, executor count, and run order.
  */
object DedupQueries {

  /** words → 5-word shingle strings, 1 row per (doc_id, shingle) — distinct
    * by default. `dedup = false` skips the distinct (a full shuffle of
    * shingle TEXT — the single most expensive exchange in these pipelines
    * at corpus scale) for consumers whose aggregate is duplicate-insensitive
    * (minhash's `min`). */
  private[queries] def shingles(docs: DataFrame, nWords: Int = 5, dedup: Boolean = true): DataFrame = {
    // word_ngrams is the custom Generator (UDTF): lazily emits each shingle
    // inside whole-stage codegen instead of exploding an index sequence and
    // re-slicing the token array per row. Output is bit-identical to the
    // split+slice+concat_ws composition (every consumer's oracle re-checks).
    val sh = docs.select(col("doc_id"),
      graft.functions.GraftFunctions.word_ngrams(col("text"), nWords).as("sh"))
    if (dedup) sh.distinct() else sh
  }

  /** Per-doc DISTINCT shingle digests as (doc_id, h1, h2) — the full
    * 128-bit md5 in two big-endian longs ([[graft.functions.Md5Suffix64]]).
    * Bijective with the 32-char hex digest, so every distinct/group/join
    * keyed on (h1, h2) computes exactly the sets the hex form computed, at
    * ~half the shuffle bytes with primitive-typed keys (guide §2.3); the
    * distinct runs AFTER the digest map, so no exchange ever carries
    * shingle text. */
  private[queries] def shingleDigests(docs: DataFrame, nWords: Int = 5): DataFrame = {
    val (h1c, h2c) = graft.functions.GraftFunctions.md5_128(col("sh"))
    shingles(docs, nWords, dedup = false)
      .select(col("doc_id"), h1c.as("h1"), h2c.as("h2"))
      .distinct()
  }

  /** Exact dedup via hash-groupBy: survivors = min doc_id per content hash.
    * Joining survivors back on doc_id (not on text) keeps the join key
    * narrow; md5 matches byte-for-byte across Spark and DuckDB. */
  val q20 = Q(
    "q20_dedup_exact",
    (s, dir) => {
      val docs = documents(s, dir)
      val keep = docs
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select("doc_id", "n_copies")
      docs
        .join(keep, "doc_id")
        .select("doc_id", "lang", "source", "n_chars", "n_copies")
        .orderBy("doc_id")
    },
    Some("""
      SELECT d.doc_id, d.lang, d.source, d.n_chars, k.n_copies
      FROM documents d
      JOIN (SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
            FROM documents GROUP BY md5(text)) k USING (doc_id)
      ORDER BY d.doc_id""")
  )

  /** Thresholded exact-Jaccard pairs (`inter * 20 >= union`, i.e. j ≥ 0.05)
    * over 5-word shingles — q21's output and q24's edge set. Columns:
    * (doc_a, doc_b, inter_cnt, jaccard).
    *
    * Candidates come from a PREFIX-FILTERED self-join (q76's PPJoin
    * discipline, lossless at any fixed threshold): under the global
    * (df asc, digest asc) token order, two sets with j ≥ 0.05 must share
    * a token inside their first `n − ceil(n/20) + 1` tokens, so the join
    * indexes only those prefixes. The pairs this drops are exactly the
    * ones whose ONLY shared shingles are each document's hottest ~5% —
    * the high-df shingles whose posting lists make the naive
    * all-shared-shingle join quadratic. Intersections are then recounted
    * over the FULL shingle sets for candidates only, and the j ≥ 0.05
    * test is exact — the DuckDB oracle still runs the naive join, so the
    * hash check proves the filter's completeness end-to-end. Shuffles
    * carry 32-byte digests, never shingle text. */
  private def jaccardPairs(docs: DataFrame): DataFrame = {
    // Digest = the FULL 128-bit md5 as two longs (md5_128) instead of the
    // 32-char hex string: bijective with the hex form, so every distinct/
    // window/join below computes the SAME sets at ~half the shuffle bytes
    // with primitive-typed comparisons (guide §2.3 "narrower types"). The
    // distinct also moved AFTER the digest map, so the dedup exchange
    // carries 24-byte (doc_id, h1, h2) rows, never shingle text. The
    // rank's df-tie ordering flips from hex-lexicographic to signed-long —
    // a different but still CONSISTENT total order, and the PPJoin prefix
    // filter is lossless under any fixed total order (the exact j ≥ 0.05
    // recount over full shingle sets is unchanged), so the emitted pairs
    // are identical — the DuckDB oracle re-proves that on every gate run.
    val sh = shingleDigests(docs)
      .materialized // consumers: ranking, candidate recount both sides
    // df + per-doc rank/size via window counts: one exchange on h, one on
    // doc_id (rank and n share the doc_id partitioning)
    val ranked = sh
      .withColumn("df", count(lit(1)).over(Window.partitionBy("h1", "h2")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("h1"), col("h2"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
    // prefix length for j ≥ 0.05: n − ceil(n/20) + 1
    val prefix = ranked
      .filter(expr("rk <= n - ((n + 19) div 20) + 1"))
      .select("doc_id", "h1", "h2")
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.h1") === col("b.h1") && col("a.h2") === col("b.h2") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = cand
      .join(sh.as("xa"), col("doc_a") === col("xa.doc_id"))
      .join(sh.as("xb"),
        col("doc_b") === col("xb.doc_id") && col("xa.h1") === col("xb.h1") &&
          col("xa.h2") === col("xb.h2"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(
        col("doc_a"), col("doc_b"), col("inter").as("inter_cnt"),
        (col("inter").cast("double") /
          (col("ca.n") + col("cb.n") - col("inter"))).as("jaccard"))
      .filter(col("inter_cnt") * 20 >= (col("ca.n") + col("cb.n") - col("inter_cnt")))
  }

  /** The q21 pair CTE chain, shared verbatim by q24's oracle. */
  private val JaccardPairsSql = """
      words AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      idx AS (
        SELECT doc_id, w, unnest(range(1, greatest(len(w) - 4, 1) + 1)) AS i
        FROM words),
      sh AS (
        SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS sh FROM idx),
      counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id),
      jp AS (
        SELECT doc_a, doc_b, inter AS inter_cnt,
               CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) AS jaccard
        FROM pairs
        JOIN counts ca ON ca.doc_id = doc_a
        JOIN counts cb ON cb.doc_id = doc_b
        WHERE inter * 20 >= (ca.n + cb.n - inter))"""

  /** Exact n-gram (5-word shingle) Jaccard similarity for all intersecting
    * pairs above a threshold. The threshold test uses integer arithmetic
    * (`inter * 20 >= union`) so no float comparison can diverge between
    * engines; the reported jaccard is a ratio of identical ints → identical
    * doubles. Exact AND prefix-filtered (see [[jaccardPairs]]): candidate
    * generation is no longer quadratic in hot-shingle collisions, so the
    * exact verifier itself scales; q22_dedup_minhash remains the
    * approximate generator for when even exact recounts are too much. */
  val q21 = Q(
    "q21_ngram_jaccard",
    (s, dir) => jaccardPairs(documents(s, dir)).orderBy("doc_a", "doc_b"),
    Some(s"""
      WITH $JaccardPairsSql
      SELECT doc_a, doc_b, inter_cnt, jaccard
      FROM jp ORDER BY doc_a, doc_b""")
  )

  private val MinhashK = 64 // signature length
  private val Bands = 16    // 16 bands × 4 rows
  private val BucketCap = 64

  /** 2^61 - 1 (prime): permutation modulus. Values stay < 2^62 end-to-end. */
  private val P61 = 2305843009213693951L

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // 29-bit multipliers/offsets for the 2-universal permutation family —
  // fixed at plan time from splitmix64 streams so Spark literals and the
  // oracle's SQL list literals are the same numbers.
  private val Mask29 = (1L << 29) - 1
  private val PermA = IndexedSeq.tabulate(MinhashK)(i => (mix64(0xA0000L + i) & Mask29) | 1L)
  private val PermB = IndexedSeq.tabulate(MinhashK)(i => (mix64(0xB0000L + i) & Mask29) | 1L)
  private val PermC = IndexedSeq.tabulate(MinhashK)(i => mix64(0xC0000L + i) & Mask29)

  private def sqlList(xs: Seq[Long]): String = xs.mkString("[", ",", "]")

  /** Two 32-bit halves of the first 16 md5 hex chars — the cross-engine base
    * hash (`('0x' || substr(md5(x),1,8))::BIGINT` on the DuckDB side).
    * Computed via the codegen'd [[graft.functions.Md5Prefix64]] (one digest,
    * two bit ops) instead of md5→hex→conv×2 — bit-identical values, no
    * 32-char string materialization per shingle on the signature hot path. */
  private def md5Halves(src: Column): (Column, Column) =
    graft.functions.GraftFunctions.md5_halves(src)

  /** MinHash signature per doc: element k = min over shingles of permutation
    * k of the shingle's md5. The md5 is computed ONCE per shingle; the 64
    * permutations are fused multiply-adds in one codegen'd `array(...)`
    * constructor (a `transform(sequence(...))` lambda evaluates interpreted).
    * The fold is the custom [[graft.functions.ArrayLongFold]] aggregate
    * (single primitive-array buffer — 64 separate min() columns blow the
    * codegen method limit and fall back to interpreted aggregation, ~5x
    * slower at bench scale). Map-side partial fold still applies, so the
    * shuffle carries one 64-long array per (partition, doc).
    *
    * No shingle distinct: `min` over permuted hashes is duplicate-
    * insensitive, so deduplicating first only changes COST — and its cost
    * is a full shuffle of shingle text, vs. re-hashing duplicate shingles
    * map-side. The entire signature stage is one narrow pass + one
    * signature-array shuffle; the oracle keeps its DISTINCT (same min). */
  private def minhashSignatures(docs: DataFrame): DataFrame = {
    val (lo, hi) = md5Halves(col("sh"))
    shingles(docs, dedup = false)
      .select(col("doc_id"), lo.as("lo"), hi.as("hi"))
      .groupBy("doc_id")
      // fused fold: the 64 permutations run INSIDE the aggregate update —
      // no 64-long ArrayData per shingle (see MinHashFold; same values as
      // the array(...)+arrayMinAgg composition, cross-checked in its spec)
      .agg(graft.functions.MinHashFold
        .minhashFold(col("lo"), col("hi"), PermA, PermB, PermC, P61).as("sig"))
  }

  /** MinHash + LSH banding near-dup candidates, verified by signature
    * agreement.
    *
    * Pipeline: signature → explode 16 bands (band key = md5 hex of the
    * band's 4 signature slots joined with commas — a string key both
    * engines render identically) → self-join on (band index, band key) →
    * distinct candidate pairs → estimated jaccard = fraction of agreeing
    * signature positions, keep agreement ≥ 32/64 (integer compare; the
    * reported ratio is int/64 → identical doubles). At 100 TB the shuffle
    * moves only signatures and band digests, never documents. */
  val q22 = Q(
    "q22_dedup_minhash",
    (s, dir) => {
      // Materialize cut (not cache): the signature table is referenced by 4
      // downstream branches (bands, okBuckets, both sides of the est join);
      // with a lazy cache each branch re-plans + re-codegens the whole
      // shingle pipeline. The checkpoint truncates lineage at a table of
      // n_docs × 64 longs — tiny at any corpus size.
      val sigs = minhashSignatures(documents(s, dir)).materialized
      // Band key = md5_128 of the SAME comma-joined slot string the hex
      // form hashed, kept as two longs: bijective with the hex string, so
      // the bucket partition (and thus the candidate set) is provably
      // identical, while the band exchange + capped self-join carry
      // 16-byte primitive keys instead of 32-char strings (guide §2.3).
      // the pair struct rides the band struct whole (md5_pair, not two
      // inlined getFields): inside ONE explode(array(...)) expression
      // codegen cannot dedup equal subtrees, so the inlined form digested
      // every band twice — fields are read after the explode instead
      val bands = sigs.select(
        col("doc_id"),
        explode(array((0 until Bands).map { b =>
          val slotStr = concat_ws(",",
            (0 until 4).map(r => element_at(col("sig"), b * 4 + r + 1)): _*)
          struct(lit(b).as("band"),
            graft.functions.GraftFunctions.md5_pair(slotStr).as("p"))
        }: _*)).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"),
          col("bb.p.h1").as("bh1"), col("bb.p.h2").as("bh2"))
      // Over-full bucket guard — see q23's BucketCap note. No broadcast
      // hint: the qualifying-bucket list grows with the corpus, so the
      // join strategy is AQE's call (broadcasts while small, shuffles at
      // the scale where a forced broadcast would OOM the driver).
      val okBuckets = bands.groupBy("band", "bh1", "bh2")
        .agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") <= BucketCap && col("bsz") > 1)
        .select("band", "bh1", "bh2")
      val bounded = bands.join(okBuckets, Seq("band", "bh1", "bh2"))
      val cand = bounded.as("x")
        .join(bounded.as("y"),
          col("x.band") === col("y.band") && col("x.bh1") === col("y.bh1") &&
            col("x.bh2") === col("y.bh2") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
        .materialized // candidate set is small by construction (capped buckets)
      // positional agreement count as 64 codegen'd comparisons — an
      // aggregate(zip_with(...)) lambda evaluates interpreted and dominates
      // runtime once candidates number in the millions
      val agreement = (0 until MinhashK).map(i =>
        when(element_at(col("sa.sig"), i + 1) === element_at(col("sb.sig"), i + 1), 1)
          .otherwise(0)).reduce(_ + _)
      cand
        .join(sigs.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sigs.as("sb"), col("doc_b") === col("sb.doc_id"))
        .select(col("doc_a"), col("doc_b"), agreement.as("agree"))
        .filter(col("agree") * 2 >= MinhashK)
        .select(col("doc_a"), col("doc_b"),
          (col("agree").cast("double") / MinhashK).as("est_jaccard"))
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""
      WITH words AS (
        SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents),
      idx AS (
        SELECT doc_id, w, unnest(range(1, greatest(len(w) - 4, 1) + 1)) AS i
        FROM words),
      sh AS (
        SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS sh FROM idx),
      h AS (
        SELECT doc_id,
               ('0x' || substr(md5(sh), 1, 8))::BIGINT AS lo,
               ('0x' || substr(md5(sh), 9, 8))::BIGINT AS hi
        FROM sh),
      consts AS (
        SELECT unnest(range(0, $MinhashK)) AS i,
               unnest(${sqlList(PermA)}) AS pa,
               unnest(${sqlList(PermB)}) AS pb,
               unnest(${sqlList(PermC)}) AS pc),
      perm AS (
        SELECT doc_id, i, MIN((pa*lo + pb*hi + pc) % $P61) AS v
        FROM h CROSS JOIN consts GROUP BY doc_id, i),
      sig AS (SELECT doc_id, list(v ORDER BY i) AS sig FROM perm GROUP BY doc_id),
      bands AS (
        SELECT doc_id, b,
               md5(concat_ws(',', sig[b*4+1], sig[b*4+2], sig[b*4+3], sig[b*4+4])) AS bh
        FROM sig CROSS JOIN (SELECT unnest(range(0, $Bands)) AS b)),
      ok AS (SELECT b, bh FROM bands GROUP BY b, bh
             HAVING COUNT(*) <= $BucketCap AND COUNT(*) > 1),
      bounded AS (SELECT bands.* FROM bands JOIN ok USING (b, bh)),
      cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bounded x JOIN bounded y
          ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id),
      est AS (
        SELECT doc_a, doc_b,
               len(list_filter(range(1, ${MinhashK + 1}),
                               k -> sa.sig[k] = sb.sig[k])) AS agree
        FROM cand
        JOIN sig sa ON sa.doc_id = doc_a
        JOIN sig sb ON sb.doc_id = doc_b)
      SELECT doc_a, doc_b, CAST(agree AS DOUBLE) / $MinhashK AS est_jaccard
      FROM est WHERE agree * 2 >= $MinhashK
      ORDER BY doc_a, doc_b""")
  )

  /** SimHash near-dup: 64-bit signature by per-bit weighted vote over word
    * hashes, kept as two 32-bit halves (`sim_lo`, `sim_hi`) so every bit
    * test, shift, and xor stays on small positive BIGINTs in both engines
    * (bit 63 of a single 64-bit value would need Java's wrapping `1L<<63`,
    * which DuckDB rejects). Candidates come from banding the signature into
    * 4×16-bit chunks (two fingerprints within Hamming distance 3 must share
    * at least one chunk); verified with bit_count(xor) ≤ 3. */
  val q23 = Q(
    "q23_dedup_simhash",
    (s, dir) => {
      val (lo, hi) = md5Halves(col("word"))
      val words = documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("word"))
        .select(col("doc_id"), lo.as("lo"), hi.as("hi"))
      // per-word ±1 bit votes folded per doc INSIDE the fused aggregate
      // (SimHashFold — no 64-long vote array per word; integer sums
      // commute so values are identical to the projection+sum composition,
      // cross-checked in MinHashFoldSpec); sign of each vote → signature
      // bit. Half assembly = 32 codegen'd when-sums per half (HOF lambdas
      // are interpreted).
      def half(base: Int): Column = (0 until 32).map(b =>
        when(element_at(col("v"), base + b + 1) > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _)
      val sigs = words
        .groupBy("doc_id")
        .agg(graft.functions.SimHashFold
          .simhashFold(col("lo"), col("hi")).as("v"))
        .select(col("doc_id"), half(0).as("sim_lo"), half(32).as("sim_hi"))
        .materialized // multi-branch reuse, see q22's sigs note
      val chunks = sigs.select(
        col("doc_id"), col("sim_lo"), col("sim_hi"),
        explode(array((0 until 4).map { c =>
          val src = if (c < 2) col("sim_lo") else col("sim_hi")
          struct(lit(c).as("chunk"),
            shiftright(src, (c % 2) * 16).bitwiseAND(lit(0xffffL)).as("ch"))
        }: _*)).as("cc"))
        .select(col("doc_id"), col("sim_lo"), col("sim_hi"),
          col("cc.chunk").as("chunk"), col("cc.ch").as("ch"))
      // Over-full bucket guard (standard LSH practice): a chunk value
      // shared by B docs contributes B^2/2 candidate pairs; on adversarial
      // or highly-repetitive corpora (like this tiny-vocabulary synthetic
      // one) a single hot bucket can go quadratic. Buckets above the cap
      // are SKIPPED — candidates lost there are still found via their
      // other 3 chunks unless those are also over-full. NOT silent: the
      // cap is part of the operator contract (recall/cost trade). No
      // broadcast hint on the bucket list — AQE's call (see q22).
      val okBuckets = chunks.groupBy("chunk", "ch")
        .agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") <= BucketCap && col("bsz") > 1)
        .select("chunk", "ch")
      val bounded = chunks.join(okBuckets, Seq("chunk", "ch"))
      bounded.as("x")
        .join(bounded.as("y"),
          col("x.chunk") === col("y.chunk") && col("x.ch") === col("y.ch") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          (bit_count(col("x.sim_lo").bitwiseXOR(col("y.sim_lo"))) +
            bit_count(col("x.sim_hi").bitwiseXOR(col("y.sim_hi"))))
            .cast("long").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""
      WITH words AS (
        SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS word
        FROM documents),
      h AS (
        SELECT doc_id,
               ('0x' || substr(md5(word), 1, 8))::BIGINT AS lo,
               ('0x' || substr(md5(word), 9, 8))::BIGINT AS hi
        FROM words),
      bits AS (
        SELECT doc_id, b,
               SUM(CASE WHEN ((CASE WHEN b < 32 THEN lo ELSE hi END)
                              >> (b % 32)) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM h CROSS JOIN (SELECT unnest(range(0, 64)) AS b)
        GROUP BY doc_id, b),
      sig AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN v > 0 AND b < 32
                             THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sim_lo,
               CAST(SUM(CASE WHEN v > 0 AND b >= 32
                             THEN (1::BIGINT << (b - 32)) ELSE 0 END) AS BIGINT) AS sim_hi
        FROM bits GROUP BY doc_id),
      chunks AS (
        SELECT doc_id, sim_lo, sim_hi, c,
               CASE c WHEN 0 THEN sim_lo & 65535
                      WHEN 1 THEN (sim_lo >> 16) & 65535
                      WHEN 2 THEN sim_hi & 65535
                      ELSE (sim_hi >> 16) & 65535 END AS ch
        FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS c)),
      ok AS (SELECT c, ch FROM chunks GROUP BY c, ch
             HAVING COUNT(*) <= $BucketCap AND COUNT(*) > 1),
      bounded AS (SELECT chunks.* FROM chunks JOIN ok USING (c, ch)),
      pairs AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
               CAST(bit_count(xor(x.sim_lo, y.sim_lo)) +
                    bit_count(xor(x.sim_hi, y.sim_hi)) AS BIGINT) AS hamming
        FROM bounded x JOIN bounded y
          ON x.c = y.c AND x.ch = y.ch AND x.doc_id < y.doc_id)
      SELECT doc_a, doc_b, hamming FROM pairs
      WHERE hamming <= 3 ORDER BY doc_a, doc_b""")
  )

  /** Connected components of the q21 Jaccard-pair graph by iterative
    * min-label propagation (the Pregel formulation) — shared by q24
    * (cluster resolution) and q88 (canonical selection). Returns
    * (doc_id, cluster) where cluster = the component's min doc_id.
    * Each round is one shuffle of (node, label) pairs — label tables,
    * never documents — plus a driver-side convergence count; the
    * materialize cut truncates per-round lineage growth. */
  private def jaccardComponents(docs: DataFrame): DataFrame =
    jaccardComponentsOf(docs, jaccardPairs(docs))

  /** [[jaccardComponents]] over a caller-supplied pair table — for queries
    * that consume BOTH the components and the pairs (q141): the caller
    * materializes `jaccardPairs` once and feeds both consumers, instead of
    * running the whole shingle→digest→prefix-join pipeline twice inside
    * one query (r15 pass; within-query plan reuse, the q22-sigs
    * discipline — nothing is shared ACROSS queries). */
  private def jaccardComponentsOf(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    // The loop-invariant edge table materializes PRE-PARTITIONED AND
    // PRE-SORTED on dst — its per-round join key (r16 pass, guide §2.4):
    // the checkpoint cut preserves outputPartitioning/outputOrdering, so
    // every round's sym ⋈ labels sort-merge join reads sym exchange-free
    // and sort-free; only the (changing) label table moves per round.
    // One up-front exchange+sort, amortized over all rounds.
    val sym = edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("dst")).sortWithinPartitions("dst")
      .materialized
    // The propagation loop runs over EDGE-TOUCHED nodes only: a doc with
    // no similarity edge can neither receive a lower label (no incoming
    // edge) nor lower anyone else's (no outgoing edge), so its label is
    // its own id at every round — carrying those rows through every
    // round's join + checkpoint + convergence count shuffled the whole
    // corpus per round for rows that never change (guide §2.3 "shuffle
    // fewer bytes"). Isolated docs re-enter as their own singleton
    // cluster in the left-join read-off; the fixpoint is unchanged.
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node")).materialized
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 50) {
      val next = labelPropRound(sym, labels).materialized
      changed = next.filter(col("nxt") < col("lbl")).count()
      labels = next.select(col("node"), col("nxt").as("lbl"))
      rounds += 1
    }
    docs.select(col("doc_id"))
      .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("cluster"))
  }

  /** One min-label-propagation round, factored out so its plan shape is
    * pinnable by PlanRegressionSpec: per round the only exchanges are on
    * the 8-byte node-id keys (dst/node, src) — a regression that adds an
    * exchange or flips a join to a nested loop multiplies the whole
    * loop's cost by the round count. */
  private[graft] def labelPropRound(sym: DataFrame, labels: DataFrame): DataFrame = {
    val nbrMin = sym.join(labels, col("dst") === col("node"))
      .groupBy(col("src")).agg(min(col("lbl")).as("nlbl"))
    labels.join(nbrMin, col("node") === col("src"), "left")
      .select(col("node"), col("lbl"),
        least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("nxt"))
  }

  /** Duplicate-CLUSTER resolution — the step real dedup pipelines run after
    * pair generation (q21/q22/q23 emit pairs; training-data dedup must pick
    * ONE survivor per connected component of the pair graph, not per pair —
    * A~B, B~C must retire both B and C even though (A,C) was never emitted).
    *
    * Connected components by iterative min-label propagation (the Pregel
    * formulation): every doc starts labeled with its own id; each round a
    * doc takes the min of its label and its neighbors' labels; at fixpoint
    * the label is the component's min doc_id = the canonical survivor.
    * Rounds needed = graph diameter, and near-dup components are
    * short-diameter in practice (cliques-ish); for adversarially long path
    * graphs the alternating large-star/small-star variant (Kiveris et al.,
    * "Connected Components in MapReduce", SoCC'14) drops rounds to
    * O(log d) with the same join-per-round shape. Each round is one
    * shuffle of (node, label) pairs — label tables, never documents — plus
    * a Pregel-style driver-side convergence count; the materialize cut
    * truncates the per-round lineage growth.
    *
    * Edge set: q21's thresholded Jaccard pairs (shared code path).
    * Output: every doc with its cluster id, cluster size, and survivor
    * flag. The DuckDB oracle computes the same fixpoint with a recursive
    * reachability CTE — iteration counts differ, fixpoints cannot. */
  /** q24's oracle — the recursive-reachability ground truth for connected
    * components of the Jaccard-pair graph. Shared VERBATIM by q90: two
    * different distributed CC algorithms, one fixpoint, both hash-proven
    * against the same CTE. */
  private val ComponentsOracleSql = s"""
      WITH RECURSIVE $JaccardPairsSql,
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM jp
        UNION ALL
        SELECT doc_b, doc_a FROM jp),
      reach(src, node) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.node),
      comp AS (
        SELECT src AS doc_id, MIN(node) AS cluster FROM reach GROUP BY src),
      sizes AS (
        SELECT cluster, COUNT(*) AS cluster_size FROM comp GROUP BY cluster)
      SELECT doc_id, cluster, cluster_size,
             CASE WHEN doc_id = cluster THEN 1 ELSE 0 END AS is_survivor
      FROM comp JOIN sizes USING (cluster)
      ORDER BY doc_id"""

  val q24 = Q(
    "q24_dedup_clusters",
    (s, dir) => {
      val docs = documents(s, dir)
      val comp = jaccardComponents(docs)
      val sizes = comp.groupBy("cluster")
        .agg(count(lit(1)).as("cluster_size"))
      comp.join(sizes, "cluster")
        .select(col("doc_id"), col("cluster"), col("cluster_size"),
          when(col("doc_id") === col("cluster"), 1).otherwise(0)
            .as("is_survivor"))
        .orderBy("doc_id")
    },
    Some(ComponentsOracleSql)
  )

  /** Connected components by ALTERNATING LARGE-STAR / SMALL-STAR (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
    * the O(log d)-round alternative to q24's min-label propagation, whose
    * round count is the component DIAMETER. Near-dup clusters are usually
    * clique-ish (diameter ≤ 3, q24 wins on constant factors), but one
    * adversarial chain of pairwise-similar documents — boilerplate that
    * drifts one clause per page — gives q24 a thousand rounds where this
    * converges in ~10. Both run here; both hash-match the SAME recursive-
    * reachability oracle, so algorithmic equivalence is machine-checked,
    * not argued.
    *
    *  - large-star(u): every neighbor v > u re-attaches to
    *    m = min(N(u) ∪ {u});
    *  - small-star(u), edges oriented hi→lo: hi and every lo re-attach
    *    to the minimum neighbor.
    *
    * Each half-round is ONE groupBy over the edge table (8-byte node
    * ids, never documents) + a distinct; convergence = symmetric
    * difference empty. At the fixpoint every node points straight at its
    * component minimum — no propagation chain, which is also why the
    * final label read-off is a single groupBy. */
  /** The alternating star loop over an (hi, lo)-oriented edge table.
    * Returns ((node, cluster) labels for every node in `nodes`, rounds
    * taken). Exposed for the adversarial path-graph spec. */
  private[graft] def twoStarComponents(
      nodes: DataFrame, edges0: DataFrame): (DataFrame, Int) = {
    var edges = edges0.distinct().materialized
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 50) {
      val sym = edges.select(col("hi").as("u"), col("lo").as("v"))
        .union(edges.select(col("lo").as("u"), col("hi").as("v")))
      // r16 round restructure — same SETS per round (so the same rounds
      // and the same fixpoint; the oracle re-proves it), fewer passes:
      //  - each half-star's min now rides ONE window exchange on its key
      //    instead of groupBy + join-back, which shuffled the edge table
      //    TWICE per half-star (once into the partial agg, once into the
      //    join) — the window's full-partition min is the same value;
      //  - large's intermediate distinct is dropped: the small-star
      //    window min is duplicate-insensitive and the final distinct
      //    dedups (its partial aggregation thins duplicates map-side);
      //  - the two star-output branches emit in ONE pass over withM via
      //    a 1-or-2-element explode — the union form re-derived the
      //    whole star join once per branch.
      val large = sym
        .withColumn("m",
          least(col("u"), min(col("v")).over(Window.partitionBy("u"))))
        .filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
      val withM = large
        .withColumn("m", min(col("lo")).over(Window.partitionBy("hi")))
      val next = withM
        .select(explode(when(col("lo") =!= col("m"),
            array(struct(col("hi"), col("m").as("lo")),
              struct(col("lo").as("hi"), col("m").as("lo"))))
          .otherwise(array(struct(col("hi"), col("m").as("lo"))))).as("e"))
        .select(col("e.hi").as("hi"), col("e.lo").as("lo"))
        .filter(col("hi") > col("lo"))
        .distinct()
        .materialized
      // Symmetric difference in ONE counted aggregate instead of two
      // except subtrees (each of which is itself a shuffle over both
      // tables — 4 edge-table exchanges per round for a boolean): both
      // sides are distinct sets, so tagging ±1 and summing per (hi, lo)
      // leaves non-zero exactly on rows in one side only. Only the
      // emptiness of the difference is consumed, so the stop condition
      // is identical.
      changed = next.select(col("hi"), col("lo"), lit(1L).as("w"))
        .union(edges.select(col("hi"), col("lo"), lit(-1L).as("w")))
        .groupBy("hi", "lo").agg(sum(col("w")).as("s"))
        .filter(col("s") =!= 0L).count()
      edges = next
      rounds += 1
    }
    val lbl = edges.groupBy(col("hi").as("node")).agg(min(col("lo")).as("lbl"))
    val labels = nodes
      .join(lbl, nodes("doc_id") === lbl("node"), "left")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("cluster"))
    (labels, rounds)
  }

  val q90 = Q(
    "q90_cc_twostar",
    (s, dir) => {
      val docs = documents(s, dir)
      val edges = jaccardPairs(docs)
        .select(col("doc_b").as("hi"), col("doc_a").as("lo"))
      val (comp, _) = twoStarComponents(docs.select(col("doc_id")), edges)
      val sizes = comp.groupBy("cluster")
        .agg(count(lit(1)).as("cluster_size"))
      comp.join(sizes, "cluster")
        .select(col("doc_id"), col("cluster"), col("cluster_size"),
          when(col("doc_id") === col("cluster"), 1).otherwise(0)
            .as("is_survivor"))
        .orderBy("doc_id")
    },
    Some(ComponentsOracleSql)
  )

  /** Maximal duplicated-span LENGTH per document, by binary lifting over
    * token digests — the power-of-two resolution of the Lee et al. 2021
    * suffix-array signal ("remove substrings ≥ 50 tokens that appear
    * elsewhere"). q26 reports the FRACTION of duplicated fixed-8-gram
    * positions; this reports HOW LONG the longest verbatim cross-doc run
    * is (to the nearest power of two, spans 1..64): level-0 digests hash
    * single tokens, and level k at position i combines level k−1 at i and
    * i+2^(k−1) — so one digest covers a 2^k-token span, and SEVEN map-side
    * array transforms cover every span length a 104-token doc can hold.
    * A doc's answer is the largest 2^k any of whose spans appears in ≥ 2
    * distinct documents (within-doc repeats don't count — DISTINCT
    * (doc, digest) before the count, matching Lee et al.'s "elsewhere").
    *
    * Why not suffix arrays: they need a global sort of every suffix and
    * don't shard; this is ONE per-row codegen'd expression
    * ([[graft.functions.SpanDigests]] — all seven levels in a linear
    * loop; the chained-`transform` formulation exploded exponentially
    * under projection collapse, see its scaladoc) + ONE digest-keyed
    * exchange. Doubling redundancy vs a suffix array is len × 7 digests
    * — the price of embarrassing parallelism, and the factor-2 length
    * resolution is exactly what a log-bucketed filter needs.
    *
    * Round-11 plan cut (4 corpus-sized exchanges → 1 + a filtered tail):
    * the expression now emits per-document-DISTINCT truncated digests
    * (the `.distinct()` exchange was pure overhead — "appears elsewhere"
    * counts documents, and the dedup is a per-row hash set at emit), and
    * the dup-set groupBy + join-back pair collapses into ONE
    * count-over-window on the (span, d) partition: every occurrence row
    * learns its document count in the same exchange that would have fed
    * the groupBy, and only rows with n ≥ 2 (the duplicated sliver)
    * continue to the per-doc max aggregate. */
  val q91 = Q(
    "q91_max_dup_span",
    (s, dir) => {
      val docs = documents(s, dir)
      val spans = docs.select(col("doc_id"),
        explode(graft.functions.SpanDigests.span_digests(
          filter(split(col("text"), "\\s+"), x => length(x) > 0))).as("sd"))
        .select(col("doc_id"), col("sd.span").as("span"), col("sd.d").as("d"))
      // rows are distinct per (doc, span, d) by construction, so the
      // per-(span, d) count IS the document count
      val perDoc = spans
        .withColumn("n", count(lit(1)).over(Window.partitionBy("span", "d")))
        .filter(col("n") >= 2)
        .groupBy("doc_id").agg(max(col("span")).as("max_dup_span"))
      docs.select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("max_dup_span"), lit(0L)).as("max_dup_span"))
        .orderBy("doc_id")
    },
    Some("""
      WITH h0 AS (
        SELECT doc_id,
               list_transform(
                 list_filter(string_split_regex(text, '\s+'),
                             x -> length(x) > 0),
                 x -> md5(x)) AS h
        FROM documents),
      h1 AS (SELECT doc_id, CASE WHEN len(h) > 1 THEN
               list_transform(range(1, len(h) - 0), i -> md5(h[i] || h[i+1]))
             ELSE [] END AS h FROM h0),
      h2 AS (SELECT doc_id, CASE WHEN len(h) > 2 THEN
               list_transform(range(1, len(h) - 1), i -> md5(h[i] || h[i+2]))
             ELSE [] END AS h FROM h1),
      h3 AS (SELECT doc_id, CASE WHEN len(h) > 4 THEN
               list_transform(range(1, len(h) - 3), i -> md5(h[i] || h[i+4]))
             ELSE [] END AS h FROM h2),
      h4 AS (SELECT doc_id, CASE WHEN len(h) > 8 THEN
               list_transform(range(1, len(h) - 7), i -> md5(h[i] || h[i+8]))
             ELSE [] END AS h FROM h3),
      h5 AS (SELECT doc_id, CASE WHEN len(h) > 16 THEN
               list_transform(range(1, len(h) - 15), i -> md5(h[i] || h[i+16]))
             ELSE [] END AS h FROM h4),
      h6 AS (SELECT doc_id, CASE WHEN len(h) > 32 THEN
               list_transform(range(1, len(h) - 31), i -> md5(h[i] || h[i+32]))
             ELSE [] END AS h FROM h5),
      spans AS (
        SELECT DISTINCT doc_id, span, substr(d, 1, 16) AS d FROM (
          SELECT doc_id, 1::BIGINT AS span, unnest(h) AS d FROM h0
          UNION ALL
          SELECT doc_id, 2::BIGINT, unnest(h) FROM h1
          UNION ALL
          SELECT doc_id, 4::BIGINT, unnest(h) FROM h2
          UNION ALL
          SELECT doc_id, 8::BIGINT, unnest(h) FROM h3
          UNION ALL
          SELECT doc_id, 16::BIGINT, unnest(h) FROM h4
          UNION ALL
          SELECT doc_id, 32::BIGINT, unnest(h) FROM h5
          UNION ALL
          SELECT doc_id, 64::BIGINT, unnest(h) FROM h6)),
      dup AS (
        SELECT span, d FROM spans GROUP BY span, d HAVING COUNT(*) >= 2),
      per_doc AS (
        SELECT doc_id, MAX(span) AS max_dup_span
        FROM spans JOIN dup USING (span, d) GROUP BY doc_id)
      SELECT d.doc_id, COALESCE(p.max_dup_span, 0) AS max_dup_span
      FROM documents d LEFT JOIN per_doc p USING (doc_id)
      ORDER BY d.doc_id""")
  )

  /** Canonical-document selection within duplicate clusters — the KEEP
    * policy real curation pipelines (CCNet, RefinedWeb) apply after
    * clustering: q24 keeps the min-doc_id member, but production dedup
    * keeps the BEST member — here the one with the most tokens (longest
    * content), ties to the smallest doc_id. Every document is emitted
    * with its cluster, its token count, the chosen canonical doc, and a
    * keep/drop action; singleton clusters trivially keep themselves.
    *
    * Scale shape: components from the shared min-label propagation
    * (label tables only cross the shuffle); the token count is a map-side
    * scalar per doc; the argmax is one window per cluster over
    * (doc, tokens) rows — cluster-sized groups, no text movement. */
  val q88 = Q(
    "q88_canonical_select",
    (s, dir) => {
      val docs = documents(s, dir)
      val toks = docs.select(col("doc_id"),
        size(filter(split(col("text"), "\\s+"),
          x => length(x) > 0)).cast("long").as("n_tokens"))
      val ranked = jaccardComponents(docs)
        .join(toks, "doc_id")
        .withColumn("rk", row_number().over(Window.partitionBy("cluster")
          .orderBy(col("n_tokens").desc, col("doc_id"))))
      val canon = ranked.filter(col("rk") === 1)
        .select(col("cluster"), col("doc_id").as("canonical"))
      ranked
        .join(canon, "cluster")
        .select(col("doc_id"), col("cluster"), col("n_tokens"),
          col("canonical"),
          when(col("doc_id") === col("canonical"), lit("keep"))
            .otherwise(lit("drop")).as("action"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH RECURSIVE $JaccardPairsSql,
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM jp
        UNION ALL
        SELECT doc_b, doc_a FROM jp),
      reach(src, node) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.node),
      comp AS (
        SELECT src AS doc_id, MIN(node) AS cluster FROM reach GROUP BY src),
      toks AS (
        SELECT doc_id,
               len(list_filter(string_split_regex(text, '\\s+'),
                               x -> length(x) > 0))::BIGINT AS n_tokens
        FROM documents),
      ranked AS (
        SELECT comp.doc_id, cluster, n_tokens,
               ROW_NUMBER() OVER (PARTITION BY cluster
                 ORDER BY n_tokens DESC, comp.doc_id) AS rk
        FROM comp JOIN toks ON comp.doc_id = toks.doc_id),
      canon AS (
        SELECT cluster, doc_id AS canonical FROM ranked WHERE rk = 1)
      SELECT doc_id, cluster, n_tokens, canonical,
             CASE WHEN doc_id = canonical THEN 'keep' ELSE 'drop' END
               AS action
      FROM ranked JOIN canon USING (cluster)
      ORDER BY doc_id""")
  )

  /** Duplicated-span coverage — the substring-level dedup signal of Lee et
    * al. 2021 ("Deduplicating Training Data Makes Language Models Better"),
    * which removes exact substrings ≥50 tokens found elsewhere in the
    * corpus via suffix arrays. Suffix arrays don't distribute; the
    * Spark-native equivalent signal: for each doc, the fraction of its
    * distinct 8-word spans that appear VERBATIM in at least one other
    * document. Distinct roles vs neighbors: q21/q22 score whole-document
    * pair similarity, q25 measures WITHIN-doc repetition, q38 measures
    * overlap against a held-out set — this measures cross-doc verbatim
    * span duplication corpus-wide.
    *
    * Scale shape: spans reduce to md5 digests immediately (32-byte keys,
    * never text — q20's key discipline); the duplicated-span set is one
    * wordcount-shaped groupBy on the digest; per-doc totals and hits are
    * map-side-combined counts; a left join restores zero-dup docs. */
  val q26 = Q(
    "q26_dup_spans",
    (s, dir) => {
      val sh8 = shingleDigests(documents(s, dir), nWords = 8)
        .materialized // three consumers: dup set, totals, hits
      val dup = sh8.groupBy("h1", "h2")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") > 1)
        .select("h1", "h2")
      val totals = sh8.groupBy("doc_id").agg(count(lit(1)).as("n_spans"))
      val hits = sh8.join(dup, Seq("h1", "h2"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
      totals.join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_spans"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup"))
        .withColumn("dup_frac", col("n_dup").cast("double") / col("n_spans"))
        .orderBy("doc_id")
    },
    Some("""
      WITH words AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      idx AS (
        SELECT doc_id, w, unnest(range(1, greatest(len(w) - 7, 1) + 1)) AS i
        FROM words),
      sh8 AS (
        SELECT DISTINCT doc_id, md5(array_to_string(w[i:i+7], ' ')) AS h
        FROM idx),
      dup AS (SELECT h FROM sh8 GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1),
      totals AS (SELECT doc_id, COUNT(*) AS n_spans FROM sh8 GROUP BY doc_id),
      hits AS (SELECT doc_id, COUNT(*) AS n_dup FROM sh8 JOIN dup USING (h)
               GROUP BY doc_id)
      SELECT doc_id, n_spans, COALESCE(n_dup, 0) AS n_dup,
             CAST(COALESCE(n_dup, 0) AS DOUBLE) / n_spans AS dup_frac
      FROM totals LEFT JOIN hits USING (doc_id)
      ORDER BY doc_id""")
  )

  /** Benchmark-contamination check — the decontamination primitive of a
    * training pipeline (filter training docs that leak evaluation data;
    * e.g. GPT-3 App. C, PaLM §7). Held-out set here = docs with
    * `doc_id % 101 = 0`; a training doc is contaminated to the degree its
    * 8-word shingles appear anywhere in the held-out set.
    *
    * Scale shape: both sides reduce to DISTINCT md5 digests of shingles —
    * the overlap join carries 32-byte hashes, never text, exactly like
    * q20's exact-dedup key discipline. The benchmark side is usually small
    * but grows with the eval suite — no broadcast hint, AQE decides (the
    * q22 okBuckets lesson). Per-doc totals come from a map-side-combined
    * count; contaminated counts from the join; a left join restores
    * zero-overlap docs. */
  val q38 = Q(
    "q38_contamination",
    (s, dir) => {
      val sh8 = shingleDigests(documents(s, dir), nWords = 8)
        .materialized // two branches (bench set + training side)
      val bench = sh8.filter(col("doc_id") % 101 === 0)
        .select("h1", "h2").distinct()
      val train = sh8.filter(col("doc_id") % 101 =!= 0)
      val totals = train.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      val hits = train.join(bench, Seq("h1", "h2"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
      totals.join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
        .withColumn("contamination",
          col("n_contaminated").cast("double") / col("n_grams"))
        .orderBy("doc_id")
    },
    Some("""
      WITH words AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      idx AS (
        SELECT doc_id, w, unnest(range(1, greatest(len(w) - 7, 1) + 1)) AS i
        FROM words),
      sh8 AS (
        SELECT DISTINCT doc_id, md5(array_to_string(w[i:i+7], ' ')) AS h
        FROM idx),
      bench AS (SELECT DISTINCT h FROM sh8 WHERE doc_id % 101 = 0),
      train AS (SELECT * FROM sh8 WHERE doc_id % 101 <> 0),
      totals AS (SELECT doc_id, COUNT(*) AS n_grams FROM train GROUP BY doc_id),
      hits AS (
        SELECT doc_id, COUNT(*) AS n_contaminated
        FROM train JOIN bench USING (h) GROUP BY doc_id)
      SELECT doc_id, n_grams,
             COALESCE(n_contaminated, 0) AS n_contaminated,
             CAST(COALESCE(n_contaminated, 0) AS DOUBLE) / n_grams
               AS contamination
      FROM totals LEFT JOIN hits USING (doc_id)
      ORDER BY doc_id""")
  )

  /** Content-defined chunking dedup signal — the rsync/LBFS/storage-dedup
    * primitive: chunk boundaries are set where a rolling content hash
    * satisfies `h % 64 == 0`, so boundaries are a function of CONTENT, not
    * position. An insertion early in a document shifts every fixed-window
    * span (q26's signal degrades) but re-synchronizes CDC chunks after one
    * boundary — the property that makes CDC the standard for dedup of
    * edited/shifted content. Expected chunk length = 64 windows.
    *
    * Chunk identity = the (n_windows, min, sum) triple of the chunk's
    * window hashes — order-independent, integer-exact, equality-joinable
    * in both engines (a fp collision needs all three to agree). Output per
    * doc: chunk count + how many of its chunks appear verbatim in another
    * doc.
    *
    * Scale shape: the boundary cumsum is one exchange keyed doc_id with an
    * in-partition sort (a doc's windows fit one task — q16's accepted
    * bound); chunk aggregation and the dup-triple join shuffle only small
    * integer keys, never text. */
  /** The CDC chunk table for any (doc_id, text) frame: one row per chunk
    * with its (n_windows, fp_min, fp_sum) identity triple. Shared by q71
    * and the resync property test. */
  private[graft] def cdcChunks(docs: DataFrame): DataFrame = {
    val win = Window.partitionBy("doc_id").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), split(col("text"), "\\s+").as("w"))
      .select(col("doc_id"),
        explode(expr("sequence(1, greatest(size(w) - 7, 1))")).as("i"),
        col("w"))
      .select(col("doc_id"), col("i"),
        graft.functions.GraftFunctions
          .md5_halves(expr("array_join(slice(w, i, 8), ' ')"))._1.as("h"))
      .withColumn("b", when(col("h") % 64 === 0, 1L).otherwise(0L))
      .withColumn("chunk_id", sum(col("b")).over(win))
      .groupBy("doc_id", "chunk_id")
      .agg(count(lit(1)).as("n_windows"),
        min(col("h")).as("fp_min"), sum(col("h")).as("fp_sum"))
  }

  val q71 = Q(
    "q71_cdc_chunks",
    (s, dir) => {
      val chunks = cdcChunks(documents(s, dir))
        .materialized // two consumers: dup-triple set + per-doc stats
      val dup = chunks.groupBy("n_windows", "fp_min", "fp_sum")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") > 1)
        .select("n_windows", "fp_min", "fp_sum")
      val dups = chunks
        .join(dup, Seq("n_windows", "fp_min", "fp_sum"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_dup_chunks"))
      chunks.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
        .join(dups, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chunks"),
          coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"))
        .withColumn("dup_frac",
          col("n_dup_chunks").cast("double") / col("n_chunks"))
        .orderBy("doc_id")
    },
    Some("""
      WITH words AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      idx AS (
        SELECT doc_id, w, unnest(range(1, greatest(len(w) - 7, 1) + 1)) AS i
        FROM words),
      wh AS (
        SELECT doc_id, i,
               CAST(('0x' || substr(md5(array_to_string(w[i:i+7], ' ')), 1, 8))
                    AS BIGINT) AS h
        FROM idx),
      chunks AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN h % 64 = 0 THEN 1 ELSE 0 END) OVER (
                 PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS chunk_id,
               h
        FROM wh),
      agg AS (
        SELECT doc_id, chunk_id, COUNT(*) AS n_windows,
               MIN(h) AS fp_min, CAST(SUM(h) AS BIGINT) AS fp_sum
        FROM chunks GROUP BY doc_id, chunk_id),
      dup AS (
        SELECT n_windows, fp_min, fp_sum FROM agg
        GROUP BY n_windows, fp_min, fp_sum
        HAVING COUNT(DISTINCT doc_id) > 1),
      dups AS (
        SELECT doc_id, COUNT(*) AS n_dup_chunks
        FROM agg SEMI JOIN dup USING (n_windows, fp_min, fp_sum)
        GROUP BY doc_id),
      totals AS (
        SELECT doc_id, COUNT(*) AS n_chunks FROM agg GROUP BY doc_id)
      SELECT doc_id, n_chunks,
             COALESCE(n_dup_chunks, 0) AS n_dup_chunks,
             CAST(COALESCE(n_dup_chunks, 0) AS DOUBLE) / n_chunks AS dup_frac
      FROM totals LEFT JOIN dups USING (doc_id)
      ORDER BY doc_id""")
  )

  /** Edit-distance near-dup — the character-level verifier family (vs
    * q21's set-overlap Jaccard): candidate pairs from shared-shingle
    * blocking are CONFIRMED duplicates iff `levenshtein(a, b) <= 6`.
    * Edit distance catches what shingle-set similarity scores loosely
    * (transpositions, small in-word edits) and is the verifier of
    * record in entity-resolution pipelines (PassJoin, Li et al. VLDB'11,
    * uses pigeonhole substring blocking for the same verify step).
    *
    * Scale shape: blocking shuffles (doc_id, digest) pairs only; document
    * text is joined back solely for the candidate pairs (narrow re-joins
    * on doc_id at candidate cardinality ≪ corpus, q20's key discipline).
    * The length prefilter |n_chars_a − n_chars_b| ≤ d is a free implied
    * bound (edit distance ≥ length difference) applied before any text
    * ships. Verification uses Spark's THRESHOLDED levenshtein — banded
    * O(n·d) DP that bails at distance > d and returns −1, not the O(n²)
    * full matrix; kept rows carry the exact distance, so the oracle's
    * unbounded levenshtein agrees on every surviving pair.
    *
    * Recall is bounded by the blocking (a pair sharing no 8-word shingle
    * is never verified) — same documented trade as q22/q23's LSH banding;
    * the oracle replicates the identical blocking, so the hash check
    * proves the pipeline, not just the verifier. */
  val q74 = Q(
    "q74_dedup_editdist",
    (s, dir) => {
      val docs = documents(s, dir)
      // materialize cut: both sides of the blocking self-join read the
      // digest table — without it each side re-scans + re-shingles the
      // corpus (q22's multi-branch discipline)
      val sh8 = shingleDigests(docs, nWords = 8)
        .materialized
      val cand = sh8.as("a").join(sh8.as("b"),
          col("a.h1") === col("b.h1") && col("a.h2") === col("b.h2") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      // length prefilter on the NARROW (doc_id, n_chars) projection first:
      // document bodies join in only for pairs that survive it
      val meta = docs.select(col("doc_id"), col("n_chars"))
      val txt = docs.select(col("doc_id"), col("text"))
      cand
        .join(meta.as("ma"), col("doc_a") === col("ma.doc_id"))
        .join(meta.as("mb"), col("doc_b") === col("mb.doc_id"))
        .filter(abs(col("ma.n_chars") - col("mb.n_chars")) <= 6)
        .select(col("doc_a"), col("doc_b"))
        .join(txt.as("x"), col("doc_a") === col("x.doc_id"))
        .join(txt.as("y"), col("doc_b") === col("y.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          levenshtein(col("x.text"), col("y.text"), 6).as("edit_dist"))
        .filter(col("edit_dist").between(0, 6))
        .orderBy("doc_a", "doc_b")
    },
    Some("""
      WITH words AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      idx AS (
        SELECT doc_id, w, unnest(range(1, greatest(len(w) - 7, 1) + 1)) AS i
        FROM words),
      sh AS (
        SELECT DISTINCT doc_id, md5(array_to_string(w[i:i+7], ' ')) AS h
        FROM idx),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, levenshtein(x.text, y.text) AS edit_dist
      FROM cand
      JOIN documents x ON x.doc_id = doc_a
      JOIN documents y ON y.doc_id = doc_b
      WHERE abs(x.n_chars - y.n_chars) <= 6
        AND levenshtein(x.text, y.text) <= 6
      ORDER BY doc_a, doc_b""")
  )

  /** PPJoin-style exact set-similarity self-join via PREFIX FILTERING
    * (Xiao et al., WWW'08) — the exact-and-scalable candidate generator
    * between q21 (verify every shingle-sharing pair — complete but
    * floods) and q22 (LSH — scalable but approximate): under a global
    * token order (document frequency asc, digest asc), two sets with
    * Jaccard ≥ t MUST share a token within their first
    * `n − ceil(t·n) + 1` tokens, so indexing only those prefixes loses
    * NO qualifying pair. The full PPJoin filter stack runs as join
    * residuals on the hash-matched rows: LENGTH filter (j ≥ 3/5 forces
    * 10·min(n) ≥ 6·max(n)) and POSITIONAL filter (a token at df-order
    * rank rk_a/rk_b caps the remaining overlap at
    * 1 + min(n_a−rk_a, n_b−rk_b), which must reach the overlap floor
    * ceil(3(n_a+n_b)/8) implied by j ≥ 3/5) — both lossless: if the
    * pair qualifies, its FIRST shared token in global order passes both.
    * The oracle runs the NAIVE any-shared-shingle join — the hash check
    * proves the whole filter stack's completeness end-to-end, exactly
    * like q28/q29 prove the range-join rewrite.
    *
    * Scale shape: shingle identity is a 64-bit digest (8-byte shuffle
    * keys; text never moves); df and the per-doc rank/size come from
    * two window exchanges. Verification joins each surviving pair to a
    * per-doc SORTED DIGEST ARRAY and counts `array_intersect` inside
    * codegen — the candidate set is joined doc-wise (2 narrow joins),
    * never multiplied by per-doc shingle count the way an exploded
    * (pair × shingle) re-join would be. On a corpus whose token space
    * saturates (every shingle hot — the adversarial case for prefix
    * indexes), that exploded verify was the sf1 bottleneck: candidates
    * × ~50 shingle rows each ≈ 10⁸-row intermediate. The array verify
    * is |candidates| rows with an O(n_a+n_b) intersect per row.
    * Threshold compare is integer (inter·10 ≥ 6·union); the reported
    * jaccard is one int/int division (identical doubles). */
  val q76 = Q(
    "q76_ppjoin",
    (s, dir) => {
      // distinct AFTER the digest map (r15 pass, shingleDigests'
      // discipline): shingle identity in this pipeline is ALREADY the
      // 64-bit digest everywhere downstream (df, ranks, sizes, the sorted
      // arrays and the intersect all key on `h`), so deduping (doc_id, h)
      // computes the per-doc digest sets the pipeline declares — exactly,
      // MODULO an intra-document xxhash64 collision: two distinct shingles
      // of one doc colliding to one h previously yielded two (doc_id, h)
      // rows, now one (negligible probability, and the full-128-bit sites
      // elsewhere use md5_128 precisely to make this a bijection). The
      // dedup exchange carries 16-byte rows instead of 3-word shingle
      // TEXT (the single most expensive exchange here, guide §2.3)
      val sh3 = shingles(documents(s, dir), nWords = 3, dedup = false)
        .select(col("doc_id"), xxhash64(col("sh")).as("h"))
        .distinct()
        .materialized // consumers: ranking, per-doc array build
      // df and the per-doc rank/size via WINDOW counts: one exchange on h,
      // one on doc_id (rank + n share the doc_id partitioning) — vs the
      // groupBy-then-join-back form which pays the h shuffle twice and
      // adds a join
      val ranked = sh3
        .withColumn("df", count(lit(1)).over(Window.partitionBy("h")))
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("df"), col("h"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
      // ASYMMETRIC prefixes (PPJoin's self-join refinement): orient every
      // pair by (n, doc_id); the smaller side needs only its
      // 2t/(1+t)-prefix (t=3/5 ⇒ 3/4 ⇒ ~0.25·n tokens) because with
      // |x| ≤ |y| the overlap floor α = ⌈(3/8)(n_x+n_y)⌉ ≥ ⌈(3/4)·n_x⌉,
      // while the larger side keeps the t-prefix (α ≥ ⌈(3/5)·n_y⌉ given
      // the length filter). The simultaneous-prefix lemma then still
      // guarantees a shared token — lossless, with ~1.6× fewer postings
      // on the indexed side. On the saturated-vocab corpus (every token
      // hot) candidate volume is posting-product-bound, so the prefix
      // shrink cuts it directly.
      val probe = ranked // t-prefix: rk ≤ n − ⌈(3/5)n⌉ + 1
        .filter(expr("rk <= n - ((6 * n + 9) div 10) + 1"))
        .select("doc_id", "h", "rk", "n")
      val tight = ranked // 2t/(1+t)-prefix: rk ≤ n − ⌈(3/4)n⌉ + 1
        .filter(expr("rk <= n - ((3 * n + 3) div 4) + 1"))
        .select("doc_id", "h", "rk", "n")
      val cand = tight.as("a").join(probe.as("b"),
          col("a.h") === col("b.h")
            // orientation: a strictly precedes b in (n, doc_id) order
            && (col("a.n") < col("b.n") ||
                (col("a.n") === col("b.n") &&
                 col("a.doc_id") < col("b.doc_id")))
            // length filter: j >= 3/5 ⇒ sizes within [0.6x, x/0.6]
            && col("a.n") * 10 >= col("b.n") * 6
            // positional filter: overlap cap from this token's ranks must
            // reach the floor 8·inter ≥ 3·(n_a+n_b) implied by j ≥ 3/5
            && (lit(1) + least(col("a.n") - col("a.rk"),
                               col("b.n") - col("b.rk"))) * 8
               >= (col("a.n") + col("b.n")) * 3)
        .groupBy(
          least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
        .agg(
          max(when(col("a.doc_id") < col("b.doc_id"), col("a.n"))
            .otherwise(col("b.n"))).as("n_a"),
          max(when(col("a.doc_id") < col("b.doc_id"), col("b.n"))
            .otherwise(col("a.n"))).as("n_b"))
        .materialized // small by construction (filtered prefix postings)
      // per-doc sorted digest arrays: verification payload joins ONCE per
      // side per pair (narrow doc_id keys), intersect counted in codegen
      val docsArr = sh3.groupBy("doc_id")
        .agg(sort_array(collect_list(col("h"))).as("hs"))
        .materialized // consumers: both sides of the verify join
      cand
        .join(docsArr.as("da"), col("doc_a") === col("da.doc_id"))
        .join(docsArr.as("db"), col("doc_b") === col("db.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("da.hs"), col("db.hs"))).cast("long")
            .as("inter"),
          col("n_a"), col("n_b"))
        .filter(col("inter") * 10 >= (col("n_a") + col("n_b") - col("inter")) * 6)
        .withColumn("jaccard", col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")))
        .orderBy("doc_a", "doc_b")
    },
    Some("""
      WITH words AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      idx AS (
        SELECT doc_id, w, unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS i
        FROM words),
      sh AS (
        SELECT DISTINCT doc_id, md5(array_to_string(w[i:i+2], ' ')) AS h
        FROM idx),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      ov AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY doc_a, doc_b)
      SELECT doc_a, doc_b, inter, x.n AS n_a, y.n AS n_b,
             CAST(inter AS DOUBLE) / (x.n + y.n - inter) AS jaccard
      FROM ov JOIN sizes x ON x.doc_id = doc_a
              JOIN sizes y ON y.doc_id = doc_b
      WHERE inter * 10 >= (x.n + y.n - inter) * 6
      ORDER BY doc_a, doc_b""")
  )

  /** Incremental MinHash dedup: a NEW ingest batch deduplicated against
    * the EXISTING corpus — the
    * production shape for a continuously-fed training set, where a daily
    * batch probes a persisted corpus signature store instead of re-running
    * the all-pairs q22 pipeline over corpus+batch.
    *
    * The band join is ASYMMETRIC: batch bands are tiny next to the corpus,
    * so AQE broadcasts the batch side and the corpus bands are probed
    * map-side without shuffling. The corpus side of each bucket is capped
    * (BucketCap) so a degenerate band value bounds candidates at
    * BucketCap × batch-bucket-size rather than corpus × batch. Signatures
    * are pure per-doc functions, so computing them on the filtered sides
    * equals filtering a precomputed table — at 100 TB the corpus
    * signature/band tables are persisted artifacts (write once, probe per
    * batch; same reuse discipline as the q60 Bloom filter) and only the
    * batch recomputes per run. Output: best corpus match per batch doc
    * (max signature agreement, ties → smallest corpus doc_id). */
  val q82 = Q(
    "q82_incremental_dedup",
    (s, dir) => {
      val docs = documents(s, dir)
      // the "new batch" = a deterministic 20% slice (doc_id mod 5 = 3)
      // standing in for the day's ingest shard
      val isNew = col("doc_id") % 5 === 3
      val corpusSigs = minhashSignatures(docs.filter(!isNew)).materialized
      val batchSigs = minhashSignatures(docs.filter(isNew)).materialized
      // band key = md5_128 of the same slot string (q22's discipline):
      // identical buckets, 16-byte primitive keys end-to-end
      def bandsOf(sigs: DataFrame): DataFrame =
        sigs.select(
          col("doc_id"),
          explode(array((0 until Bands).map { b =>
            val slotStr = concat_ws(",",
              (0 until 4).map(r => element_at(col("sig"), b * 4 + r + 1)): _*)
            // pair struct whole — q22's one-digest-per-band discipline
            struct(lit(b).as("band"),
              graft.functions.GraftFunctions.md5_pair(slotStr).as("p"))
          }: _*)).as("bb"))
          .select(col("doc_id"), col("bb.band").as("band"),
            col("bb.p.h1").as("bh1"), col("bb.p.h2").as("bh2"))
      val corpusBands = bandsOf(corpusSigs)
      val batchBands = bandsOf(batchSigs)
      val okBuckets = corpusBands.groupBy("band", "bh1", "bh2")
        .agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") <= BucketCap)
        .select("band", "bh1", "bh2")
      val cand = corpusBands.join(okBuckets, Seq("band", "bh1", "bh2")).as("o")
        .join(batchBands.as("n"), Seq("band", "bh1", "bh2"))
        .select(col("o.doc_id").as("doc_old"), col("n.doc_id").as("doc_new"))
        .distinct()
      val agreement = (0 until MinhashK).map(i =>
        when(element_at(col("sa.sig"), i + 1) === element_at(col("sb.sig"), i + 1), 1)
          .otherwise(0)).reduce(_ + _)
      val est = cand
        .join(corpusSigs.as("sa"), col("doc_old") === col("sa.doc_id"))
        .join(batchSigs.as("sb"), col("doc_new") === col("sb.doc_id"))
        .select(col("doc_new"), col("doc_old"), agreement.as("agree"))
        .filter(col("agree") * 2 >= MinhashK)
      val w = Window.partitionBy("doc_new").orderBy(col("agree").desc, col("doc_old"))
      est.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_new"), col("doc_old"),
          (col("agree").cast("double") / MinhashK).as("est_jaccard"))
        .orderBy("doc_new")
    },
    Some(s"""
      WITH words AS (
        SELECT doc_id, doc_id % 5 = 3 AS is_new,
               string_split_regex(text, '\\s+') AS w FROM documents),
      idx AS (
        SELECT doc_id, is_new, w, unnest(range(1, greatest(len(w) - 4, 1) + 1)) AS i
        FROM words),
      sh AS (
        SELECT DISTINCT doc_id, is_new, array_to_string(w[i:i+4], ' ') AS sh FROM idx),
      h AS (
        SELECT doc_id, is_new,
               ('0x' || substr(md5(sh), 1, 8))::BIGINT AS lo,
               ('0x' || substr(md5(sh), 9, 8))::BIGINT AS hi
        FROM sh),
      consts AS (
        SELECT unnest(range(0, $MinhashK)) AS i,
               unnest(${sqlList(PermA)}) AS pa,
               unnest(${sqlList(PermB)}) AS pb,
               unnest(${sqlList(PermC)}) AS pc),
      perm AS (
        SELECT doc_id, is_new, i, MIN((pa*lo + pb*hi + pc) % $P61) AS v
        FROM h CROSS JOIN consts GROUP BY doc_id, is_new, i),
      sig AS (SELECT doc_id, is_new, list(v ORDER BY i) AS sig
              FROM perm GROUP BY doc_id, is_new),
      bands AS (
        SELECT doc_id, is_new, b,
               md5(concat_ws(',', sig[b*4+1], sig[b*4+2], sig[b*4+3], sig[b*4+4])) AS bh
        FROM sig CROSS JOIN (SELECT unnest(range(0, $Bands)) AS b)),
      ok AS (SELECT b, bh FROM bands WHERE NOT is_new
             GROUP BY b, bh HAVING COUNT(*) <= $BucketCap),
      cand AS (
        SELECT DISTINCT o.doc_id AS doc_old, n.doc_id AS doc_new
        FROM bands o
        JOIN ok ON ok.b = o.b AND ok.bh = o.bh
        JOIN bands n ON n.b = o.b AND n.bh = o.bh
        WHERE NOT o.is_new AND n.is_new),
      est AS (
        SELECT doc_new, doc_old,
               len(list_filter(range(1, ${MinhashK + 1}),
                               k -> sa.sig[k] = sb.sig[k])) AS agree
        FROM cand
        JOIN sig sa ON sa.doc_id = doc_old
        JOIN sig sb ON sb.doc_id = doc_new),
      best AS (
        SELECT doc_new, doc_old, agree,
               row_number() OVER (PARTITION BY doc_new
                                  ORDER BY agree DESC, doc_old) AS rn
        FROM est WHERE agree * 2 >= $MinhashK)
      SELECT doc_new, doc_old, CAST(agree AS DOUBLE) / $MinhashK AS est_jaccard
      FROM best WHERE rn = 1 ORDER BY doc_new""")
  )

  /** Normalization-based exact dedup — the CCNet/RefinedWeb middle ground
    * between q20 (raw-byte exact: misses case/punctuation variants) and
    * MinHash (q22: pays a signature pipeline for what is often just
    * reformatting). Each document is canonicalized — lowercase, every
    * digit folded to `0`, punctuation to spaces, whitespace collapsed —
    * and dedup groups on the md5 of the CANONICAL text. This is the
    * published CCNet preprocessing (Wenzek et al., LREC'20 §3.1: lowercase
    * + digit-fold + unicode-punct strip before paragraph hashing), the
    * cheapest dedup tier that still catches boilerplate re-rendered with
    * different casing or markup debris.
    *
    * Scale shape: normalization is a map-side codegen'd regexp chain; the
    * only exchange carries (doc_id, 32-byte digest). Identical discipline
    * to q20 — corpus text never shuffles — so the cost at 100 TB is one
    * scan plus a hash-keyed aggregate, ~free next to any MinHash pass.
    * Output marks each doc with its group's canonical survivor (min
    * doc_id) and whether normalization (vs raw equality) was what joined
    * it to its group — the audit column a curation run reports. */
  val q95 = Q(
    "q95_normalized_dedup",
    (s, dir) => {
      val docs = documents(s, dir)
      val norm = trim(regexp_replace(regexp_replace(regexp_replace(
        lower(col("text")),
        "[0-9]", "0"),
        "[^a-z0 ]", " "),
        " +", " "))
      val hashed = docs.select(
        col("doc_id"), md5(col("text")).as("raw_h"), md5(norm).as("norm_h"))
      val groups = hashed.groupBy("norm_h").agg(
        min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("group_size"),
        countDistinct(col("raw_h")).as("n_raw_variants"))
      hashed.join(groups, "norm_h")
        .select(col("doc_id"), col("canonical_id"), col("group_size"),
          (col("doc_id") === col("canonical_id")).cast("int").as("is_kept"),
          // 1 iff this group needed normalization to form (raw hashes differ)
          (col("n_raw_variants") > 1).cast("int").as("norm_merged"))
        .orderBy("doc_id")
    },
    Some("""
      WITH h AS (
        SELECT doc_id, md5(text) AS raw_h,
               md5(trim(regexp_replace(regexp_replace(regexp_replace(
                 lower(text),
                 '[0-9]', '0', 'g'),
                 '[^a-z0 ]', ' ', 'g'),
                 ' +', ' ', 'g'))) AS norm_h
        FROM documents),
      g AS (
        SELECT norm_h, MIN(doc_id) AS canonical_id, COUNT(*) AS group_size,
               COUNT(DISTINCT raw_h) AS n_raw_variants
        FROM h GROUP BY norm_h)
      SELECT h.doc_id, g.canonical_id, g.group_size,
             CAST(h.doc_id = g.canonical_id AS INT) AS is_kept,
             CAST(g.n_raw_variants > 1 AS INT) AS norm_merged
      FROM h JOIN g USING (norm_h)
      ORDER BY h.doc_id""")
  )

  /** Chunk-level exact-substring dedup WITH corpus reconstruction — the
    * operational form of Lee et al. 2022's dedup-and-keep-the-rest: q20
    * drops whole duplicate documents and q91 only measures span overlap;
    * this query REMOVES repeated passages and emits the surviving text.
    * Each document is cut into non-overlapping 8-token chunks; a chunk
    * occurrence survives iff it is the globally FIRST occurrence of that
    * chunk content (order = (doc_id, chunk_idx) — deterministic and
    * partition-independent); each document is then re-assembled from its
    * surviving chunks in order.
    *
    * Scale shape: the first-occurrence decision is a window over
    * md5(chunk) — the shuffle carries (32-byte digest, id, idx), chunk
    * TEXT rides only to the final doc_id-keyed reassembly aggregate,
    * which is the same exchange that would write the deduped corpus out
    * anyway. Both shuffles are linear in corpus size; nothing is
    * quadratic and no driver state exists. */
  val q101 = Q(
    "q101_chunk_dedup",
    (s, dir) => {
      val chunkLen = 8
      val toks = documents(s, dir)
        .select(col("doc_id"),
          filter(split(col("text"), "\\s+"), x => length(x) > 0).as("ws"))
        .filter(size(col("ws")) > 0)
      val chunks = toks
        .select(col("doc_id"),
          explode(transform(
            sequence(lit(0),
              ((size(col("ws")) + lit(chunkLen - 1)) / lit(chunkLen))
                .cast("int") - 1),
            k => struct(k.as("chunk_idx"),
              concat_ws(" ", slice(col("ws"), k * chunkLen + 1, lit(chunkLen)))
                .as("ctext")))).as("c"))
        .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
          col("c.ctext").as("ctext"))
      val ranked = chunks
        .withColumn("rk", row_number().over(
          Window.partitionBy(md5(col("ctext")))
            .orderBy("doc_id", "chunk_idx")))
      ranked
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_chunks"),
          sum(when(col("rk") === 1, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("rk") === 1, size(split(col("ctext"), " ")))
            .otherwise(0)).cast("long").as("tokens_kept"),
          concat_ws(" ", transform(
            array_sort(collect_list(
              when(col("rk") === 1,
                struct(col("chunk_idx"), col("ctext"))))),
            x => x.getField("ctext"))).as("dedup_text"))
        .orderBy("doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                   x -> length(x) > 0) AS ws
        FROM documents),
      chunks AS (
        SELECT doc_id, k AS chunk_idx,
               array_to_string(ws[k * 8 + 1 : k * 8 + 8], ' ') AS ctext
        FROM (SELECT doc_id, ws,
                     unnest(range(0, CAST((len(ws) + 7) // 8 AS INT))) AS k
              FROM toks WHERE len(ws) > 0)),
      ranked AS (
        SELECT doc_id, chunk_idx, ctext,
               ROW_NUMBER() OVER (PARTITION BY md5(ctext)
                                  ORDER BY doc_id, chunk_idx) AS rk
        FROM chunks)
      SELECT doc_id,
             COUNT(*) AS n_chunks,
             CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CAST(SUM(CASE WHEN rk = 1 THEN len(string_split(ctext, ' '))
                           ELSE 0 END) AS BIGINT) AS tokens_kept,
             COALESCE(string_agg(CASE WHEN rk = 1 THEN ctext END, ' '
                                 ORDER BY chunk_idx), '') AS dedup_text
      FROM ranked GROUP BY doc_id ORDER BY doc_id""")
  )

  /** Sorted-neighborhood dedup (Hernández & Stolfo, SIGMOD'95) — the
    * classic entity-resolution family the suite lacked: sort the corpus by
    * a semantic blocking key (here the first 24 chars of the text, so
    * near-identical documents become neighbors), then compare each record
    * only against the next W records in sort order and verify candidates
    * with exact token-set Jaccard. Complements the hash-bucketed families
    * (q22 MinHash, q23 SimHash): SNM catches prefix-preserving edits with
    * a single sort and W·n comparisons instead of banding.
    *
    * Scale shape: the global sort RANK is composed scalably (q84's
    * pattern) — rank = per-shard row_number + broadcast shard-offset,
    * where the shard is the key's first byte, a PREFIX of the sort key, so
    * shard order composes with in-shard order; no single-partition global
    * window exists (the offsets window runs over ≤256 shard-count rows).
    * Neighbor pairs come from W=2 equi-joins on rank (narrow (rank, id)
    * rows); token arrays join in by doc_id only for the verify step. */
  val q103 = Q(
    "q103_sorted_neighborhood",
    (s, dir) => {
      val W = 2
      val keyed = documents(s, dir)
        .select(col("doc_id"), col("text"),
          substring(col("text"), 1, 24).as("sk"))
        .withColumn("shard", substring(col("sk"), 1, 1))
        .materialized // rank + both verify sides read it
      val within = keyed
        .withColumn("rn", row_number().over(
          Window.partitionBy("shard").orderBy("sk", "doc_id")))
      val offsets = keyed.groupBy("shard")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(
          sum("cnt").over(Window.orderBy("shard")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("shard", "off")
      val ranked = within.join(broadcast(offsets), Seq("shard"))
        .select(col("doc_id"), (col("off") + col("rn")).as("rank"))
      val probes = ranked.select(col("doc_id"),
          explode(sequence(lit(1), lit(W))).as("j"),
          col("rank"))
        .select(col("doc_id").as("doc_a"), (col("rank") + col("j")).as("rank"))
      val cand = probes
        .join(ranked.select(col("doc_id").as("doc_b"), col("rank")), "rank")
        .select("doc_a", "doc_b")
      // exact token-set Jaccard verify (set semantics: distinct tokens).
      // Token identity = the full 128-bit md5 as two longs (the
      // shingleDigests discipline — bijective with the token string, so
      // the intersect counts are identical): the verify join then keys
      // on primitives instead of token text.
      val (t1c, t2c) = graft.functions.GraftFunctions.md5_128(col("t"))
      val tok = keyed.select(col("doc_id"),
          explode(array_distinct(
            filter(split(col("text"), "\\s+"), x => length(x) > 0))).as("t"))
        .select(col("doc_id"), t1c.as("t1"), t2c.as("t2"))
        .materialized
      val counts = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = cand
        .join(tok.as("ta"), col("doc_a") === col("ta.doc_id"))
        .join(tok.as("tb"),
          col("doc_b") === col("tb.doc_id") && col("ta.t1") === col("tb.t1") &&
            col("ta.t2") === col("tb.t2"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      cand
        .join(inter, Seq("doc_a", "doc_b"), "left")
        .na.fill(0L, Seq("inter"))
        .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
        .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
        .filter(col("inter") * 5 >= (col("ca.n") + col("cb.n") - col("inter")) * 4)
        .select(col("doc_a"), col("doc_b"), col("inter").as("inter_cnt"),
          (col("inter").cast("double") /
            (col("ca.n") + col("cb.n") - col("inter"))).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },
    Some("""
      WITH keyed AS (
        SELECT doc_id, text, substr(text, 1, 24) AS sk FROM documents),
      ranked AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY sk, doc_id) AS rank
        FROM keyed),
      cand AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM ranked a
        JOIN ranked b ON b.rank - a.rank BETWEEN 1 AND 2),
      tok AS (
        SELECT DISTINCT doc_id,
               unnest(list_filter(string_split_regex(text, '\s+'),
                                  x -> length(x) > 0)) AS t
        FROM keyed),
      counts AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
      inter AS (
        SELECT doc_a, doc_b, COUNT(*) AS i_cnt
        FROM cand
        JOIN tok ta ON ta.doc_id = doc_a
        JOIN tok tb ON tb.doc_id = doc_b AND tb.t = ta.t
        GROUP BY doc_a, doc_b)
      SELECT doc_a, doc_b,
             COALESCE(i_cnt, 0) AS inter_cnt,
             CAST(COALESCE(i_cnt, 0) AS DOUBLE) /
               (ca.n + cb.n - COALESCE(i_cnt, 0)) AS jaccard
      FROM cand
      LEFT JOIN inter USING (doc_a, doc_b)
      JOIN counts ca ON ca.doc_id = doc_a
      JOIN counts cb ON cb.doc_id = doc_b
      WHERE COALESCE(i_cnt, 0) * 5 >= (ca.n + cb.n - COALESCE(i_cnt, 0)) * 4
      ORDER BY doc_a, doc_b""")
  )

  /** End-to-end entity-resolution capstone — the full ER recipe (Christen,
    * "Data Matching", Springer 2012) as ONE declared query, composing the
    * suite's building blocks over a different candidate generator than
    * q21-q24's shingle prefixes:
    *
    *   1. multi-strategy BLOCKING: 16-char text prefix blocks ∪
    *      (first-token, length-bucket) blocks, with BLOCK PURGING (blocks
    *      larger than 64 are dropped — the meta-blocking guard that keeps
    *      pair generation from going quadratic on a stop-prefix);
    *   2. pairwise MATCHING: exact token-set Jaccard ≥ 0.8 (integer
    *      compare) plus a length-ratio sanity gate (2·min ≥ max);
    *   3. CLUSTERING: connected components by min-label propagation
    *      (the q24 loop, shared plan shape);
    *   4. SURVIVORSHIP: best record per cluster = longest text, ties by
    *      lowest id (a realistic "keep the richest record" rule, unlike
    *      q24's min-id convention).
    *
    * Scale shape: block keys and token digests shuffle, text never does;
    * purging bounds pairs at 64²/2 per block; the CC loop moves (node,
    * label) pairs only. The oracle replays every stage incl. the
    * reachability fixpoint — the whole pipeline is hash-proven, not just
    * its pieces. */
  val q114 = Q(
    "q114_er_pipeline",
    (s, dir) => {
      val docs = documents(s, dir)
        .select(col("doc_id"), col("text"), col("n_chars")).materialized
      def blockPairs(keyed: DataFrame): DataFrame = {
        val sized = keyed
          .withColumn("cnt", count(lit(1)).over(Window.partitionBy("key")))
          .filter(col("cnt") <= 64)
          .select("key", "doc_id")
        sized.as("a").join(sized.as("b"),
            col("a.key") === col("b.key") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      }
      val b1 = docs.select(substring(col("text"), 1, 16).as("key"), col("doc_id"))
      val b2 = docs
        .select(col("doc_id"), col("n_chars"),
          filter(split(col("text"), "\\s+"), x => length(x) > 0).as("ws"))
        .filter(size(col("ws")) > 0)
        .select(concat_ws("|", try_element_at(col("ws"), lit(1)),
          expr("cast(n_chars div 32 as string)")).as("key"), col("doc_id"))
      val cand = blockPairs(b1).union(blockPairs(b2)).distinct().materialized
      // token identity = md5_128 longs (q103's verify discipline):
      // identical intersect counts, primitive join keys
      val (t1c, t2c) = graft.functions.GraftFunctions.md5_128(col("t"))
      val tok = docs.select(col("doc_id"),
          explode(array_distinct(
            filter(split(col("text"), "\\s+"), x => length(x) > 0))).as("t"))
        .select(col("doc_id"), t1c.as("t1"), t2c.as("t2"))
        .materialized
      val counts = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = cand
        .join(tok.as("ta"), col("doc_a") === col("ta.doc_id"))
        .join(tok.as("tb"),
          col("doc_b") === col("tb.doc_id") && col("ta.t1") === col("tb.t1") &&
            col("ta.t2") === col("tb.t2"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
      val lens = docs.select(col("doc_id"), col("n_chars"))
      val edges = inter
        .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
        .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
        .join(lens.as("la"), col("doc_a") === col("la.doc_id"))
        .join(lens.as("lb"), col("doc_b") === col("lb.doc_id"))
        .filter(col("i") * 5 >= (col("ca.n") + col("cb.n") - col("i")) * 4)
        .filter(least(col("la.n_chars"), col("lb.n_chars")) * 2 >=
          greatest(col("la.n_chars"), col("lb.n_chars")))
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      val sym = edges
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        // pre-partitioned+sorted on the per-round join key — the
        // jaccardComponentsOf invariant-table discipline (guide §2.4)
        .repartition(col("dst")).sortWithinPartitions("dst")
        .materialized
      // edge-touched nodes only — the jaccardComponents discipline:
      // isolated docs never change label, so they skip the loop and
      // re-enter as singleton clusters in the left-join read-off
      var labels = sym.select(col("src").as("node")).distinct()
        .withColumn("lbl", col("node")).materialized
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < 50) {
        val next = labelPropRound(sym, labels).materialized
        changed = next.filter(col("nxt") < col("lbl")).count()
        labels = next.select(col("node"), col("nxt").as("lbl"))
        rounds += 1
      }
      val comp = docs.select(col("doc_id"))
        .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("lbl"), col("doc_id")).as("cluster"))
      val sizes = comp.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
      val best = comp.join(lens, "doc_id")
        .withColumn("rn", row_number().over(
          Window.partitionBy("cluster")
            .orderBy(col("n_chars").desc, col("doc_id"))))
        .filter(col("rn") === 1)
        .select(col("cluster"), col("doc_id").as("best_id"))
      comp.join(sizes, "cluster").join(best, "cluster")
        .select(col("doc_id"), col("cluster"), col("cluster_size"),
          col("best_id"),
          (col("doc_id") === col("best_id")).cast("int").as("is_canonical"))
        .orderBy("doc_id")
    },
    Some("""
      WITH RECURSIVE
      docs AS (SELECT doc_id, text, n_chars FROM documents),
      b1 AS (SELECT substr(text, 1, 16) AS key, doc_id FROM docs),
      b2 AS (
        SELECT concat(ws[1], '|', CAST(n_chars // 32 AS VARCHAR)) AS key,
               doc_id
        FROM (SELECT doc_id, n_chars,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> length(x) > 0) AS ws
              FROM docs)
        WHERE len(ws) > 0),
      p1 AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM b1 a JOIN b1 b USING (key)
        WHERE a.doc_id < b.doc_id
          AND key IN (SELECT key FROM b1 GROUP BY key HAVING COUNT(*) <= 64)),
      p2 AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM b2 a JOIN b2 b USING (key)
        WHERE a.doc_id < b.doc_id
          AND key IN (SELECT key FROM b2 GROUP BY key HAVING COUNT(*) <= 64)),
      -- DISTINCT spelled out: inside a WITH RECURSIVE list DuckDB gives
      -- plain UNION recursive-union semantics (no global dedup)
      cand AS (
        SELECT DISTINCT doc_a, doc_b FROM (
          SELECT doc_a, doc_b FROM p1
          UNION ALL SELECT doc_a, doc_b FROM p2)),
      tok AS (
        SELECT DISTINCT doc_id,
               unnest(list_filter(string_split_regex(text, '\s+'),
                                  x -> length(x) > 0)) AS t
        FROM docs),
      counts AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
      inter AS (
        SELECT doc_a, doc_b, COUNT(*) AS i
        FROM cand
        JOIN tok ta ON ta.doc_id = doc_a
        JOIN tok tb ON tb.doc_id = doc_b AND tb.t = ta.t
        GROUP BY doc_a, doc_b),
      e0 AS (
        SELECT doc_a AS src, doc_b AS dst
        FROM inter
        JOIN counts ca ON ca.doc_id = doc_a
        JOIN counts cb ON cb.doc_id = doc_b
        JOIN docs da ON da.doc_id = doc_a
        JOIN docs db ON db.doc_id = doc_b
        WHERE i * 5 >= (ca.n + cb.n - i) * 4
          AND least(da.n_chars, db.n_chars) * 2
              >= greatest(da.n_chars, db.n_chars)),
      edges AS (
        SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      reach(src, node) AS (
        SELECT doc_id, doc_id FROM docs
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.node),
      comp AS (
        SELECT src AS doc_id, MIN(node) AS cluster FROM reach GROUP BY src),
      sizes AS (
        SELECT cluster, COUNT(*) AS cluster_size FROM comp GROUP BY cluster),
      best AS (
        SELECT cluster, doc_id AS best_id
        FROM (SELECT c.cluster, c.doc_id,
                     ROW_NUMBER() OVER (PARTITION BY c.cluster
                       ORDER BY d.n_chars DESC, c.doc_id) AS rn
              FROM comp c JOIN docs d USING (doc_id))
        WHERE rn = 1)
      SELECT c.doc_id, c.cluster, s.cluster_size, b.best_id,
             CAST(c.doc_id = b.best_id AS INT) AS is_canonical
      FROM comp c JOIN sizes s USING (cluster) JOIN best b USING (cluster)
      ORDER BY c.doc_id""")
  )

  /** Cluster-aware, leakage-safe train/val/test split — the assignment step
    * every training corpus needs after dedup: if two near-duplicate
    * documents land in different splits, the eval set is contaminated by
    * construction (Lee et al.'s "deduplicate BEFORE you split"). So the
    * split key is the CLUSTER id, not the document id: all members of a
    * connected component of the near-dup graph (q24's fixpoint, shared
    * code path) inherit one deterministic hash bucket —
    * md5(cluster) mod 10 → 0-7 train / 8 val / 9 test. The audit column
    * `leak_prevented` marks exactly the documents a naive per-doc hash
    * split would have separated from their duplicates (cluster_size > 1
    * AND doc-hash split ≠ cluster-hash split) — the contamination this
    * operator exists to stop, made visible and countable.
    *
    * Scale shape: the component loop is q24's (label tables shuffle, never
    * documents); after that everything is one cluster-keyed size count and
    * map-side hash arithmetic. RNG-free, so the split is reproducible
    * across runs, engines, and cluster sizes — the property that makes it
    * auditable at 100 TB. */
  val q115 = Q(
    "q115_split_leakage",
    (s, dir) => {
      def bucket(c: Column): Column =
        conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long") % 10
      def splitOf(b: Column): Column =
        when(b <= 7, "train").when(b === 8, "val").otherwise("test")
      val comp = jaccardComponents(documents(s, dir))
      val sizes = comp.groupBy("cluster")
        .agg(count(lit(1)).as("cluster_size"))
      comp.join(sizes, "cluster")
        .withColumn("split", splitOf(bucket(col("cluster"))))
        .withColumn("leak_prevented",
          (col("cluster_size") > 1 &&
            splitOf(bucket(col("doc_id"))) =!= col("split")).cast("int"))
        .select(col("doc_id"), col("cluster"), col("cluster_size"),
          col("split"), col("leak_prevented"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH RECURSIVE $JaccardPairsSql,
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM jp
        UNION ALL
        SELECT doc_b, doc_a FROM jp),
      reach(src, node) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.node),
      comp AS (
        SELECT src AS doc_id, MIN(node) AS cluster FROM reach GROUP BY src),
      sizes AS (
        SELECT cluster, COUNT(*) AS cluster_size FROM comp GROUP BY cluster),
      labeled AS (
        SELECT doc_id, cluster, cluster_size,
               ('0x' || substr(md5(CAST(cluster AS VARCHAR)), 1, 8))::BIGINT % 10 AS cb,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10 AS db
        FROM comp JOIN sizes USING (cluster))
      SELECT doc_id, cluster, cluster_size,
             CASE WHEN cb <= 7 THEN 'train'
                  WHEN cb = 8 THEN 'val' ELSE 'test' END AS split,
             CAST(cluster_size > 1 AND
                  (CASE WHEN cb <= 7 THEN 'train'
                        WHEN cb = 8 THEN 'val' ELSE 'test' END) <>
                  (CASE WHEN db <= 7 THEN 'train'
                        WHEN db = 8 THEN 'val' ELSE 'test' END) AS INT)
               AS leak_prevented
      FROM labeled ORDER BY doc_id""")
  )

  /** Semi-supervised label spreading over the near-dup graph — how a
    * handful of human quality judgments becomes corpus-scale labels: seed
    * documents (content-hash bucket < 20%) carry an observed good/bad
    * verdict; two clamped majority-vote rounds spread it along q21's
    * Jaccard edges (a near-duplicate of a bad document is bad). The
    * update is l' = sign(2·l + Σ neighbor labels) with seeds CLAMPED
    * (standard label-propagation discipline — ground truth never gets
    * outvoted); everything is small-integer arithmetic, so the fixpoint
    * prefix is bit-stable and the oracle unrolls both rounds verbatim.
    *
    * Scale shape: per round ONE edge-keyed join + node-keyed sum over
    * (node, ±1) labels — 9-byte rows, the q24/q110 Pregel discipline;
    * document text never shuffles. Rounds are unrolled (2) because label
    * influence beyond 2 hops through a similarity graph is noise, not
    * signal — and unrolling keeps the oracle total. */
  val q130 = Q(
    "q130_label_spread",
    (s, dir) => {
      val docs = documents(s, dir)
      val b = conv(substring(md5(col("text")), 1, 8), 16, 10)
        .cast("long") % 100
      val seeded = docs.select(col("doc_id"),
        when(b < 10, 1).when(b < 20, -1).otherwise(0).as("seed"))
        .materialized // both rounds + output read it
      val e0 = jaccardPairs(docs)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        // pre-partitioned+sorted on the per-round join key — the
        // jaccardComponentsOf invariant-table discipline (guide §2.4)
        .repartition(col("dst")).sortWithinPartitions("dst")
        .materialized // two vote rounds
      def round(labels: DataFrame): DataFrame = {
        val votes = sym.join(labels, col("dst") === col("doc_id"))
          .groupBy(col("src")).agg(sum(col("lbl")).as("vote"))
        labels.join(votes, col("doc_id") === col("src"), "left")
          .join(seeded, "doc_id")
          .select(col("doc_id"),
            when(col("seed") =!= 0, col("seed"))
              .otherwise(signum(col("lbl") * 2 +
                coalesce(col("vote"), lit(0))).cast("int")).as("lbl"))
      }
      // vote rounds over edge-touched nodes only: an isolated doc gets
      // vote = 0 every round, so l' = seed if seeded else sign(2l) = l —
      // its label is its seed at every round and it can skip the loop
      // (the jaccardComponents discipline); coalesce restores it at
      // read-off. Fixpoint prefix unchanged — oracle re-proves per run.
      val nodes = sym.select(col("dst").as("doc_id")).distinct()
      val l0 = seeded.join(nodes, "doc_id")
        .select(col("doc_id"), col("seed").as("lbl"))
      val l2 = round(round(l0))
      seeded.join(l2.withColumnRenamed("lbl", "spread"), Seq("doc_id"), "left")
        .select(col("doc_id"), col("seed"),
          coalesce(col("spread"), col("seed")).as("label"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH $JaccardPairsSql,
      seeded AS (
        SELECT doc_id,
               CASE WHEN ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 < 10
                    THEN 1
                    WHEN ('0x' || substr(md5(text), 1, 8))::BIGINT % 100 < 20
                    THEN -1 ELSE 0 END AS seed
        FROM documents),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM jp
        UNION ALL
        SELECT doc_b, doc_a FROM jp),
      l0 AS (SELECT doc_id, seed AS lbl FROM seeded),
      v1 AS (
        SELECT src, SUM(lbl) AS vote FROM edges
        JOIN l0 ON dst = doc_id GROUP BY src),
      l1 AS (
        SELECT l0.doc_id,
               CASE WHEN seed <> 0 THEN seed
                    ELSE CAST(sign(lbl * 2 + COALESCE(vote, 0)) AS INT) END
                 AS lbl
        FROM l0 LEFT JOIN v1 ON l0.doc_id = v1.src
        JOIN seeded USING (doc_id)),
      v2 AS (
        SELECT src, SUM(lbl) AS vote FROM edges
        JOIN l1 ON dst = doc_id GROUP BY src),
      l2 AS (
        SELECT l1.doc_id,
               CASE WHEN seed <> 0 THEN seed
                    ELSE CAST(sign(lbl * 2 + COALESCE(vote, 0)) AS INT) END
                 AS lbl
        FROM l1 LEFT JOIN v2 ON l1.doc_id = v2.src
        JOIN seeded USING (doc_id))
      SELECT doc_id, seed, lbl AS label
      FROM seeded JOIN l2 USING (doc_id)
      ORDER BY doc_id""")
  )

  /** Corpus-level MinHash similarity between SOURCES — sketch algebra
    * above the document tier: MinHash's union property (the signature of
    * A∪B is the elementwise min of the signatures of A and B) means one
    * 64-long signature per source estimates the shingle-set Jaccard
    * between entire crawl sources. This is dataset-dedup TRIAGE: before
    * running q22 across two crawls, one K²-pair comparison of
    * kilobyte-sized sketches says which source pairs overlap enough to
    * bother. Same permutation family and base hash as q22, so the
    * sketches are interchangeable with the per-doc pipeline.
    *
    * Scale shape: the signature build is ONE map-side-folded aggregate to
    * #sources rows (the shingle stream never shuffles — MinHashFold's
    * partial aggregation IS the sketch merge); the pair comparison is a
    * #sources² loop over broadcast-sized rows (allowlisted — both sides
    * are source-catalog-sized, corpus-independent). */
  val q133 = Q(
    "q133_source_minhash",
    (s, dir) => {
      val (lo, hi) = md5Halves(col("sh"))
      val sigs = documents(s, dir)
        .select(col("source"),
          graft.functions.GraftFunctions.word_ngrams(col("text"), 5).as("sh"))
        .select(col("source"), lo.as("lo"), hi.as("hi"))
        .groupBy("source")
        .agg(graft.functions.MinHashFold
          .minhashFold(col("lo"), col("hi"), PermA, PermB, PermC, P61)
          .as("sig"))
        .materialized // both sides of the pair loop
      val a = sigs.select(col("source").as("src_a"), col("sig").as("sa"))
      val b = sigs.select(col("source").as("src_b"), col("sig").as("sb"))
      a.join(b, col("src_a") < col("src_b"))
        .select(col("src_a"), col("src_b"),
          expr("""cast(aggregate(zip_with(sa, sb, (x, y) -> if(x = y, 1, 0)),
                  0, (acc, z) -> acc + z) as bigint)""").as("agree"))
        .withColumn("jaccard_x10000",
          expr(s"agree * 10000 div $MinhashK"))
        .orderBy("src_a", "src_b")
    },
    Some(s"""
      WITH words AS (
        SELECT source, string_split_regex(text, '\\s+') AS w FROM documents),
      idx AS (
        SELECT source, w, unnest(range(1, greatest(len(w) - 4, 1) + 1)) AS i
        FROM words),
      sh AS (
        SELECT source, array_to_string(w[i:i+4], ' ') AS sh FROM idx),
      h AS (
        SELECT source,
               ('0x' || substr(md5(sh), 1, 8))::BIGINT AS lo,
               ('0x' || substr(md5(sh), 9, 8))::BIGINT AS hi
        FROM sh),
      consts AS (
        SELECT unnest(range(0, $MinhashK)) AS i,
               unnest(${sqlList(PermA)}) AS pa,
               unnest(${sqlList(PermB)}) AS pb,
               unnest(${sqlList(PermC)}) AS pc),
      perm AS (
        SELECT source, i, MIN((pa*lo + pb*hi + pc) % $P61) AS v
        FROM h CROSS JOIN consts GROUP BY source, i),
      sig AS (SELECT source, list(v ORDER BY i) AS sig FROM perm GROUP BY source),
      pairs AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(len(list_filter(range(1, ${MinhashK + 1}),
                        k -> a.sig[k] = b.sig[k])) AS BIGINT) AS agree
        FROM sig a JOIN sig b ON a.source < b.source)
      SELECT src_a, src_b, agree,
             agree * 10000 // $MinhashK AS jaccard_x10000
      FROM pairs ORDER BY src_a, src_b""")
  )

  /** Substring-excision ACCOUNTING — the actual removal step of Lee et
    * al. 2021 ("remove substrings that appear elsewhere"), where q26/q91
    * are the detectors: for every position whose fixed 8-token gram is
    * duplicated ACROSS documents, the 8-token interval it covers is
    * marked, per-doc overlapping intervals merge (interval union), and
    * the answer is how many tokens excision removes vs keeps, plus how
    * many contiguous cut regions the doc splits into. The cross-doc
    * discipline matches q91: a within-doc repeat alone excises nothing.
    *
    * Exactness: everything is integer — positions from posexplode, the
    * union via the sorted-starts identity Σ min(W, next − cur) (+W for
    * the last start), region count = 1 + #gaps > W; DuckDB mirrors with
    * LAG windows over the same md5 gram keys.
    *
    * Scale shape: grams shuffle as 32-byte digests + int positions
    * (text never moves); the dup set is a wordcount groupBy; the union
    * is ONE window over (doc_id, pos) rows — rows ∝ duplicated
    * positions only, not corpus tokens. The left join restores
    * untouched docs. */
  val q134 = Q(
    "q134_span_excise",
    (s, dir) => {
      val W = 8
      val docs = documents(s, dir)
      val toks = docs.select(col("doc_id"),
        filter(split(col("text"), "\\s+"), x => length(x) > 0).as("w"))
        .select(col("doc_id"), col("w"), size(col("w")).as("n"))
      // 64-bit digest prefix AS A LONG (md5_prefix64 — bijective with the
      // previous 16-hex-char substring, so every set below is identical):
      // collision-safe at any plausible gram count, no 32-char hex string
      // materialized per gram, and downstream exchanges/compares touch an
      // 8-byte primitive instead of a 16-char string
      val grams = toks
        .filter(col("n") >= W)
        .select(col("doc_id"), col("n"), posexplode(
          transform(expr(s"sequence(1, n - ${W - 1})"),
            i => graft.functions.GraftFunctions.md5_prefix64(
              array_join(slice(col("w"), i, lit(W)), " ")))))
        .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("h"))
        .materialized // consumers: dup set + position join
      val dup = grams.select("h", "doc_id").distinct()
        .groupBy("h").agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 2).select("h")
      val hitPos = grams.join(dup, "h").select("doc_id", "p").distinct()
      val w = Window.partitionBy("doc_id").orderBy("p")
      val perDoc = hitPos
        .withColumn("prev", lag(col("p"), 1).over(w))
        .groupBy("doc_id")
        .agg(
          (sum(when(col("prev").isNull, lit(W))
            .otherwise(least(lit(W), col("p") - col("prev")))))
            .cast("long").as("excised"),
          sum(when(col("prev").isNull || col("p") - col("prev") > W, 1L)
            .otherwise(0L)).as("n_regions"))
      toks.select(col("doc_id"), col("n").cast("long").as("n_tokens"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("excised"), lit(0L)).as("excised"),
          (col("n_tokens") - coalesce(col("excised"), lit(0L))).as("kept"),
          coalesce(col("n_regions"), lit(0L)).as("n_regions"))
        .orderBy("doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'),
                           x -> length(x) > 0) AS w
        FROM documents),
      sized AS (SELECT doc_id, w, len(w) AS n FROM toks),
      grams AS (
        SELECT doc_id, i AS p,
               substr(md5(array_to_string(w[i:i+7], ' ')), 1, 16) AS h
        FROM (SELECT doc_id, w, unnest(range(1, n - 7 + 1)) AS i
              FROM sized WHERE n >= 8)),
      dup AS (
        SELECT h FROM (SELECT DISTINCT h, doc_id FROM grams)
        GROUP BY h HAVING COUNT(*) >= 2),
      hitpos AS (
        SELECT DISTINCT doc_id, p FROM grams JOIN dup USING (h)),
      gaps AS (
        SELECT doc_id, p,
               LAG(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
        FROM hitpos),
      per_doc AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN prev IS NULL THEN 8
                             ELSE LEAST(8, p - prev) END) AS BIGINT)
                 AS excised,
               CAST(SUM(CASE WHEN prev IS NULL OR p - prev > 8
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_regions
        FROM gaps GROUP BY doc_id)
      SELECT s.doc_id, CAST(s.n AS BIGINT) AS n_tokens,
             COALESCE(p.excised, 0) AS excised,
             CAST(s.n AS BIGINT) - COALESCE(p.excised, 0) AS kept,
             COALESCE(p.n_regions, 0) AS n_regions
      FROM sized s LEFT JOIN per_doc p USING (doc_id)
      ORDER BY doc_id""")
  )

  /** Cluster-transitivity audit — the honesty check on connected-component
    * dedup: component clustering merges documents by CHAINS (a~b, b~c ⇒
    * {a,b,c}) even when the endpoints a,c share no direct similarity
    * edge. Per multi-member cluster this reports how many member pairs
    * are direct edges vs chained-only — the number that tells a curation
    * team whether their threshold produces tight duplicate groups or
    * topic-blob over-merging (a high chained share means canonical-doc
    * selection is collapsing documents that never matched each other).
    *
    * Scale shape: q24's component loop (8-byte label shuffles) + ONE
    * cluster-keyed count of the existing edge table + integer pair
    * algebra (C(n,2) − direct). Nothing new shuffles at scale; the audit
    * rides artifacts the dedup pipeline already built. */
  val q141 = Q(
    "q141_chain_audit",
    (s, dir) => {
      val docs = documents(s, dir)
      // ONE pair table for both consumers (components + direct counts):
      // previously the full shingle→digest→prefix-join pipeline ran twice
      // inside this query (r15 pass; same rows by construction)
      val jp = jaccardPairs(docs)
        .select(col("doc_a"), col("doc_b"))
        .materialized // consumers: component edges + direct-pair counts
      val comp = jaccardComponentsOf(docs, jp)
      val sizes = comp.groupBy("cluster")
        .agg(count(lit(1)).as("n_members"))
      val direct = jp
        .select(col("doc_a"))
        .join(comp.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .groupBy("cluster").agg(count(lit(1)).as("direct_pairs"))
      sizes.join(direct, Seq("cluster"), "left")
        .na.fill(0L, Seq("direct_pairs"))
        .filter(col("n_members") > 1)
        .select(col("cluster"), col("n_members"), col("direct_pairs"),
          expr("n_members * (n_members - 1) div 2 - direct_pairs")
            .as("chained_pairs"))
        .orderBy("cluster")
    },
    Some(s"""
      WITH RECURSIVE $JaccardPairsSql,
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM jp
        UNION ALL
        SELECT doc_b, doc_a FROM jp),
      reach(src, node) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.node),
      comp AS (
        SELECT src AS doc_id, MIN(node) AS cluster FROM reach GROUP BY src),
      sizes AS (
        SELECT cluster, COUNT(*) AS n_members FROM comp GROUP BY cluster),
      direct AS (
        SELECT c.cluster, COUNT(*) AS direct_pairs
        FROM jp JOIN comp c ON c.doc_id = jp.doc_a
        GROUP BY c.cluster)
      SELECT s.cluster, s.n_members,
             COALESCE(d.direct_pairs, 0) AS direct_pairs,
             s.n_members * (s.n_members - 1) // 2
               - COALESCE(d.direct_pairs, 0) AS chained_pairs
      FROM sizes s LEFT JOIN direct d USING (cluster)
      WHERE s.n_members > 1
      ORDER BY s.cluster""")
  )

  /** Dedup-threshold YIELD sweep — the calibration run before committing
    * to a similarity cutoff: every candidate pair above the q21 floor
    * (j ≥ 0.05) lands in a 5%-wide similarity bucket
    * (`floor(jaccard·20)` — both engines derive the double from the same
    * integer division, so the bucket boundary is engine-exact), and each
    * bucket reports its pair count and distinct documents touched. Read
    * cumulatively from the top, this is "how many pairs/docs would a
    * threshold of t remove" — the q83 quality-sweep idea applied to the
    * dedup knob.
    *
    * Scale shape: q21's prefix-filtered pair machinery (the expensive
    * part a pipeline already runs) + one bucket-keyed count + one
    * (bucket, doc) distinct — 9-byte rows. Text never shuffles. */
  val q143 = Q(
    "q143_threshold_yield",
    (s, dir) => {
      val jp = jaccardPairs(documents(s, dir))
        .withColumn("bucket", floor(col("jaccard") * 20).cast("long"))
        .materialized // consumers: pair counts + doc explode
      val pairs = jp.groupBy("bucket").agg(count(lit(1)).as("n_pairs"))
      val docs = jp
        .select(col("bucket"),
          explode(array(col("doc_a"), col("doc_b"))).as("d"))
        .groupBy("bucket").agg(countDistinct(col("d")).as("n_docs"))
      pairs.join(docs, "bucket").orderBy("bucket")
    },
    Some(s"""
      WITH $JaccardPairsSql,
      b AS (
        SELECT doc_a, doc_b, CAST(floor(jaccard * 20) AS BIGINT) AS bucket
        FROM jp),
      bpairs AS (SELECT bucket, COUNT(*) AS n_pairs FROM b GROUP BY bucket),
      bdocs AS (
        SELECT bucket, COUNT(DISTINCT d) AS n_docs
        FROM (SELECT bucket, unnest([doc_a, doc_b]) AS d FROM b)
        GROUP BY bucket)
      SELECT bucket, n_pairs, n_docs
      FROM bpairs JOIN bdocs USING (bucket) ORDER BY bucket""")
  )

  /** Cross-source near-duplication flow matrix — WHERE duplication comes
    * from: each q21 near-dup pair lands in the unordered (source, source)
    * cell of its two documents' origins. Heavy diagonal cells mean
    * within-crawl boilerplate; heavy off-diagonal cells mean mirror
    * domains — the signal that drives source-level dedup (q133) and
    * per-source caps (q142).
    *
    * Scale shape: the pair machinery + two id-keyed joins to the (doc_id,
    * source) projection + one catalog²-bounded aggregate (a few thousand
    * cells for any real source catalog). Text never shuffles. */
  val q144 = Q(
    "q144_source_overlap",
    (s, dir) => {
      val docs = documents(s, dir)
      val src = docs.select(col("doc_id"), col("source"))
      jaccardPairs(docs)
        .join(src.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("source", "src_a"), "doc_a")
        .join(src.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("source", "src_b"), "doc_b")
        .select(least(col("src_a"), col("src_b")).as("source_1"),
          greatest(col("src_a"), col("src_b")).as("source_2"))
        .groupBy("source_1", "source_2")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("source_1", "source_2")
    },
    Some(s"""
      WITH $JaccardPairsSql
      SELECT least(da.source, db.source) AS source_1,
             greatest(da.source, db.source) AS source_2,
             COUNT(*) AS n_pairs
      FROM jp
      JOIN documents da ON da.doc_id = doc_a
      JOIN documents db ON db.doc_id = doc_b
      GROUP BY 1, 2
      ORDER BY source_1, source_2""")
  )

  /** Soft-dedup effective corpus size — instead of DROPPING near-dup
    * cluster members (q88's keep-best policy), weight every document by
    * 1/cluster_size (×1e6 fixed point) and report, per source, the raw
    * vs effective document and token counts. Σ 1/n over a cluster is
    * exactly 1 doc of effective mass, so `eff_docs_ppm/1e6` is the
    * corpus size a training run actually sees under duplicate-aware
    * sampling — the "how much unique data do we really have" number
    * (and the weight column itself is the SoftDeDup-style sampling
    * weight). `retention_ppm` = mean weight = the per-source redundancy
    * discount. Integer divisions throughout → engine-exact.
    *
    * Scale shape: rides artifacts the dedup pipeline already built —
    * q24's component loop (8-byte label shuffles), one cluster-keyed
    * size count, one doc-keyed join to map-side token counts, and a
    * ≤|sources|-row final aggregate. The only per-doc state crossing an
    * exchange is (doc_id, cluster, n_tok); text never shuffles.
    * Independent of q141 in the bench by design — see q141's note: each
    * audit is priced as a standalone run of the pipeline it rides. */
  val q155 = Q(
    "q155_effective_size",
    (s, dir) => {
      val docs = documents(s, dir)
      val comp = jaccardComponents(docs)
      val sizes = comp.groupBy("cluster").agg(count(lit(1)).as("csz"))
      docs
        .select(col("doc_id"), col("source"),
          size(split(col("text"), "\\s+")).cast("long").as("n_tok"))
        .join(comp, "doc_id")
        .join(sizes, "cluster")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          sum(expr("1000000 div csz")).as("eff_docs_ppm"),
          sum(expr("n_tok * 1000000 div csz")).as("eff_tokens_ppm"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("eff_docs_ppm"), col("eff_tokens_ppm"),
          expr("eff_docs_ppm div n_docs").as("retention_ppm"))
        .orderBy("source")
    },
    Some(s"""
      WITH RECURSIVE $JaccardPairsSql,
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM jp
        UNION ALL
        SELECT doc_b, doc_a FROM jp),
      reach(src, node) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.node),
      comp AS (
        SELECT src AS doc_id, MIN(node) AS cluster FROM reach GROUP BY src),
      sizes AS (SELECT cluster, COUNT(*) AS csz FROM comp GROUP BY cluster),
      w AS (
        SELECT d.source,
               CAST(len(string_split_regex(d.text, '\\s+')) AS BIGINT)
                 AS n_tok,
               s.csz
        FROM documents d
        JOIN comp c ON c.doc_id = d.doc_id
        JOIN sizes s USING (cluster)),
      agg AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
               CAST(SUM(1000000 // csz) AS BIGINT) AS eff_docs_ppm,
               CAST(SUM(n_tok * 1000000 // csz) AS BIGINT)
                 AS eff_tokens_ppm
        FROM w GROUP BY source)
      SELECT source, n_docs, n_tokens, eff_docs_ppm, eff_tokens_ppm,
             eff_docs_ppm // n_docs AS retention_ppm
      FROM agg ORDER BY source""")
  )

  /** Distributed suffix-array construction (Manber–Myers prefix doubling,
    * see [[graft.operators.SuffixArray]]): the dense global lexicographic
    * rank of every word-level document suffix. This is the index that
    * upgrades the fixed-width shingle dedup family (q26/q91/q134) to
    * ALL-length exact substring matching — Lee et al. 2021's ExactSubstr
    * formulation — and q157 rides it for the longest-repeated-phrase
    * profile. The oracle materializes every suffix as a chr(1)-joined
    * string and sorts it (fine at sf0.01, quadratic memory at scale);
    * the Spark plan never materializes a suffix: O(log maxDocLen) rounds
    * of integer-pair ranking, each a distinct → range-sort → zipWithIndex
    * two-phase dense rank with lineage cut per round.
    *
    * Scale shape: after round 0 (which sorts the DISTINCT vocabulary and
    * joins single words back), every exchange carries (doc_id, pos, rank)
    * or (rank, rank') integer rows; rounds are log-bounded by the longest
    * document, not the corpus; no single-partition stage anywhere — the
    * global dense rank is range-partition + contiguous zipWithIndex. */
  val q156 = Q(
    "q156_suffix_rank",
    (s, dir) => {
      graft.operators.SuffixArray.suffixRanks(documents(s, dir))
        .select(col("doc_id"), col("pos"), col("suffix_rank"))
        .orderBy("doc_id", "pos")
    },
    Some(raw"""
      WITH toks AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      posx AS (
        SELECT doc_id, unnest(generate_series(1, len(w))) AS i, w FROM toks),
      suf AS (
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
               array_to_string(w[i:], chr(1)) AS s
        FROM posx)
      SELECT doc_id, pos, DENSE_RANK() OVER (ORDER BY s) AS suffix_rank
      FROM suf ORDER BY doc_id, pos""")
  )

  /** Longest-repeated-phrase profile per document, from the q156 suffix
    * array: `lrs_words` = longest phrase (in words, capped at 31) starting
    * in the document that occurs anywhere else in the corpus;
    * `n_dup_starts` = positions starting a ≥8-word phrase that occurs
    * elsewhere — the excisable duplicated-mass signal with NO shingle
    * width chosen in advance. The suffix-array identity (longest repeat =
    * max LCP with the two suffix-order neighbors) turns the all-pairs
    * phrase search into adjacent comparisons in capped-suffix order.
    *
    * Scale shape: ONE range exchange sorting the 31-word capped windows
    * (the column any LCP step must exchange anyway — capped LCPs depend
    * only on capped-window order, see
    * [[graft.operators.SuffixArray.adjacentLcp]]), then sidx + both
    * neighbor LCPs stamped in a single scan per task with partition
    * boundary windows reconciled driver-side (#partitions rows), then one
    * doc-keyed aggregation. No doubling rounds, no self-join, no window
    * function. The oracle keeps the materialized global suffix sort. */
  val q157 = Q(
    "q157_phrase_lrs",
    (s, dir) => {
      graft.operators.SuffixArray.lrsPerDoc(documents(s, dir))
        .orderBy("doc_id")
    },
    Some(raw"""
      WITH toks AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      posx AS (
        SELECT doc_id, unnest(generate_series(1, len(w))) AS i, w FROM toks),
      suf AS (
        SELECT doc_id, i - 1 AS pos,
               w[i:least(i + 30, len(w))] AS cap,
               array_to_string(w[i:], chr(1)) AS s
        FROM posx),
      -- one sort carrying the suffix strings; every later window
      -- orders by the integer rank instead (order-identical, and the
      -- O(suffix-bytes) payload never rides another sort)
      sa AS MATERIALIZED (
        SELECT doc_id, pos, cap,
               row_number() OVER (ORDER BY s, doc_id, pos) AS sidx,
               lead(cap) OVER (ORDER BY s, doc_id, pos) AS ncap
        FROM suf),
      l1 AS (
        SELECT doc_id, pos, sidx,
               CASE WHEN ncap IS NULL THEN 0
                    -- list_position yields 0 (not NULL) when no slot
                    -- differs: nullif routes the all-equal case to the
                    -- capped-min-length arm
                    ELSE coalesce(
                      nullif(list_position(
                        list_transform(list_zip(cap, ncap),
                          p -> p[1] IS NOT DISTINCT FROM p[2]),
                        false), 0) - 1,
                      least(len(cap), len(ncap)))
               END AS ln
        FROM sa),
      l2 AS (
        SELECT doc_id,
               greatest(ln,
                 coalesce(lag(ln) OVER (ORDER BY sidx), 0)) AS g
        FROM l1)
      SELECT doc_id, CAST(max(g) AS BIGINT) AS lrs_words,
             CAST(sum(CASE WHEN g >= 8 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_starts
      FROM l2 GROUP BY doc_id ORDER BY doc_id""")
  )

  /** ExactSubstr excision-yield sweep — the policy question behind
    * Lee et al.'s substring dedup, answered from the q156 suffix array:
    * for each minimum-phrase threshold L, how many documents are hit,
    * how many positions start a ≥L-word duplicated phrase, and how many
    * corpus tokens an excision pass would actually touch (per-document
    * interval UNION of the [pos, pos+g) duplicate spans, so overlapping
    * phrases are not double-counted; capped g under-counts no union
    * mass, because every inner start of a long repeat is itself a
    * start). q134 answers this for one fixed shingle width; the sweep
    * prices the policy across thresholds in one pass with no width
    * re-chosen per run.
    *
    * Scale shape: q157's single capped-window range exchange (sidx and
    * both neighbor LCPs stamped in the sorted scan) + a ×|thresholds|
    * literal explode + interval union as a doc-partitioned running-max
    * window (never global) + a ≤|thresholds|-row roll-up; the corpus
    * token total rides a 1-row broadcast. Text shuffles only inside the
    * 31-word LCP windows. */
  val q158 = Q(
    "q158_excision_sweep",
    (s, dir) => {
      val docs = documents(s, dir)
      val dup = graft.operators.SuffixArray.positionDupLens(docs)
      val thresholds = array(Seq(8, 16, 24, 31).map(v => lit(v.toLong)): _*)
      val iv = dup
        .select(col("doc_id"), col("pos"), col("g"),
          explode(thresholds).as("l_min"))
        .filter(col("g") >= col("l_min"))
        .select(col("l_min"), col("doc_id"), col("pos"),
          (col("pos") + col("g")).as("e"))
      val byDoc = Window.partitionBy("l_min", "doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cov = iv
        .withColumn("pe", max(col("e")).over(byDoc))
        .select(col("l_min"), col("doc_id"),
          greatest(lit(0L),
            col("e") - greatest(col("pos"), coalesce(col("pe"), col("pos"))))
            .as("new_cov"))
        .groupBy("l_min", "doc_id")
        .agg(sum(col("new_cov")).as("cov_tok"), count(lit(1)).as("n_pos"))
      val tot = docs
        .agg(sum(size(split(col("text"), "\\s+"))).cast("long").as("t"))
      cov.groupBy("l_min")
        .agg(count(lit(1)).as("n_docs_hit"),
          sum(col("n_pos")).as("dup_starts"),
          sum(col("cov_tok")).as("excis_tokens"))
        .crossJoin(broadcast(tot))
        .select(col("l_min"), col("n_docs_hit"), col("dup_starts"),
          col("excis_tokens"),
          expr("""cast(cast(excis_tokens as decimal(38,0)) * 1000000 div t
                  as bigint)""").as("excis_ppm"))
        .orderBy("l_min")
    },
    Some(raw"""
      WITH toks AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      posx AS (
        SELECT doc_id, unnest(generate_series(1, len(w))) AS i, w FROM toks),
      suf AS (
        SELECT doc_id, i - 1 AS pos,
               w[i:least(i + 30, len(w))] AS cap,
               array_to_string(w[i:], chr(1)) AS s
        FROM posx),
      -- one sort carrying the suffix strings; every later window
      -- orders by the integer rank instead (order-identical, and the
      -- O(suffix-bytes) payload never rides another sort)
      sa AS MATERIALIZED (
        SELECT doc_id, pos, cap,
               row_number() OVER (ORDER BY s, doc_id, pos) AS sidx,
               lead(cap) OVER (ORDER BY s, doc_id, pos) AS ncap
        FROM suf),
      l1 AS (
        SELECT doc_id, pos, sidx,
               CASE WHEN ncap IS NULL THEN 0
                    ELSE coalesce(
                      nullif(list_position(
                        list_transform(list_zip(cap, ncap),
                          p -> p[1] IS NOT DISTINCT FROM p[2]),
                        false), 0) - 1,
                      least(len(cap), len(ncap)))
               END AS ln
        FROM sa),
      l2 AS (
        SELECT doc_id, pos,
               greatest(ln,
                 coalesce(lag(ln) OVER (ORDER BY sidx), 0)) AS g
        FROM l1),
      th AS (SELECT CAST(unnest([8, 16, 24, 31]) AS BIGINT) AS l_min),
      iv AS (
        SELECT l_min, doc_id, CAST(pos AS BIGINT) AS pos,
               CAST(pos + g AS BIGINT) AS e
        FROM l2, th WHERE g >= l_min),
      u AS (
        SELECT l_min, doc_id, pos, e,
               max(e) OVER (PARTITION BY l_min, doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
        FROM iv),
      cov AS (
        SELECT l_min, doc_id,
               CAST(SUM(greatest(0, e - greatest(pos, coalesce(pe, pos))))
                 AS BIGINT) AS cov_tok,
               CAST(COUNT(*) AS BIGINT) AS n_pos
        FROM u GROUP BY l_min, doc_id),
      tot AS (
        SELECT CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT)
          AS t FROM documents)
      SELECT l_min, CAST(COUNT(*) AS BIGINT) AS n_docs_hit,
             CAST(SUM(n_pos) AS BIGINT) AS dup_starts,
             CAST(SUM(cov_tok) AS BIGINT) AS excis_tokens,
             CAST(CAST(SUM(cov_tok) AS HUGEINT) * 1000000 // t AS BIGINT)
               AS excis_ppm
      FROM cov, tot GROUP BY l_min, t ORDER BY l_min""")
  )

  /** Benchmark decontamination at ANY phrase length (q38/q96/q148 detect
    * FIXED-width shingle hits; this reports, per training document, the
    * exact longest phrase shared with any benchmark document — capped at
    * 31 words — plus how many positions start a ≥8-word shared phrase).
    * `doc_id % 17 = 0` plays the held-out benchmark. The suffix-array
    * cross-set identity does it without any train×bench comparison: the
    * max LCP against the benchmark SET is the max against the two nearest
    * benchmark suffixes in suffix order, and LCP to a non-adjacent suffix
    * is the running MIN of adjacent LCPs between them — so one two-phase
    * prefix count of benchmark positions segments the suffix order into
    * inter-benchmark gaps, and two gap-partitioned running-min windows
    * (never global) produce both directions. See
    * [[graft.operators.SuffixArray.phraseContam]].
    *
    * Scale shape: ONE capped-window range exchange (sidx + adjacent LCP
    * stamped in the sorted scan, see
    * [[graft.operators.SuffixArray.adjacentLcp]]) + ONE two-phase prefix
    * count (bounded stats to the driver) + two windows whose partitions
    * span single inter-benchmark gaps + a doc-keyed roll-up. No
    * train-vs-bench join of any kind exists in the plan. */
  val q160 = Q(
    "q160_phrase_decontam",
    (s, dir) => {
      graft.operators.SuffixArray
        .phraseContam(documents(s, dir), col("doc_id") % 17 === 0)
        .orderBy("doc_id")
    },
    Some(raw"""
      WITH toks AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      posx AS (
        SELECT doc_id, unnest(generate_series(1, len(w))) AS i, w FROM toks),
      suf AS (
        SELECT doc_id, i - 1 AS pos,
               w[i:least(i + 30, len(w))] AS cap,
               array_to_string(w[i:], chr(1)) AS s
        FROM posx),
      -- one sort carrying the suffix strings (rank stamped); the
      -- prefix-count and both gap-partitioned running-min windows then
      -- order by the integer rank — order-identical, the O(suffix-bytes)
      -- payload rides exactly one sort. l1 is MATERIALIZED: the scalar
      -- benchmark-position count reads it a second time.
      sa AS MATERIALIZED (
        SELECT doc_id, pos, doc_id % 17 = 0 AS is_bench, cap,
               row_number() OVER (ORDER BY s, doc_id, pos) AS sidx,
               lead(cap) OVER (ORDER BY s, doc_id, pos) AS ncap
        FROM suf),
      l1 AS MATERIALIZED (
        SELECT doc_id, pos, sidx, is_bench,
               CASE WHEN ncap IS NULL THEN 0
                    ELSE coalesce(
                      nullif(list_position(
                        list_transform(list_zip(cap, ncap),
                          p -> p[1] IS NOT DISTINCT FROM p[2]),
                        false), 0) - 1,
                      least(len(cap), len(ncap)))
               END AS l
        FROM sa),
      l2 AS (
        SELECT doc_id, pos, sidx, is_bench, l,
               SUM(CASE WHEN is_bench THEN 1 ELSE 0 END)
                 OVER (ORDER BY sidx ROWS UNBOUNDED PRECEDING)
                 AS pcnt
        FROM l1),
      l3 AS (
        SELECT doc_id, pos, sidx, is_bench, l, pcnt AS fwdgrp,
               pcnt + CASE WHEN is_bench THEN 0 ELSE 1 END AS bwdgrp
        FROM l2),
      l4 AS (
        SELECT doc_id, is_bench,
               CASE WHEN fwdgrp >= 1 THEN coalesce(
                 MIN(l) OVER (PARTITION BY fwdgrp ORDER BY sidx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 ELSE 0 END AS fwd,
               CASE WHEN bwdgrp <=
                      (SELECT COUNT(*) FROM l1 WHERE is_bench)
                 THEN coalesce(
                   MIN(CASE WHEN is_bench THEN 1000000 ELSE l END)
                     OVER (PARTITION BY bwdgrp
                       ORDER BY sidx DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
                 ELSE 0 END AS bwd
        FROM l3)
      SELECT doc_id,
             CAST(MAX(greatest(fwd, bwd)) AS BIGINT) AS max_shared_words,
             CAST(SUM(CASE WHEN greatest(fwd, bwd) >= 8 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_contam_starts
      FROM l4 WHERE NOT is_bench
      GROUP BY doc_id ORDER BY doc_id""")
  )

  /** Repeat-count sweep — the boilerplate-length profile: for each
    * repetition tier k ∈ {2,4,8,16}, the longest phrase (≤31 words)
    * occurring at ≥ k corpus positions, the number of suffix-order
    * windows achieving that length (an occurrence-overlap count), and
    * the lexicographically smallest achieving phrase — the table a
    * curation pass reads to decide how aggressive template/boilerplate
    * excision must be per tier. Fixed-L shingle counts (q26/q38/q140)
    * can't answer this: the sweep reports the LENGTH frontier at every
    * tier with no width chosen in advance; k=2 cross-laws with q157's
    * corpus max. See [[graft.operators.SuffixArray.repeatSweep]] for the
    * sliding-window-min-over-adjacent-LCP identity and the plan shape
    * (one capped-window range exchange + a bounded boundary-extension
    * stats job + ≤|ks| partial rows per partition). */
  val q161 = Q(
    "q161_repeat_sweep",
    (s, dir) => {
      graft.operators.SuffixArray.repeatSweep(documents(s, dir))
        .orderBy("k")
    },
    Some(raw"""
      WITH toks AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      posx AS (
        SELECT doc_id, unnest(generate_series(1, len(w))) AS i, w FROM toks),
      -- Suffixes sort by their 31-token cap, not the full suffix string:
      -- building array_to_string(w[i:], chr(1)) is O(corpus²) bytes. The
      -- orders agree wherever it matters — caps that differ compare like
      -- the full suffixes (token-wise, prefix-is-less), and entries whose
      -- caps are fully EQUAL carry identical (cap, ln=len(cap)) payloads,
      -- so permuting them permutes identical rows.
      suf AS (
        SELECT doc_id, i - 1 AS pos,
               w[i:least(i + 30, len(w))] AS cap
        FROM posx),
      sa AS (
        SELECT row_number() OVER (ORDER BY cap, doc_id, pos) AS sidx, cap,
               lead(cap) OVER (ORDER BY cap, doc_id, pos) AS ncap
        FROM suf),
      ll AS MATERIALIZED (
        SELECT sidx, cap,
               CAST(CASE WHEN ncap IS NULL THEN 0
                    ELSE coalesce(
                      nullif(list_position(
                        list_transform(list_zip(cap, ncap),
                          p -> p[1] IS NOT DISTINCT FROM p[2]), false), 0) - 1,
                      least(len(cap), len(ncap)))
               END AS BIGINT) AS ln
        FROM sa),
      ks AS (SELECT CAST(unnest([2, 4, 8, 16]) AS BIGINT) AS k),
      -- Per-tier sliding-window min via a WINDOW frame (CURRENT ROW .. k-2
      -- FOLLOWING over the suffix order) instead of the k × n² range
      -- self-join the r13 gate shipped — same rows (the range [a.sidx,
      -- a.sidx+k-2] IS that frame; count(*)=k-1 ⇔ the frame is full),
      -- hash-identical output, O(n·k) instead of join-explosion (40 s →
      -- ~2 s at sf0.1). ll is MATERIALIZED: four tiers read it, and
      -- DuckDB's CTE inlining would re-sort the suffix array per tier.
      -- the window pass carries only (sidx, ln) — threading the 31-token
      -- cap lists through four window sorts dominated the wall; caps are
      -- joined back from the materialized ll for just the max-achieving
      -- rows (sidx is unique, so the join changes no multiplicities)
      lns AS MATERIALIZED (SELECT sidx, ln FROM ll),
      ${List(2, 4, 8, 16).map { k =>
        s"""sw_$k AS (
        SELECT sidx,
               min(ln) OVER (ORDER BY sidx
                 ROWS BETWEEN CURRENT ROW AND ${k - 2} FOLLOWING) AS wmin,
               count(*) OVER (ORDER BY sidx
                 ROWS BETWEEN CURRENT ROW AND ${k - 2} FOLLOWING) AS wcnt
        FROM lns),
      swf_$k AS (
        SELECT sidx, wmin FROM sw_$k
        WHERE wcnt = ${k - 1} AND wmin >= 1),
      mx_$k AS (SELECT max(wmin) AS max_len FROM swf_$k),
      top_$k AS (
        SELECT CAST($k AS BIGINT) AS k, mx.max_len,
               CAST(count(*) AS BIGINT) AS n_max,
               min(array_to_string(ll.cap[1:CAST(mx.max_len AS INT)], ' '))
                 AS phrase
        FROM swf_$k f JOIN mx_$k mx ON f.wmin = mx.max_len
        JOIN ll ON ll.sidx = f.sidx
        GROUP BY mx.max_len)"""
      }.mkString(",\n      ")},
      top AS (SELECT * FROM top_2 UNION ALL SELECT * FROM top_4
              UNION ALL SELECT * FROM top_8 UNION ALL SELECT * FROM top_16)
      SELECT ks.k, coalesce(top.max_len, 0) AS max_len,
             coalesce(top.n_max, 0) AS n_max,
             coalesce(top.phrase, '') AS phrase
      FROM ks LEFT JOIN top ON ks.k = top.k
      ORDER BY ks.k""")
  )

  /** LSH band-geometry tuning audit — the S-curve question every
    * MinHash deployment answers before committing a config: over the
    * SAME 64-permutation signatures as q22, sweep (bands × rows/band) ∈
    * {32×2, 16×4, 8×8} and measure each geometry's candidate volume,
    * true positives, misses, recall and precision against the EXACT
    * shingle-Jaccard ≥ 0.5 ground truth. More rows/band slides the
    * collision S-curve right (fewer, higher-precision candidates); the
    * audit prices that trade with measured counts instead of the
    * analytic 1-(1-j^r)^b curve. The production bucket cap (≤64, q23's
    * guard) is INCLUDED — the audit scores the pipeline as deployed,
    * cap-induced misses and all.
    *
    * Ground truth is complete without an all-pairs scan: J > 0 requires
    * a shared shingle, so the inverted-index join (posting-list bounded,
    * q21's shape) enumerates every pair that could pass the threshold —
    * and only SHARED shingles (posting length > 1) can contribute to an
    * intersection, so the self-join input is pre-filtered to those: on
    * real text the overwhelming majority of shingles are unique, so the
    * truth join reads a small fraction of the postings (per-doc sizes
    * `sz` still count ALL shingles — the Jaccard denominator is
    * unchanged, and so is every emitted pair).
    * Scale shape: signatures and band digests shuffle, never text; each
    * geometry is one explode + self-join on capped buckets; the roll-up
    * is 3 rows; ×1e6 ratios ride DECIMAL(38,0)/HUGEINT. */
  val q166 = Q(
    "q166_lsh_tuning",
    (s, dir) => {
      val docs = documents(s, dir)
      val sigs = minhashSignatures(docs).materialized
      // 128-bit digest as two longs — the jaccardPairs discipline: same
      // equality relation as the hex string (bijection), half the bytes
      // through the distinct, the postings groupBy and the truth self-join
      val (h1c, h2c) = graft.functions.GraftFunctions.md5_128(col("sh"))
      val sh = shingles(docs, dedup = false)
        .select(col("doc_id"), h1c.as("h1"), h2c.as("h2")).distinct()
        .materialized // truth needs postings AND per-doc sizes
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val shared = sh.groupBy("h1", "h2").agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).select("h1", "h2")
      val pf = sh.join(shared, Seq("h1", "h2"))
      val truth = pf.as("a")
        .join(pf.as("b"),
          col("a.h1") === col("b.h1") && col("a.h2") === col("b.h2") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("ix"))
        .join(sz.select(col("doc_id").as("da"), col("n").as("na")), "da")
        .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), "db")
        .filter(col("ix") * 2 >= col("na") + col("nb") - col("ix"))
        .select("da", "db")
        .materialized // compared against every geometry
      // ONE signature explode emits every geometry's bands (r16 pass —
      // previously each geometry ran its own explode + cap groupBy + join
      // + self-join + distinct + materialize over the same signature
      // table: 3× every exchange and 9 count jobs). The geometry's band
      // count `g` rides every key, so the bucket partition — and thus
      // each geometry's candidate set — is exactly the per-geometry one:
      // (g, band, digest) groups never mix rows of different geometries,
      // and the self-join requires x.g = y.g. Band keys are the md5_128
      // of the SAME slot strings as before (one digest per band, the
      // struct-whole discipline), so per-geometry buckets are identical
      // by bijection; the total band-row volume through the exchanges is
      // unchanged (32+16+8 rows per doc either way), but every pipeline
      // stage now runs once instead of three times.
      val geoms = Seq((32, 2), (16, 4), (8, 8))
      // per-geometry explode projections stay separate (56 digests in ONE
      // generator expression overflows whole-stage codegen's method
      // budget), but the union is narrow — no exchange — so everything
      // from the cap groupBy down still runs once over the tagged rows
      val bands = geoms.map { case (b, r) =>
        sigs.select(col("doc_id"),
          explode(array((0 until b).map { bi =>
            val slotStr = concat_ws(",",
              (0 until r).map(ri =>
                element_at(col("sig"), bi * r + ri + 1)): _*)
            // pair struct whole — q22's one-digest-per-band discipline
            struct(lit(b.toLong).as("g"), lit(bi).as("band"),
              graft.functions.GraftFunctions.md5_pair(slotStr).as("p"))
          }: _*)).as("bb"))
          .select(col("doc_id"), col("bb.g").as("g"), col("bb.band").as("band"),
            col("bb.p.h1").as("bh1"), col("bb.p.h2").as("bh2"))
      }.reduce(_ unionByName _)
      val ok = bands.groupBy("g", "band", "bh1", "bh2")
        .agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") <= BucketCap && col("bsz") > 1)
        .select("g", "band", "bh1", "bh2")
      val bounded = bands.join(ok, Seq("g", "band", "bh1", "bh2"))
      val cand = bounded.as("x")
        .join(bounded.as("y"),
          col("x.g") === col("y.g") && col("x.band") === col("y.band") &&
            col("x.bh1") === col("y.bh1") && col("x.bh2") === col("y.bh2") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.g").as("g"),
          col("x.doc_id").as("da"), col("y.doc_id").as("db"))
        .distinct()
        .materialized // counted twice: volume + tp semi-join
      val nCand = cand.groupBy("g").agg(count(lit(1)).as("n_cand"))
      val tp = cand.join(truth, Seq("da", "db"), "left_semi")
        .groupBy("g").agg(count(lit(1)).as("tp"))
      // left joins + fill(0): a geometry whose capped buckets emit no
      // candidate pair has no group row, but the declared result still
      // reports it with n_cand = tp = 0 (the old per-geometry count(*)
      // over an empty table). `g` IS the bands count, so it joins the
      // 3-row geometry table directly.
      import s.implicits._
      val geomDf = geoms.map { case (b, r) => (b.toLong, r.toLong) }
        .toDF("bands", "rows_per_band")
      geomDf
        .join(nCand.withColumnRenamed("g", "bands"), Seq("bands"), "left")
        .join(tp.withColumnRenamed("g", "bands"), Seq("bands"), "left")
        .na.fill(0L, Seq("n_cand", "tp"))
        .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
        .select(col("bands"), col("rows_per_band"),
          col("n_cand"), col("tp"),
          (col("n_truth") - col("tp")).as("fn"),
          expr("""case when n_truth = 0 then 1000000
                  else cast(cast(tp as decimal(38,0)) * 1000000 div n_truth
                       as bigint) end""").as("recall_ppm"),
          expr("""case when n_cand = 0 then 1000000
                  else cast(cast(tp as decimal(38,0)) * 1000000 div n_cand
                       as bigint) end""").as("precision_ppm"))
        .orderBy(col("rows_per_band"))
    },
    Some {
      def geom(b: Int, r: Int) = {
        val slots = (1 to r).map(k => s"sig[b*$r+$k]").mkString(", ")
        s"""
      bands_$b AS MATERIALIZED (
        SELECT doc_id, b, md5(concat_ws(',', $slots)) AS bh
        FROM sig CROSS JOIN (SELECT unnest(range(0, $b)) AS b)),
      ok_$b AS (SELECT b, bh FROM bands_$b GROUP BY b, bh
                HAVING COUNT(*) <= $BucketCap AND COUNT(*) > 1),
      bnd_$b AS MATERIALIZED (
        SELECT bands_$b.* FROM bands_$b JOIN ok_$b USING (b, bh)),
      cand_$b AS MATERIALIZED (
        SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
        FROM bnd_$b x JOIN bnd_$b y
          ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id),
      stat_$b AS (
        SELECT CAST($b AS BIGINT) AS bands, CAST($r AS BIGINT) AS rows_per_band,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM cand_$b) AS n_cand,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM cand_$b JOIN truth USING (da, db)) AS tp)"""
      }
      s"""
      WITH words AS (
        SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents),
      idx AS (
        SELECT doc_id, w, unnest(range(1, greatest(len(w) - 4, 1) + 1)) AS i
        FROM words),
      -- MATERIALIZED on every CTE read more than once (shd ×3, pf ×2 in
      -- the truth self-join, sig ×3 — once per band geometry — truth ×4,
      -- bands/bnd/cand ×2 each): DuckDB's default CTE inlining recomputed
      -- the 64-permutation signature build once PER GEOMETRY and the
      -- shingle scan per reader (37 s → ~8 s at sf0.1), values unchanged.
      shd AS MATERIALIZED (
        SELECT DISTINCT doc_id, md5(array_to_string(w[i:i+4], ' ')) AS h
        FROM idx),
      hh AS (
        SELECT doc_id,
               ('0x' || substr(md5(sh2), 1, 8))::BIGINT AS lo,
               ('0x' || substr(md5(sh2), 9, 8))::BIGINT AS hi
        FROM (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS sh2
              FROM idx)),
      consts AS (
        SELECT unnest(range(0, $MinhashK)) AS i,
               unnest(${sqlList(PermA)}) AS pa,
               unnest(${sqlList(PermB)}) AS pb,
               unnest(${sqlList(PermC)}) AS pc),
      perm AS (
        SELECT doc_id, i, MIN((pa*lo + pb*hi + pc) % $P61) AS v
        FROM hh CROSS JOIN consts GROUP BY doc_id, i),
      sig AS MATERIALIZED (
        SELECT doc_id, list(v ORDER BY i) AS sig FROM perm GROUP BY doc_id),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY doc_id),
      shared AS (SELECT h FROM shd GROUP BY h HAVING COUNT(*) > 1),
      pf AS MATERIALIZED (SELECT shd.* FROM shd JOIN shared USING (h)),
      truth AS MATERIALIZED (
        SELECT da, db FROM (
          SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS ix
          FROM pf a JOIN pf b ON a.h = b.h AND a.doc_id < b.doc_id
          GROUP BY da, db) i
        JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
        WHERE ix * 2 >= sa.n + sb.n - ix),
      nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
      ${geom(32, 2)}, ${geom(16, 4)}, ${geom(8, 8)}
      SELECT bands, rows_per_band, n_cand, tp, n_truth - tp AS fn,
             CASE WHEN n_truth = 0 THEN 1000000
                  ELSE CAST(CAST(tp AS HUGEINT) * 1000000 // n_truth AS BIGINT)
             END AS recall_ppm,
             CASE WHEN n_cand = 0 THEN 1000000
                  ELSE CAST(CAST(tp AS HUGEINT) * 1000000 // n_cand AS BIGINT)
             END AS precision_ppm
      FROM (SELECT * FROM stat_32 UNION ALL SELECT * FROM stat_16
            UNION ALL SELECT * FROM stat_8), nt
      ORDER BY rows_per_band"""
    }
  )

  /** Phrase spectrum — distinct-phrase counts at EVERY length 1..31 in
    * one pass: for each ℓ, the number of ℓ-word positions, the number of
    * DISTINCT ℓ-word phrases, and the distinct share (×1e6) — the
    * diversity profile that q140 answers for one fixed n, for all n at
    * once. The suffix-array identity: sorted by capped window, equal
    * ℓ-prefixes are contiguous, so
    * `distinct(ℓ) = positions(ℓ) − #{adjacent pairs with LCP ≥ ℓ}` —
    * the whole spectrum falls out of the adjacent-LCP HISTOGRAM, one
    * range exchange instead of 31 separate shingle wordcounts (the
    * oracle counts each length's distinct set DIRECTLY, so the identity
    * itself is hash-checked, not assumed).
    *
    * Scale shape: [[graft.operators.SuffixArray.adjacentLcp]]'s single
    * capped-window exchange + a ≤cap-row LCP histogram (map-side
    * combined) + a doc-length histogram (bounded by max doc length);
    * the per-ℓ roll-up is a 31×maxlen literal cross of TINY aggregates
    * — no corpus-sized work after the exchange. */
  val q167 = Q(
    "q167_phrase_spectrum",
    (s, dir) => {
      val docs = documents(s, dir)
      val cap = 31
      // LCP histogram: tiny (values 0..cap)
      val hist = graft.operators.SuffixArray.adjacentLcp(docs, cap)
        .groupBy(col("l")).agg(count(lit(1)).as("c"))
      // doc-length histogram: bounded by max doc length
      val dl = docs
        .select(size(split(col("text"), "\\s+")).cast("long").as("dlen"))
        .groupBy("dlen").agg(count(lit(1)).as("d"))
      val lsDf = s.range(1, cap + 1).select(col("id").as("len"))
      val a = lsDf.join(dl, col("dlen") >= col("len"))
        .groupBy("len")
        .agg(sum((col("dlen") - col("len") + 1L) * col("d"))
          .as("n_positions"))
      val b = lsDf.join(hist, col("l") >= col("len"), "left")
        .groupBy("len")
        .agg(coalesce(sum(col("c")), lit(0L)).as("n_dup_adj"))
      a.join(b, Seq("len"))
        .select(col("len"),
          col("n_positions"),
          (col("n_positions") - col("n_dup_adj")).as("n_distinct"),
          expr("""cast(cast(n_positions - n_dup_adj as decimal(38,0))
                  * 1000000 div n_positions as bigint)""")
            .as("distinct_ppm"))
        .orderBy("len")
    },
    Some(raw"""
      WITH toks AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      ls AS (SELECT CAST(unnest(range(1, 32)) AS BIGINT) AS len),
      posx AS (
        SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i FROM toks),
      grams AS (
        SELECT ls.len, md5(array_to_string(w[i:i+CAST(len AS INT)-1], ' '))
          AS h
        FROM posx JOIN ls ON len(w) - i + 1 >= ls.len)
      SELECT len, CAST(COUNT(*) AS BIGINT) AS n_positions,
             CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct,
             CAST(CAST(COUNT(DISTINCT h) AS HUGEINT) * 1000000 // COUNT(*)
               AS BIGINT) AS distinct_ppm
      FROM grams GROUP BY len ORDER BY len""")
  )

  /** Containment (overlap-coefficient) dedup — the asymmetric-duplication
    * catch Jaccard structurally misses (Broder 1997 distinguishes
    * resemblance from containment): a short document fully embedded in a
    * long one has |A∩B|/|A| ≈ 1 but Jaccard ≈ |A|/|B|, far below any
    * resemblance threshold. Pairs with overlap coefficient
    * |A∩B|/min(|A|,|B|) ≥ 0.8 are flagged, with both ratios reported and
    * a `jaccard_missed` marker for the pairs a 0.5-Jaccard pipeline
    * (q21/q22's threshold) would have let through — the measured
    * coverage gap that motivates running both filters.
    *
    * Scale shape: q21's posting-list-bounded inverted-index join (only
    * pairs sharing a shingle digest are ever materialized; digests
    * shuffle, text never), two broadcast-sized size-table joins, ×1e6
    * ratios in DECIMAL(38,0)/HUGEINT. */
  val q168 = Q(
    "q168_containment_dedup",
    (s, dir) => {
      val docs = documents(s, dir)
      val sh = shingleDigests(docs)
        .materialized // postings + per-doc set sizes
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      sh.as("a")
        .join(sh.as("b"),
          col("a.h1") === col("b.h1") && col("a.h2") === col("b.h2") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("ix"))
        .join(sz.select(col("doc_id").as("da"), col("n").as("na")), "da")
        .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), "db")
        .withColumn("cont_ppm", expr(
          """cast(cast(ix as decimal(38,0)) * 1000000 div least(na, nb)
             as bigint)"""))
        .withColumn("jac_ppm", expr(
          """cast(cast(ix as decimal(38,0)) * 1000000 div (na + nb - ix)
             as bigint)"""))
        .filter(col("cont_ppm") >= 800000L)
        .withColumn("jaccard_missed", (col("jac_ppm") < 500000L).cast("int"))
        .select("da", "db", "na", "nb", "ix", "cont_ppm", "jac_ppm",
          "jaccard_missed")
        .orderBy("da", "db")
    },
    Some(raw"""
      WITH words AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      idx AS (
        SELECT doc_id, w, unnest(range(1, greatest(len(w) - 4, 1) + 1)) AS i
        FROM words),
      sh AS (
        SELECT DISTINCT doc_id, md5(array_to_string(w[i:i+4], ' ')) AS h
        FROM idx),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      pairs AS (
        SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS ix
        FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY da, db),
      scored AS (
        SELECT da, db, sa.n AS na, sb.n AS nb, ix,
               CAST(CAST(ix AS HUGEINT) * 1000000 // least(sa.n, sb.n)
                 AS BIGINT) AS cont_ppm,
               CAST(CAST(ix AS HUGEINT) * 1000000 // (sa.n + sb.n - ix)
                 AS BIGINT) AS jac_ppm
        FROM pairs JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db)
      SELECT da, db, na, nb, ix, cont_ppm, jac_ppm,
             CAST(jac_ppm < 500000 AS INT) AS jaccard_missed
      FROM scored WHERE cont_ppm >= 800000
      ORDER BY da, db""")
  )

  /** Normalization-ladder dedup audit — how much each normalization
    * stage actually buys: cluster counts under three keys (raw text;
    * lowercase + collapsed whitespace; q95's aggressive digits→0 /
    * punctuation-strip form), with per-tier duplicate mass and the
    * MARGINAL merges each stage adds over the previous one — the
    * evidence for (or against) running the aggressive normalizer at all.
    * All three digests are computed in ONE corpus scan and reduced by
    * one aggregate (three hash-keyed COUNT DISTINCTs + a count), then a
    * 3-row unpivot — the ladder costs one pass, not one pass per tier.
    *
    * Scale shape: map-side projection of three md5s, one global
    * aggregate whose partial state is the distinct-digest sets (32-byte
    * keys, map-side combined), constant-size output. */
  val q170 = Q(
    "q170_norm_ladder",
    (s, dir) => {
      val t1 = trim(regexp_replace(lower(col("text")), " +", " "))
      val t2 = trim(regexp_replace(regexp_replace(regexp_replace(
        lower(col("text")),
        "[0-9]", "0"),
        "[^a-z0 ]", " "),
        " +", " "))
      documents(s, dir)
        .select(md5(col("text")).as("h0"), md5(t1).as("h1"),
          md5(t2).as("h2"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("h0")).as("c0"),
          countDistinct(col("h1")).as("c1"),
          countDistinct(col("h2")).as("c2"))
        .select(expr(
          """stack(3,
               CAST(0 AS BIGINT), 'raw', c0, n_docs - c0, n_docs - c0,
               CAST(1 AS BIGINT), 'case_ws', c1, n_docs - c1, c0 - c1,
               CAST(2 AS BIGINT), 'aggressive', c2, n_docs - c2, c1 - c2)
             as (tier, norm, n_clusters, dup_docs, marginal_merges)"""),
          col("n_docs"))
        .select(col("tier"), col("norm"), col("n_clusters"),
          col("dup_docs"), col("marginal_merges"),
          expr("""cast(cast(dup_docs as decimal(38,0)) * 1000000
                  div n_docs as bigint)""").as("dup_ppm"))
        .orderBy("tier")
    },
    Some(raw"""
      WITH h AS (
        SELECT md5(text) AS h0,
               md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS h1,
               md5(trim(regexp_replace(regexp_replace(regexp_replace(
                 lower(text),
                 '[0-9]', '0', 'g'),
                 '[^a-z0 ]', ' ', 'g'),
                 ' +', ' ', 'g'))) AS h2
        FROM documents),
      a AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT h0) AS BIGINT) AS c0,
               CAST(COUNT(DISTINCT h1) AS BIGINT) AS c1,
               CAST(COUNT(DISTINCT h2) AS BIGINT) AS c2
        FROM h)
      SELECT u.tier, u.norm, u.n_clusters, u.dup_docs, u.marginal_merges,
             CAST(CAST(u.dup_docs AS HUGEINT) * 1000000 // n_docs AS BIGINT)
               AS dup_ppm
      FROM a, LATERAL (VALUES
        (CAST(0 AS BIGINT), 'raw', c0, n_docs - c0, n_docs - c0),
        (CAST(1 AS BIGINT), 'case_ws', c1, n_docs - c1, c0 - c1),
        (CAST(2 AS BIGINT), 'aggressive', c2, n_docs - c2, c1 - c2))
        AS u(tier, norm, n_clusters, dup_docs, marginal_merges)
      ORDER BY u.tier""")
  )

  /** Per-benchmark-item containment decontamination — the eval-centric
    * leak report: for EACH benchmark document (doc_id % 17 = 0, q160's
    * panel), how many training documents share any 8-word shingle with
    * it, how many CONTAIN ≥ 80% of its shingle set (the "eval answer
    * embedded in a training doc" case — a short eval item inside a long
    * page barely moves the page's contaminated-fraction score q96
    * computes, but kills the benchmark), and the worst containment seen.
    * Denominators are the BENCHMARK side's shingle counts — the
    * direction fraction-of-train scoring cannot express.
    *
    * Scale shape: the benchmark side is a fixed panel (corpus-fraction
    * independent at deployment — eval suites don't grow with the crawl),
    * so the postings join broadcasts it under AQE; digests shuffle,
    * text never; one (bench × train)-pair aggregate bounded by shared
    * postings, one bench-keyed roll-up (panel-sized output); ppm in
    * DECIMAL(38,0)/HUGEINT. */
  val q171 = Q(
    "q171_bench_containment",
    (s, dir) => {
      val docs = documents(s, dir)
      val sh = shingleDigests(docs, nWords = 8)
        .materialized // split into both sides of the postings join
      val bench = sh.filter(col("doc_id") % 17 === 0)
      val bsz = bench.groupBy(col("doc_id").as("bdoc"))
        .agg(count(lit(1)).as("nb"))
      val per = sh.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id").as("tdoc"), col("h1"), col("h2"))
        .join(bench.select(col("doc_id").as("bdoc"), col("h1"), col("h2")),
          Seq("h1", "h2"))
        .groupBy("bdoc", "tdoc").agg(count(lit(1)).as("ix"))
        .join(bsz, Seq("bdoc"))
        .withColumn("cont_ppm", expr(
          "cast(cast(ix as decimal(38,0)) * 1000000 div nb as bigint)"))
        .groupBy("bdoc")
        .agg(count(lit(1)).as("n_train_sharing"),
          sum((col("ix") * 5 >= col("nb") * 4).cast("long"))
            .as("n_train_containing"),
          max(col("cont_ppm")).as("max_cont_ppm"))
      bsz.join(per, Seq("bdoc"), "left")
        .select(col("bdoc"), col("nb"),
          coalesce(col("n_train_sharing"), lit(0L)).as("n_train_sharing"),
          coalesce(col("n_train_containing"), lit(0L))
            .as("n_train_containing"),
          coalesce(col("max_cont_ppm"), lit(0L)).as("max_cont_ppm"))
        .orderBy("bdoc")
    },
    Some(raw"""
      WITH words AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      idx AS (
        SELECT doc_id, w, unnest(range(1, greatest(len(w) - 7, 1) + 1)) AS i
        FROM words),
      sh8 AS (
        SELECT DISTINCT doc_id, md5(array_to_string(w[i:i+7], ' ')) AS h
        FROM idx),
      bsz AS (
        SELECT doc_id AS bdoc, COUNT(*) AS nb FROM sh8
        WHERE doc_id % 17 = 0 GROUP BY doc_id),
      pairs AS (
        SELECT b.doc_id AS bdoc, t.doc_id AS tdoc, COUNT(*) AS ix
        FROM sh8 b JOIN sh8 t ON b.h = t.h
        WHERE b.doc_id % 17 = 0 AND t.doc_id % 17 <> 0
        GROUP BY bdoc, tdoc),
      per AS (
        SELECT pairs.bdoc,
               CAST(COUNT(*) AS BIGINT) AS n_train_sharing,
               CAST(SUM(CASE WHEN ix * 5 >= nb * 4 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_train_containing,
               MAX(CAST(CAST(ix AS HUGEINT) * 1000000 // nb AS BIGINT))
                 AS max_cont_ppm
        FROM pairs JOIN bsz ON pairs.bdoc = bsz.bdoc
        GROUP BY pairs.bdoc)
      SELECT bsz.bdoc, CAST(nb AS BIGINT) AS nb,
             COALESCE(n_train_sharing, 0) AS n_train_sharing,
             COALESCE(n_train_containing, 0) AS n_train_containing,
             COALESCE(max_cont_ppm, 0) AS max_cont_ppm
      FROM bsz LEFT JOIN per ON bsz.bdoc = per.bdoc
      ORDER BY bsz.bdoc""")
  )

  /** Cross-document repeated-LINE boilerplate removal — the C4/CCNet
    * line-grain cleaning step (Raffel et al. 2020 drop repeated spans;
    * CCNet's per-shard line dedup kills headers, nav bars, cookie
    * banners — the single most common real-world web-corpus cleaning
    * pass), closing the grain ladder between doc-level (q20/q95),
    * chunk-level keep-first (q101) and span-level excision (q134):
    * a LINE is boilerplate iff its exact content occurs in MORE THAN ONE
    * DISTINCT document (within-doc repetition alone is legit prose —
    * cross-doc recurrence is the boilerplate signal), and ALL of its
    * occurrences are dropped (C4's rule; deliberately different from
    * q101's first-occurrence-survives — a nav bar's first sighting is
    * just as much boilerplate as its millionth).
    *
    * This corpus has no newline structure, so the line stand-in is the
    * 6-token non-overlapping window (a real pipeline swaps only the
    * splitter — `split(text, '\n')` — and keeps every downstream shape);
    * 6 ≠ q101's 8 keeps the two operators' chunk artifacts independent.
    *
    * Per doc: line count, dropped count, tokens kept, the Gopher-style
    * duplicate-line fraction in basis points (the quality-filter signal
    * MassiveText thresholds at 30%), and the reassembled clean text.
    *
    * Scale shape: the doc-frequency aggregate shuffles (digest, doc_id)
    * only; line text crosses two exchanges — the digest-keyed flag join
    * and the doc_id-keyed reassembly (the same exchange that writes the
    * cleaned corpus out) — both linear at line grain, the q101
    * discipline. No window over corpus-wide partitions, no driver
    * state. */
  val q175 = Q(
    "q175_line_dedup",
    (s, dir) => {
      val lineLen = 6
      val toks = documents(s, dir)
        .select(col("doc_id"),
          filter(split(col("text"), "\\s+"), x => length(x) > 0).as("ws"))
        .filter(size(col("ws")) > 0)
      val lines = toks
        .select(col("doc_id"),
          explode(transform(
            sequence(lit(0),
              ((size(col("ws")) + lit(lineLen - 1)) / lit(lineLen))
                .cast("int") - 1),
            k => struct(k.as("line_idx"),
              concat_ws(" ", slice(col("ws"), k * lineLen + 1, lit(lineLen)))
                .as("ltext")))).as("l"))
        .select(col("doc_id"), col("l.line_idx").as("line_idx"),
          col("l.ltext").as("ltext"))
        .withColumn("lh", md5(col("ltext")))
      // doc frequency at digest grain: (32-byte hex digest, doc_id) rows
      val dfTab = lines.groupBy("lh")
        .agg(countDistinct(col("doc_id")).as("df"))
      lines.join(dfTab, Seq("lh"))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_lines"),
          sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_dropped"),
          sum(when(col("df") === 1, size(split(col("ltext"), " ")))
            .otherwise(0)).cast("long").as("tokens_kept"),
          concat_ws(" ", transform(
            array_sort(collect_list(
              when(col("df") === 1,
                struct(col("line_idx"), col("ltext"))))),
            x => x.getField("ltext"))).as("clean_text"))
        .withColumn("dup_line_bp",
          expr("n_dropped * 10000 div n_lines"))
        .select("doc_id", "n_lines", "n_dropped", "tokens_kept",
          "dup_line_bp", "clean_text")
        .orderBy("doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                   x -> length(x) > 0) AS ws
        FROM documents),
      lines AS (
        SELECT doc_id, k AS line_idx,
               array_to_string(ws[k * 6 + 1 : k * 6 + 6], ' ') AS ltext
        FROM (SELECT doc_id, ws,
                     unnest(range(0, CAST((len(ws) + 5) // 6 AS INT))) AS k
              FROM toks WHERE len(ws) > 0)),
      df AS (
        SELECT ltext, COUNT(DISTINCT doc_id) AS df
        FROM lines GROUP BY ltext)
      SELECT l.doc_id,
             COUNT(*) AS n_lines,
             CAST(SUM(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped,
             CAST(SUM(CASE WHEN df.df = 1
                           THEN len(string_split(ltext, ' '))
                           ELSE 0 END) AS BIGINT) AS tokens_kept,
             CAST(SUM(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) AS BIGINT)
               * 10000 // COUNT(*) AS dup_line_bp,
             COALESCE(string_agg(CASE WHEN df.df = 1 THEN ltext END, ' '
                                 ORDER BY line_idx), '') AS clean_text
      FROM lines l JOIN df USING (ltext)
      GROUP BY l.doc_id ORDER BY l.doc_id""")
  )

  val all: Seq[Q] = Seq(q20, q21, q22, q23, q24, q26, q38, q71, q74, q76,
    q82, q88, q90, q91, q95, q101, q103, q114, q115, q130, q133, q134,
    q141, q143, q144, q155, q156, q157, q158, q160, q161, q166, q167, q168,
    q170, q171, q175)
}
