package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * only candidates are verified. Everything is derived from xxhash64 with
  * literal seeds — deterministic across runs, partitionings, and cluster
  * sizes.
  */
object DedupQueries {

  /** words → 5-word shingle strings, 1 row per (doc_id, shingle), distinct. */
  private def shingles(docs: DataFrame, nWords: Int = 5): DataFrame = {
    docs
      .select(col("doc_id"), split(col("text"), "\\s+").as("w"))
      .select(
        col("doc_id"),
        explode(sequence(lit(1), greatest(size(col("w")) - (nWords - 1), lit(1))))
          .as("i"),
        col("w"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("w"), col("i"), lit(nWords))).as("sh"))
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

  /** Exact n-gram (5-word shingle) Jaccard similarity for all intersecting
    * pairs above a threshold. The threshold test uses integer arithmetic
    * (`inter * 20 >= union`) so no float comparison can diverge between
    * engines; the reported jaccard is a ratio of identical ints → identical
    * doubles. This is the exact (quadratic-in-collisions) verifier; the
    * scalable candidate generator is q21_dedup_minhash. */
  val q21 = Q(
    "q21_ngram_jaccard",
    (s, dir) => {
      val sh = shingles(documents(s, dir)).localCheckpoint()
      val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val pairs = sh.as("a")
        .join(sh.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      pairs
        .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
        .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
        .select(
          col("doc_a"), col("doc_b"), col("inter").as("inter_cnt"),
          (col("inter").cast("double") /
            (col("ca.n") + col("cb.n") - col("inter"))).as("jaccard"))
        .filter(col("inter_cnt") * 20 >= (col("ca.n") + col("cb.n") - col("inter_cnt")))
        .orderBy("doc_a", "doc_b")
    },
    Some("""
      WITH words AS (
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
        GROUP BY a.doc_id, b.doc_id)
      SELECT doc_a, doc_b, inter AS inter_cnt,
             CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) AS jaccard
      FROM pairs
      JOIN counts ca ON ca.doc_id = doc_a
      JOIN counts cb ON cb.doc_id = doc_b
      WHERE inter * 20 >= (ca.n + cb.n - inter)
      ORDER BY doc_a, doc_b""")
  )

  private val MinhashK = 64 // signature length
  private val Bands = 16    // 16 bands × 4 rows

  /** MinHash signature per doc: element i = min over shingles of
    * xxhash64(i, shingle). The per-shingle 64-hash vector is one codegen'd
    * `transform`; the fold is the custom [[graft.functions.ArrayLongFold]]
    * aggregate (single primitive-array buffer — 64 separate min() columns
    * blow the codegen method limit and fall back to interpreted aggregation,
    * ~5x slower at bench scale). Map-side partial fold still applies, so
    * the shuffle carries one 64-long array per (partition, doc). */
  private def minhashSignatures(docs: DataFrame): DataFrame = {
    import graft.functions.ArrayLongFold.arrayMinAgg
    // Hash the shingle STRING once; derive the 64 permutation values by
    // hashing (i, h64) pairs — 64 long-hashes instead of 64 string-hashes
    // per shingle (the string rehash was the whole pipeline's hot spot).
    // Also: plain array(...) of hash calls, NOT transform(sequence(...)):
    // higher-order-function lambdas evaluate interpreted, the array
    // constructor stays in whole-stage codegen.
    shingles(docs)
      .select(col("doc_id"), xxhash64(col("sh")).as("h64"))
      .select(col("doc_id"),
        array((0 until MinhashK).map(i => xxhash64(lit(i), col("h64"))): _*)
          .as("hs"))
      .groupBy("doc_id")
      .agg(arrayMinAgg(col("hs")).as("sig"))
  }

  /** MinHash + LSH banding near-dup candidates, verified by signature
    * agreement. No oracle: xxhash64 has no DuckDB twin → rows-only check.
    *
    * Pipeline: signature → explode 16 bands (band hash = xxhash64 of the
    * band's 4 signature slots) → self-join on (band index, band hash) →
    * distinct candidate pairs → estimated jaccard = fraction of agreeing
    * signature positions, keep >= 0.5. Join keys are (int, long) pairs —
    * at 100 TB the shuffle moves only signatures, never documents. */
  val q22 = Q(
    "q22_dedup_minhash",
    (s, dir) => {
      // localCheckpoint (not cache): the signature table is referenced by 4
      // downstream branches (bands, okBuckets, both sides of the est join);
      // with a lazy cache each branch re-plans + re-codegens the whole
      // shingle pipeline. The checkpoint truncates lineage at a table of
      // n_docs × 64 longs — tiny at any corpus size.
      val sigs = minhashSignatures(documents(s, dir)).localCheckpoint()
      val bands = sigs.select(
        col("doc_id"),
        explode(array((0 until Bands).map { b =>
          struct(lit(b).as("band"),
            xxhash64((0 until 4).map(r => element_at(col("sig"), b * 4 + r + 1)): _*)
              .as("bh"))
        }: _*)).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
      // over-full bucket guard — see q23's BucketCap note
      val okBuckets = bands.groupBy("band", "bh")
        .agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") <= 64 && col("bsz") > 1)
        .select("band", "bh")
      val bounded = bands.join(broadcast(okBuckets), Seq("band", "bh"))
      val cand = bounded.as("x")
        .join(bounded.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
        .localCheckpoint() // candidate set is small by construction (capped buckets)
      // positional agreement count as 64 codegen'd comparisons — an
      // aggregate(zip_with(...)) lambda evaluates interpreted and dominates
      // runtime once candidates number in the millions
      val agreement = (0 until MinhashK).map(i =>
        when(element_at(col("sa.sig"), i + 1) === element_at(col("sb.sig"), i + 1), 1)
          .otherwise(0)).reduce(_ + _)
      val est = cand
        .join(sigs.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sigs.as("sb"), col("doc_b") === col("sb.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          (agreement.cast("double") / MinhashK).as("est_jaccard"))
      est.filter(col("est_jaccard") >= 0.5).orderBy("doc_a", "doc_b")
    },
    None
  )

  /** SimHash near-dup: 64-bit signature by per-bit weighted vote over word
    * hashes; candidates generated by banding the signature into 4×16-bit
    * chunks (two fingerprints within Hamming distance 3 must share at least
    * one chunk); verified with bit_count(xor) <= 3. No oracle (hash-based).
    */
  val q23 = Q(
    "q23_dedup_simhash",
    (s, dir) => {
      import graft.functions.ArrayLongFold.arraySumAgg
      val words = documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("word"))
        .select(col("doc_id"), xxhash64(col("word")).as("h"))
      // per-word vote vector: +1 if bit set else -1, folded per doc by the
      // custom array-sum aggregate (see minhashSignatures for why not 64
      // separate sum() columns); sign of each vote → signature bit
      // array(...) of 64 codegen'd bit tests (HOF lambdas are interpreted)
      val sigs = words
        .select(col("doc_id"),
          array((0 until 64).map(b =>
            when(col("h").bitwiseAND(lit(1L << b)) =!= 0L, 1L).otherwise(-1L)
          ): _*).as("votes"))
        .groupBy("doc_id")
        .agg(arraySumAgg(col("votes")).as("v"))
        .select(col("doc_id"),
          aggregate(
            zip_with(col("v"), typedLit((0 until 64).map(1L << _)),
              (vote, p) => when(vote > 0, p).otherwise(lit(0L))),
            lit(0L), (acc, x) => acc.bitwiseOR(x)).as("simhash"))
        .localCheckpoint() // multi-branch reuse, see q22's sigs note
      val chunks = sigs.select(
        col("doc_id"), col("simhash"),
        explode(array((0 until 4).map { c =>
          struct(lit(c).as("chunk"),
            shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xffffL)).as("ch"))
        }: _*)).as("cc"))
        .select(col("doc_id"), col("simhash"), col("cc.chunk").as("chunk"), col("cc.ch").as("ch"))
      // Over-full bucket guard (standard LSH practice): a chunk value
      // shared by B docs contributes B^2/2 candidate pairs; on adversarial
      // or highly-repetitive corpora (like this tiny-vocabulary synthetic
      // one) a single hot bucket can go quadratic. Buckets above the cap
      // are SKIPPED — candidates lost there are still found via their
      // other 3 chunks unless those are also over-full. NOT silent: the
      // cap is part of the operator contract (recall/cost trade).
      val BucketCap = 64
      val okBuckets = chunks.groupBy("chunk", "ch")
        .agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") <= BucketCap && col("bsz") > 1)
        .select("chunk", "ch")
      val bounded = chunks.join(broadcast(okBuckets), Seq("chunk", "ch"))
      bounded.as("x")
        .join(bounded.as("y"),
          col("x.chunk") === col("y.chunk") && col("x.ch") === col("y.ch") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    },
    None
  )

  val all: Seq[Q] = Seq(q20, q21, q22, q23)
}
