package graft.queries

import graft.operators.Materialize.MaterializeOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import Tables._

/** Text-analysis suite over `documents` — the training-data-pipeline text
  * operators (BASELINE.json north star): token counting, quality scoring,
  * language-ID, and document fingerprinting.
  *
  * All per-document metrics are narrow map-side expressions (one projection,
  * no shuffle, fully whole-stage-codegen) — at 100 TB these run at scan
  * speed. Ratios are int/int divisions so both engines produce identical
  * doubles; regex patterns are restricted to syntax Java regex and RE2
  * (DuckDB) interpret identically.
  */
object TextQueries {

  // stopword/marker counting uses token-set membership (split + lambda
  // filter), NOT regex alternation: regexp_extract_all with a big
  // alternation gets duplicated across downstream expression trees by the
  // optimizer and cost ~100x more at bench scale; list filters are a single
  // codegen'd pass and DuckDB's list_filter matches exactly.
  private val StopWords = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  private def countTokensIn(words: Seq[String]): org.apache.spark.sql.Column =
    size(filter(split(col("text"), "\\s+"),
      t => t.isInCollection(words))).cast("long")

  private def countTokensInSql(words: Seq[String]): String =
    s"""CAST(len(list_filter(string_split_regex(text, '\\s+'),
        t -> t IN (${words.map(w => s"'$w'").mkString(",")}))) AS BIGINT)"""

  /** Token count + quality scoring: whitespace tokens, punctuation count,
    * stopword count/ratio, average token length. */
  val q30 = Q(
    "q30_text_stats",
    (s, dir) => {
      val nTokens = size(split(col("text"), "\\s+")).cast("long")
      val nStop = countTokensIn(StopWords)
      documents(s, dir)
        .select(
          col("doc_id"),
          col("n_chars"),
          nTokens.as("n_tokens"),
          length(regexp_replace(col("text"), "[^.,;:!?]", "")).cast("long")
            .as("n_punct"),
          nStop.as("n_stop"),
          (nStop.cast("double") / nTokens).as("stop_ratio"),
          (length(col("text")).cast("double") / nTokens).as("avg_token_len"))
        .orderBy("doc_id")
    },
    Some(s"""
      SELECT doc_id, n_chars,
             CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens,
             CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
             ${countTokensInSql(StopWords)} AS n_stop,
             CAST(${countTokensInSql(StopWords)} AS DOUBLE)
               / len(string_split_regex(text, '\\s+')) AS stop_ratio,
             CAST(length(text) AS DOUBLE)
               / len(string_split_regex(text, '\\s+')) AS avg_token_len
      FROM documents ORDER BY doc_id""")
  )

  /** Language-ID by marker-word voting: count per-language function words,
    * predict the argmax (ties broken by fixed language priority). The same
    * closed formula runs in both engines, so the oracle checks the full
    * pipeline, not ground truth. */
  val q31 = Q(
    "q31_lang_id",
    (s, dir) => {
      val markers = Seq(
        "en" -> Seq("the", "and", "of", "is", "was", "with"),
        "de" -> Seq("der", "die", "das", "und", "ist", "mit"),
        "fr" -> Seq("le", "la", "les", "et", "est", "avec"),
        "es" -> Seq("el", "los", "las", "y", "es", "con"))
      val scored = documents(s, dir).select(
        col("doc_id") +: col("lang") +:
          markers.map { case (lang, words) =>
            countTokensIn(words).as(s"c_$lang")
          }: _*)
      val pred = when(
        col("c_en") >= col("c_de") && col("c_en") >= col("c_fr") &&
          col("c_en") >= col("c_es") && col("c_en") > 0, "en")
        .when(col("c_de") >= col("c_fr") && col("c_de") >= col("c_es") &&
          col("c_de") > 0, "de")
        .when(col("c_fr") >= col("c_es") && col("c_fr") > 0, "fr")
        .when(col("c_es") > 0, "es")
        .otherwise("und")
      scored
        .select(col("doc_id"), col("lang").as("labeled_lang"),
          pred.as("pred_lang"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH scored AS (
        SELECT doc_id, lang,
          ${countTokensInSql(Seq("the", "and", "of", "is", "was", "with"))} AS c_en,
          ${countTokensInSql(Seq("der", "die", "das", "und", "ist", "mit"))} AS c_de,
          ${countTokensInSql(Seq("le", "la", "les", "et", "est", "avec"))} AS c_fr,
          ${countTokensInSql(Seq("el", "los", "las", "y", "es", "con"))} AS c_es
        FROM documents)
      SELECT doc_id, lang AS labeled_lang,
        CASE WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es AND c_en > 0 THEN 'en'
             WHEN c_de >= c_fr AND c_de >= c_es AND c_de > 0 THEN 'de'
             WHEN c_fr >= c_es AND c_fr > 0 THEN 'fr'
             WHEN c_es > 0 THEN 'es'
             ELSE 'und' END AS pred_lang
      FROM scored ORDER BY doc_id""")
  )

  /** Document fingerprinting via the custom codegen'd expressions in
    * [[graft.functions.WinnowHash]]: a whole-content polynomial fingerprint
    * plus the min AND max window hash over 32-code-point windows — the
    * winnowing building blocks (the min-hash is the winnowing fingerprint
    * proper; the max doubles the discriminating power for free since the
    * rolling pass already visits every window). The mod-(2^31-1) arithmetic
    * keeps every intermediate below 2^52, so DuckDB recomputes the exact
    * values with a per-window `list_reduce` and the query is fully
    * hash-checked. (The 64-bit wraparound `rolling_hash` stays in the API
    * for content-defined chunking; it is unit-tested, not oracle-shaped.) */
  val q32 = Q(
    "q32_fingerprint",
    (s, dir) => {
      import graft.functions.GraftFunctions.{poly_fingerprint, winnow_max, winnow_min}
      documents(s, dir)
        .select(
          col("doc_id"),
          poly_fingerprint(col("text")).as("fingerprint"),
          winnow_min(col("text"), 32).as("win_min"),
          winnow_max(col("text"), 32).as("win_max"))
        .orderBy("doc_id")
    },
    // list_reduce has no init value in DuckDB 1.0, but the seedless fold is
    // identical: reduce([c0,c1,...]) = ((c0*B+c1)*B+c2)... = fold from 0.
    Some("""
      WITH cs AS (
        SELECT doc_id,
               list_transform(string_split(text, ''),
                              ch -> CAST(unicode(ch) AS BIGINT)) AS cp,
               length(text) AS n
        FROM documents),
      wh AS (
        SELECT doc_id,
               CASE WHEN n = 0 THEN 0
                    ELSE list_reduce(cp, (h, c) -> (h * 1000003 + c) % 2147483647)
               END AS fingerprint,
               CASE WHEN n = 0 THEN [0]
                    ELSE list_transform(range(1, greatest(n - 31, 1) + 1),
                           i -> list_reduce(cp[i:i+31],
                                  (h, c) -> (h * 1000003 + c) % 2147483647))
               END AS whs
        FROM cs)
      SELECT doc_id, fingerprint,
             list_aggregate(whs, 'min') AS win_min,
             list_aggregate(whs, 'max') AS win_max
      FROM wh ORDER BY doc_id""")
  )

  private val BpePattern =
    """'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"""

  /** BPE-style pretokenization count — the GPT-2 pretokenizer shape
    * (contraction suffixes / letter runs / digit runs / punctuation runs /
    * whitespace), restricted to syntax Java regex and RE2 tokenize
    * identically (leftmost-first alternation in both; no lookarounds —
    * RE2 has none). Token counting is the capacity-planning primitive of
    * a training-data pipeline (docs-per-batch, corpus token budgets); a
    * single map-side `regexp_extract_all` pass, no shuffle. */
  val q36 = Q(
    "q36_bpe_tokens",
    (s, dir) => {
      val nBpe = size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
        .cast("long")
      val nWs = size(split(col("text"), "\\s+")).cast("long")
      documents(s, dir)
        .select(
          col("doc_id"),
          nWs.as("n_ws_tokens"),
          nBpe.as("n_bpe_tokens"),
          when(nBpe > 0, col("n_chars").cast("double") / nBpe)
            .as("chars_per_token"))
        .orderBy("doc_id")
    },
    Some(s"""
      SELECT doc_id,
             CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_ws_tokens,
             CAST(len(regexp_extract_all(text, '${BpePattern.replace("'", "''")}')) AS BIGINT) AS n_bpe_tokens,
             CASE WHEN len(regexp_extract_all(text, '${BpePattern.replace("'", "''")}')) > 0
                  THEN CAST(n_chars AS DOUBLE)
                       / len(regexp_extract_all(text, '${BpePattern.replace("'", "''")}'))
             END AS chars_per_token
      FROM documents ORDER BY doc_id""")
  )

  /** Repetition-based quality signals — the Gopher-rule family (Rae et al.
    * 2021 §A1.1: "fraction of characters in the most common n-gram",
    * "fraction of ... in duplicate n-grams") re-expressed over word n-grams
    * (this corpus has no newlines, so the line-based variants don't apply):
    *
    *   - `ttr`              type-token ratio (distinct words / words)
    *   - `mean_word_len`    mean word length
    *   - `top_bigram_frac`  occurrences of the most frequent word bigram /
    *                        total bigram occurrences
    *   - `dup_5gram_frac`   occurrences belonging to a 5-gram that appears
    *                        more than once in the doc / total occurrences
    *
    * Every ratio is int/int so both engines produce identical doubles.
    *
    * Scale shape: three explode→partial-agg branches, each shuffling
    * (doc_id[, gram]) count pairs after map-side combine — wordcount-shaped,
    * never wider than the token stream — joined back on doc_id. A quality
    * FILTER at 100 TB is this projection plus a threshold predicate. */
  val q25 = Q(
    "q25_quality_repetition",
    (s, dir) => {
      val docs = documents(s, dir)
      def grams(n: Int) = docs
        .select(col("doc_id"),
          graft.functions.GraftFunctions.word_ngrams(col("text"), n).as("g"))
      val words = docs
        .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("t"))
        .filter(length(col("t")) > 0)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          countDistinct(col("t")).as("n_distinct"),
          sum(length(col("t"))).cast("long").as("sum_len"))
      val bi = grams(2).groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(max(col("c")).as("top_bi"), sum(col("c")).cast("long").as("tot_bi"))
      val g5 = grams(5).groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(when(col("c") > 1, col("c")).otherwise(0L)).cast("long")
          .as("dup5"),
          sum(col("c")).cast("long").as("tot5"))
      words.join(bi, "doc_id").join(g5, "doc_id")
        .select(
          col("doc_id"), col("n_words"),
          (col("n_distinct").cast("double") / col("n_words")).as("ttr"),
          (col("sum_len").cast("double") / col("n_words")).as("mean_word_len"),
          (col("top_bi").cast("double") / col("tot_bi")).as("top_bigram_frac"),
          (col("dup5").cast("double") / col("tot5")).as("dup_5gram_frac"))
        .orderBy("doc_id")
    },
    Some("""
      WITH w AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      words AS (
        SELECT doc_id, COUNT(*) AS n_words,
               COUNT(DISTINCT t) AS n_distinct,
               CAST(SUM(length(t)) AS BIGINT) AS sum_len
        FROM (SELECT doc_id, unnest(w) AS t FROM w)
        WHERE length(t) > 0 GROUP BY doc_id),
      bi AS (
        SELECT doc_id, MAX(c) AS top_bi, CAST(SUM(c) AS BIGINT) AS tot_bi
        FROM (SELECT doc_id, g, COUNT(*) AS c FROM (
                SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
                FROM (SELECT doc_id, w,
                             unnest(range(1, greatest(len(w) - 1, 1) + 1)) AS i
                      FROM w))
              GROUP BY doc_id, g)
        GROUP BY doc_id),
      g5 AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup5,
               CAST(SUM(c) AS BIGINT) AS tot5
        FROM (SELECT doc_id, g, COUNT(*) AS c FROM (
                SELECT doc_id, array_to_string(w[i:i+4], ' ') AS g
                FROM (SELECT doc_id, w,
                             unnest(range(1, greatest(len(w) - 4, 1) + 1)) AS i
                      FROM w))
              GROUP BY doc_id, g)
        GROUP BY doc_id)
      SELECT doc_id, n_words,
             CAST(n_distinct AS DOUBLE) / n_words AS ttr,
             CAST(sum_len AS DOUBLE) / n_words AS mean_word_len,
             CAST(top_bi AS DOUBLE) / tot_bi AS top_bigram_frac,
             CAST(dup5 AS DOUBLE) / tot5 AS dup_5gram_frac
      FROM words JOIN bi USING (doc_id) JOIN g5 USING (doc_id)
      ORDER BY doc_id""")
  )

  /** Within-document repetition filters (Gopher / MassiveText quality
    * rules, Rae et al. 2021 §A1.1, arXiv:2112.11446): the fraction of a
    * document's characters covered by (a) its single most frequent word
    * 2-gram and (b) all word 5-grams that occur more than once. High
    * values flag boilerplate/spam — the standard pre-training gate the
    * lang-ID (q31) and stopword (q30) rules don't catch.
    *
    * Scale shape: two wordcount-shaped aggregations keyed (doc_id, gram) —
    * the `word_ngrams` Generator streams shingles inside codegen, partial
    * counts combine map-side, and only (doc_id, len·cnt) longs reach the
    * final per-doc join. Tie-break for "top" 2-gram is (count desc, gram
    * asc) in BOTH engines, so the char masses are integer-deterministic
    * and the fractions are one int/int division each. */
  val q78 = Q(
    "q78_repetition",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = documents(s, dir)
      def gramCounts(n: Int) = docs
        .select(col("doc_id"),
          graft.functions.GraftFunctions.word_ngrams(col("text"), n).as("sh"))
        .groupBy("doc_id", "sh").agg(count(lit(1)).as("cnt"))
      val top2 = gramCounts(2)
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("cnt").desc, col("sh"))))
        .filter(col("rk") === 1)
        .select(col("doc_id"),
          (col("cnt") * length(col("sh")).cast("long")).as("top2_chars"))
      val dup5 = gramCounts(5)
        .filter(col("cnt") > 1)
        .groupBy("doc_id")
        .agg(sum(col("cnt") * length(col("sh")).cast("long")).as("dup5_chars"))
      docs.select(col("doc_id"), col("n_chars"))
        .join(top2, Seq("doc_id"), "left")
        .join(dup5, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("top2_chars"), lit(0L)).as("top2_chars"),
          coalesce(col("dup5_chars"), lit(0L)).as("dup5_chars"),
          (coalesce(col("top2_chars"), lit(0L)).cast("double") /
            col("n_chars")).as("top2_frac"),
          (coalesce(col("dup5_chars"), lit(0L)).cast("double") /
            col("n_chars")).as("dup5_frac"))
        .orderBy("doc_id")
    },
    Some("""
      WITH words AS (
        SELECT doc_id, n_chars, string_split_regex(text, '\s+') AS w
        FROM documents),
      g2 AS (
        SELECT doc_id, array_to_string(w[i:i+1], ' ') AS sh
        FROM (SELECT doc_id, w,
                unnest(range(1, greatest(len(w) - 1, 1) + 1)) AS i
              FROM words)),
      c2 AS (SELECT doc_id, sh, COUNT(*) AS cnt FROM g2 GROUP BY 1, 2),
      top2 AS (
        SELECT doc_id,
               CAST(cnt * strlen(sh) AS BIGINT) AS top2_chars
        FROM (SELECT doc_id, sh, cnt, ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY cnt DESC, sh) AS rk
              FROM c2)
        WHERE rk = 1),
      g5 AS (
        SELECT doc_id, array_to_string(w[i:i+4], ' ') AS sh
        FROM (SELECT doc_id, w,
                unnest(range(1, greatest(len(w) - 4, 1) + 1)) AS i
              FROM words)),
      c5 AS (SELECT doc_id, sh, COUNT(*) AS cnt FROM g5 GROUP BY 1, 2),
      dup5 AS (
        SELECT doc_id, CAST(SUM(cnt * strlen(sh)) AS BIGINT) AS dup5_chars
        FROM c5 WHERE cnt > 1 GROUP BY doc_id)
      SELECT d.doc_id,
             COALESCE(t.top2_chars, 0) AS top2_chars,
             COALESCE(p.dup5_chars, 0) AS dup5_chars,
             CAST(COALESCE(t.top2_chars, 0) AS DOUBLE) / d.n_chars AS top2_frac,
             CAST(COALESCE(p.dup5_chars, 0) AS DOUBLE) / d.n_chars AS dup5_frac
      FROM documents d
      LEFT JOIN top2 t USING (doc_id)
      LEFT JOIN dup5 p USING (doc_id)
      ORDER BY d.doc_id""")
  )

  /** BPE merge-pair statistics — the inner loop of byte-pair-encoding
    * tokenizer TRAINING (Sennrich et al., ACL'16): count adjacent symbol
    * pairs across the corpus, weighted by word frequency; the top pair is
    * the next merge. q36 covers pretokenization (word counts); this is the
    * step after it. Output: the top-20 merge candidates as
    * (left symbol, right symbol, weighted count).
    *
    * Scale shape — the reason BPE training is feasible on a 100 TB corpus
    * at all: pair extraction runs over DISTINCT WORDS (vocab-sized, after
    * the map-side-combined wordcount shuffle), never over the corpus.
    * A trillion tokens collapse to a few million distinct words before
    * any per-character work happens; the pair count is then a second
    * vocab-sized wordcount, and the top-20 a TakeOrdered. Ties break by
    * (left, right) lexicographic for determinism. */
  val q87 = Q(
    "q87_bpe_pairs",
    (s, dir) => {
      val words = documents(s, dir)
        .select(explode(filter(split(col("text"), "\\s+"),
          x => length(x) > 0)).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
      // sequence(1, 0) counts DOWN under ANSI (step -1) — single-char
      // words must short-circuit to the empty array
      words
        .filter(length(col("word")) >= 2)
        .select(col("freq"), explode(
          transform(sequence(lit(1), length(col("word")) - 1),
            i => struct(
              col("word").substr(i, lit(1)).as("a"),
              col("word").substr(i + 1, lit(1)).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("wcnt"))
        .orderBy(col("wcnt").desc, col("a"), col("b"))
        .limit(20)
    },
    Some("""
      WITH tokens AS (
        SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                  x -> length(x) > 0)) AS word
        FROM documents),
      vocab AS (SELECT word, COUNT(*) AS freq FROM tokens GROUP BY word),
      idx AS (
        SELECT word, freq, unnest(range(1, length(word))) AS i
        FROM vocab WHERE length(word) >= 2),
      pairs AS (
        SELECT substr(word, i, 1) AS a, substr(word, i + 1, 1) AS b, freq
        FROM idx)
      SELECT a, b, SUM(freq)::BIGINT AS wcnt
      FROM pairs GROUP BY a, b
      ORDER BY wcnt DESC, a, b LIMIT 20""")
  )

  /** BPE tokenizer APPLICATION — the other half of q87 (which computes
    * merge-pair statistics, i.e. training's inner loop): take the top-20
    * merge candidates by initial pair stats and tokenize the vocabulary
    * with them. Each word becomes its char-spaced form (`"spark"` →
    * `"s p a r k"`); merge i rewrites every occurrence of `"a b"` to
    * `"ab"`, applied in rank order, one global pass each — the standard
    * merge-table application step (Sennrich et al., ACL'16 §3; real
    * tokenizers iterate train→apply per merge, this applies a one-shot
    * top-20 list, documented simplification with identical plan shape).
    *
    * Scale shape, same reason q87 scales: ALL per-character work runs
    * over DISTINCT WORDS — a trillion-token corpus collapses to a
    * vocab-sized table before the merge chain (20 codegen'd literal
    * replaces in one projection) touches anything. The merge table
    * itself is 20 rows collected driver-side (corpus-size-independent,
    * like the IVF codebooks) and baked into the plan as literals; per-doc
    * token counts then come from one broadcast-vocab join if needed.
    * Output: the 50 most frequent words with their tokenization. */
  val q97 = Q(
    "q97_bpe_tokenize",
    (s, dir) => {
      val vocab = documents(s, dir)
        .select(explode(filter(split(col("text"), "\\s+"),
          x => length(x) > 0)).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
        .materialized // merge-stat collect + tokenization pass
      val merges: Seq[(String, String)] = vocab
        .filter(length(col("word")) >= 2)
        .select(col("freq"), explode(
          transform(sequence(lit(1), length(col("word")) - 1),
            i => struct(
              col("word").substr(i, lit(1)).as("a"),
              col("word").substr(i + 1, lit(1)).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("wcnt"))
        .orderBy(col("wcnt").desc, col("a"), col("b"))
        .limit(20)
        .collect().toSeq
        .map(r => (r.getString(0), r.getString(1)))
      val spaced = concat_ws(" ", split(col("word"), ""))
      val tokenized = merges.foldLeft(spaced) { case (c, (a, b)) =>
        regexp_replace(c,
          lit(java.util.regex.Pattern.quote(s"$a $b")),
          lit(java.util.regex.Matcher.quoteReplacement(s"$a$b")))
      }
      vocab
        .select(col("word"), col("freq"), tokenized.as("tokens"))
        .withColumn("n_tokens", size(split(col("tokens"), " ")))
        .orderBy(col("freq").desc, col("word"))
        .limit(50)
    },
    Some("""
      WITH RECURSIVE tokens AS (
        SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                  x -> length(x) > 0)) AS word
        FROM documents),
      vocab AS (SELECT word, COUNT(*) AS freq FROM tokens GROUP BY word),
      idx AS (
        SELECT word, freq, unnest(range(1, length(word))) AS i
        FROM vocab WHERE length(word) >= 2),
      prs AS (
        SELECT substr(word, i, 1) AS a, substr(word, i + 1, 1) AS b, freq
        FROM idx),
      merges AS (
        SELECT a, b,
               ROW_NUMBER() OVER (ORDER BY SUM(freq) DESC, a, b) AS rn
        FROM prs GROUP BY a, b
        QUALIFY rn <= 20),
      apply(word, freq, s, step) AS (
        SELECT word, freq, array_to_string(string_split(word, ''), ' '), 0
        FROM vocab
        UNION ALL
        SELECT ap.word, ap.freq,
               replace(ap.s, m.a || ' ' || m.b, m.a || m.b), ap.step + 1
        FROM apply ap JOIN merges m ON m.rn = ap.step + 1)
      SELECT word, freq, s AS tokens,
             CAST(len(string_split(s, ' ')) AS INT) AS n_tokens
      FROM apply
      WHERE step = (SELECT COUNT(*) FROM merges)
      ORDER BY freq DESC, word LIMIT 50""")
  )

  /** PMI collocation mining — phrase discovery for tokenizer/vocab
    * construction (the word2phrase step of word2vec, Mikolov et al.
    * NeurIPS'13 §4; phrase-merged vocabularies are standard tokenizer
    * preprocessing). For adjacent token pairs: a SCALED pointwise mutual
    * information, kept entirely in integers so both engines rank the same
    * values:
    *
    *   score = (c_ab · N_uni² · 10⁶) div (N_bi · c_a · c_b)
    *
    * — the integer floor of 10⁶·p(ab)/(p(a)p(b)), whose log is PMI; log
    * is monotone, so the ranking (and any threshold) is the PMI ranking
    * without either engine evaluating a float log. Arithmetic runs in
    * DECIMAL(38,0)/HUGEINT: c_ab·N_uni²·10⁶ overflows BIGINT long before
    * 100 TB. Pairs need c_ab ≥ 5 (the word2phrase min-count gate).
    *
    * Scale shape: two wordcount-shaped aggregates (unigrams, adjacent
    * bigrams — both map-side-combined, vocab-sized after combine), two
    * vocab-sized joins to attach c_a/c_b, scalar one-row totals cross
    * joins, and a TakeOrdered(30). Nothing corpus-sized shuffles twice. */
  val q100 = Q(
    "q100_pmi_collocations",
    (s, dir) => {
      val toks = documents(s, dir)
        .select(col("doc_id"), filter(split(col("text"), "\\s+"),
          x => length(x) > 0).as("ws"))
        .materialized // unigram + bigram extraction share it
      val uni = toks
        .select(explode(col("ws")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("c"))
      val bi = toks
        .filter(size(col("ws")) >= 2)
        .select(explode(
          zip_with(slice(col("ws"), lit(1), size(col("ws")) - 1),
            slice(col("ws"), lit(2), size(col("ws")) - 1),
            (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 5)
      val nUni = uni.agg(sum(col("c")).cast("bigint").as("n_uni"))
      val nBi = bi.agg(sum(col("c_ab")).cast("bigint").as("n_bi"))
      bi
        .join(uni.select(col("t").as("a"), col("c").as("c_a")), "a")
        .join(uni.select(col("t").as("b"), col("c").as("c_b")), "b")
        .crossJoin(nUni).crossJoin(nBi)
        .select(col("a"), col("b"), col("c_ab"),
          expr("""cast(c_ab as decimal(38,0)) * n_uni * n_uni * 1000000
                  div (cast(n_bi as decimal(38,0)) * c_a * c_b)""")
            .cast("bigint").as("pmi_scaled"))
        .orderBy(col("pmi_scaled").desc, col("a"), col("b"))
        .limit(30)
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                   x -> length(x) > 0) AS ws
        FROM documents),
      uni AS (
        SELECT t, COUNT(*) AS c
        FROM (SELECT unnest(ws) AS t FROM toks) GROUP BY t),
      bi AS (
        SELECT ws[i] AS a, ws[i + 1] AS b, COUNT(*) AS c_ab
        FROM (SELECT ws, unnest(range(1, len(ws))) AS i
              FROM toks WHERE len(ws) >= 2)
        GROUP BY ws[i], ws[i + 1]
        HAVING COUNT(*) >= 5),
      nu AS (SELECT CAST(SUM(c) AS BIGINT) AS n_uni FROM uni),
      nb AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n_bi FROM bi)
      SELECT bi.a, bi.b, bi.c_ab,
             CAST(CAST(bi.c_ab AS HUGEINT) * nu.n_uni * nu.n_uni * 1000000 //
                  (CAST(nb.n_bi AS HUGEINT) * ua.c * ub.c) AS BIGINT)
               AS pmi_scaled
      FROM bi
      JOIN uni ua ON ua.t = bi.a
      JOIN uni ub ON ub.t = bi.b, nu, nb
      ORDER BY pmi_scaled DESC, bi.a, bi.b LIMIT 30""")
  )

  /** Distinct-n diversity audit per source — the corpus-health metric
    * behind "is this crawl template spam?": unique-unigram and
    * unique-trigram rates (distinct/total, in exact ppm). Low trigram
    * diversity with normal unigram diversity is the signature of
    * boilerplate — same words, same phrasings — and is the corpus-level
    * complement of q78's within-document repetition flags (distinct-n is
    * the standard generation-diversity metric applied to training data).
    *
    * Scale shape: two wordcount-shaped aggregates (gram streams from the
    * codegen'd `word_ngrams` generator, map-side partial counts), each
    * collapsing to (source, gram) then #sources rows; the final join is
    * sources × sources. The shuffle carries gram strings once — the
    * md5-digest narrowing of q21 applies verbatim if grams outgrow
    * comfort at extreme scale. */
  val q124 = Q(
    "q124_ngram_diversity",
    (s, dir) => {
      val docs = documents(s, dir)
      def stats(n: Int, pre: String) = docs
        .select(col("source"),
          graft.functions.GraftFunctions.word_ngrams(col("text"), n).as("g"))
        .groupBy("source", "g").agg(count(lit(1)).as("cnt"))
        .groupBy("source")
        .agg(count(lit(1)).as(s"${pre}_distinct"),
          sum(col("cnt")).as(s"${pre}_total"))
      stats(1, "uni").join(stats(3, "tri"), "source")
        .select(col("source"),
          col("uni_distinct"), col("uni_total"),
          expr("1000000 * uni_distinct div uni_total").as("uni_ppm"),
          col("tri_distinct"), col("tri_total"),
          expr("1000000 * tri_distinct div tri_total").as("tri_ppm"))
        .orderBy("source")
    },
    Some("""
      WITH words AS (
        SELECT source, string_split_regex(text, '\s+') AS w FROM documents),
      uc AS (
        SELECT source, g, COUNT(*) AS cnt
        FROM (SELECT source, unnest(w) AS g FROM words) GROUP BY 1, 2),
      us AS (
        SELECT source, COUNT(*) AS uni_distinct,
               CAST(SUM(cnt) AS BIGINT) AS uni_total
        FROM uc GROUP BY source),
      g3 AS (
        SELECT source, array_to_string(w[i:i+2], ' ') AS g
        FROM (SELECT source, w,
                unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS i
              FROM words)),
      tc AS (SELECT source, g, COUNT(*) AS cnt FROM g3 GROUP BY 1, 2),
      ts AS (
        SELECT source, COUNT(*) AS tri_distinct,
               CAST(SUM(cnt) AS BIGINT) AS tri_total
        FROM tc GROUP BY source)
      SELECT source, uni_distinct, uni_total,
             1000000 * uni_distinct // uni_total AS uni_ppm,
             tri_distinct, tri_total,
             1000000 * tri_distinct // tri_total AS tri_ppm
      FROM us JOIN ts USING (source) ORDER BY source""")
  )

  /** Distributed BPE TRAINING — the first two merge decisions of the
    * byte-pair-encoding tokenizer-training loop (Sennrich et al. 2016)
    * over the corpus vocabulary, where q97 only APPLIES a fixed BPE-ish
    * segmentation. Classic formulation: unique lowercase words with
    * frequencies; per round, count adjacent symbol pairs weighted by word
    * frequency, merge the max-count pair (ties → lexicographically
    * smallest (left, right) — both engines compare strings as UTF-8
    * bytes), rewrite, repeat. Fixed 2 rounds like q47's Lloyd loop, so
    * the DuckDB oracle computes the identical fixpoint prefix.
    *
    * The rewrite is RELATIONAL, not a per-word fold: greedy leftmost
    * non-overlapping matching only interacts between ADJACENT candidate
    * positions (an occurrence overlap requires sharing a symbol), so
    * within each maximal run of consecutive candidates greedy selects
    * every other one from the run head — runs via the p − row_number
    * trick, selection by parity, consumed right-halves dropped by an
    * anti-condition, positions renumbered. Both engines execute the same
    * algebra; no sequential UDF anywhere.
    *
    * Scale shape: the corpus collapses to the UNIQUE-WORD vocabulary at
    * the first aggregate (the standard BPE trick — pair counting is
    * vocab-sized, not corpus-sized, from round 1 on); per round one
    * pair-count aggregate + one window over candidate positions; the
    * winner is a 1-row driver collect (q47's centroid-sync discipline).
    * At 100 TB the vocabulary table is millions of rows, not terabytes. */
  val q135 = Q(
    "q135_bpe_train",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = documents(s, dir)
      val words = docs.select(explode(filter(split(col("text"), "\\s+"),
          x => x.rlike("^[a-z]+$") && length(x) >= lit(2))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("wc"))
        .materialized // vocabulary: every later step is vocab-sized
      val sym1 = words.select(col("word"), col("wc"), posexplode(
          expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")))
        .select(col("word"), col("wc"), (col("pos") + 1).as("p"),
          col("col").as("sym"))
        .materialized // round-1 pairs + candidate scan + rebuild
      val wOrd = Window.partitionBy("word").orderBy("p")
      def withNext(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("nxt", lead(col("sym"), 1).over(wOrd))
      def pairCounts(df: org.apache.spark.sql.DataFrame) =
        withNext(df).filter(col("nxt").isNotNull)
          .groupBy("sym", "nxt").agg(sum(col("wc")).as("cnt"))
      // Option-shaped: a vocabulary-free slice (no ^[a-z]{2,}$ tokens, or
      // no adjacent pairs left after round 1) must yield the same EMPTY /
      // one-row result the SQL oracle produces, never a driver crash
      def winner(df: org.apache.spark.sql.DataFrame): Option[(String, String, Long)] =
        pairCounts(df)
          .orderBy(col("cnt").desc, col("sym"), col("nxt")).limit(1).collect()
          .headOption.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      def result(rows: Seq[(Long, String, String, String, Long)]) =
        s.createDataFrame(rows)
          .toDF("merge_round", "lsym", "rsym", "merged", "cnt")
          .orderBy("merge_round")
      winner(sym1) match {
        case None => result(Seq.empty)
        case Some((l1, r1, c1)) =>
      // greedy leftmost non-overlapping selection of (l1, r1) occurrences
      val cand = withNext(sym1)
        .filter(col("sym") === l1 && col("nxt") === r1)
        .select(col("word").as("cw"), col("p").as("cp"))
      val sel = cand
        .withColumn("runkey", col("cp") - row_number().over(
          Window.partitionBy("cw").orderBy("cp")))
        .withColumn("off", row_number().over(
          Window.partitionBy("cw", "runkey").orderBy("cp")))
        .filter(col("off") % 2 === 1)
        .select(col("cw"), col("cp"))
        .materialized // both rebuild joins
      val sym2 = sym1
        .join(sel.as("m"),
          col("word") === col("m.cw") && col("p") === col("m.cp"), "left")
        .join(sel.as("d"),
          col("word") === col("d.cw") && col("p") === col("d.cp") + 1, "left")
        .filter(col("d.cp").isNull) // consumed right halves vanish
        .select(col("word"), col("wc"),
          when(col("m.cp").isNotNull, lit(l1 + r1)).otherwise(col("sym"))
            .as("sym"),
          row_number().over(Window.partitionBy("word")
            .orderBy(col("p"))).as("p"))
      result(Seq((1L, l1, r1, l1 + r1, c1)) ++
        winner(sym2).map { case (l2, r2, c2) =>
          (2L, l2, r2, l2 + r2, c2)
        })
      }
    },
    Some("""
      WITH words AS (
        SELECT w AS word, COUNT(*) AS wc FROM (
          SELECT unnest(list_filter(string_split_regex(text, '\s+'),
            x -> regexp_matches(x, '^[a-z]+$') AND length(x) >= 2)) AS w
          FROM documents)
        GROUP BY w),
      sym1 AS (
        SELECT word, wc, i AS p, word[i:i] AS sym
        FROM (SELECT word, wc, unnest(range(1, length(word) + 1)) AS i
              FROM words)),
      nx1 AS (
        SELECT word, wc, p, sym,
               LEAD(sym) OVER (PARTITION BY word ORDER BY p) AS nxt
        FROM sym1),
      pr1 AS (
        SELECT sym, nxt, CAST(SUM(wc) AS BIGINT) AS cnt
        FROM nx1 WHERE nxt IS NOT NULL GROUP BY sym, nxt),
      w1 AS (SELECT sym AS l, nxt AS r, cnt
             FROM pr1 ORDER BY cnt DESC, sym, nxt LIMIT 1),
      cand AS (
        SELECT n.word, n.p FROM nx1 n, w1
        WHERE n.sym = w1.l AND n.nxt = w1.r),
      sel AS (
        SELECT word, p FROM (
          SELECT word, p,
                 ROW_NUMBER() OVER (PARTITION BY word, runkey ORDER BY p)
                   AS off
          FROM (SELECT word, p,
                       p - ROW_NUMBER() OVER (PARTITION BY word ORDER BY p)
                         AS runkey
                FROM cand))
        WHERE off % 2 = 1),
      sym2 AS (
        SELECT word, wc,
               ROW_NUMBER() OVER (PARTITION BY word ORDER BY p) AS p, sym
        FROM (
          SELECT s.word, s.wc, s.p,
                 CASE WHEN m.p IS NOT NULL THEN (SELECT l || r FROM w1)
                      ELSE s.sym END AS sym
          FROM sym1 s
          LEFT JOIN sel m ON m.word = s.word AND m.p = s.p
          LEFT JOIN sel d ON d.word = s.word AND d.p + 1 = s.p
          WHERE d.p IS NULL)),
      nx2 AS (
        SELECT word, wc, p, sym,
               LEAD(sym) OVER (PARTITION BY word ORDER BY p) AS nxt
        FROM sym2),
      pr2 AS (
        SELECT sym, nxt, CAST(SUM(wc) AS BIGINT) AS cnt
        FROM nx2 WHERE nxt IS NOT NULL GROUP BY sym, nxt),
      w2 AS (SELECT sym AS l, nxt AS r, cnt
             FROM pr2 ORDER BY cnt DESC, sym, nxt LIMIT 1)
      SELECT CAST(1 AS BIGINT) AS merge_round, l AS lsym, r AS rsym,
             l || r AS merged, cnt FROM w1
      UNION ALL
      SELECT CAST(2 AS BIGINT), l, r, l || r, cnt FROM w2
      ORDER BY merge_round""")
  )

  /** Per-document n-gram NOVELTY — the inverse of near-dup detection: what
    * fraction of a document's distinct 5-grams appear in NO other
    * document? Low novelty flags boilerplate-heavy or template-generated
    * documents even when no single pair crosses a dedup threshold; the
    * corpus-level novelty distribution is the health metric web-crawl
    * curation tracks release over release. Reported in basis points via
    * integer division (engine-exact).
    *
    * Scale shape: grams are digested to 16-hex md5 prefixes before any
    * exchange (the q91 key discipline — text never shuffles), then one
    * wordcount aggregate over gram digests + one digest-keyed join back
    * + one doc-keyed count. At 100 TB this is the q21 shingle volume
    * without the pair join. */
  val q140 = Q(
    "q140_novel_ngrams",
    (s, dir) => {
      // 64-bit digest as a LONG (md5_prefix64 — bijective with the
      // 16-hex-char substring): same sets, primitive keys in the
      // distinct, the df groupBy and the join back (guide §2.3)
      val grams = documents(s, dir)
        .select(col("doc_id"),
          graft.functions.GraftFunctions.word_ngrams(col("text"), 5).as("g"))
        .select(col("doc_id"),
          graft.functions.GraftFunctions.md5_prefix64(col("g")).as("h"))
        .distinct()
        .materialized // consumers: gram document-frequency + per-doc join
      val dfreq = grams.groupBy("h").agg(count(lit(1)).as("df"))
      grams.join(dfreq, "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("novel_grams"))
        .select(col("doc_id"), col("n_grams"), col("novel_grams"),
          expr("novel_grams * 10000 div n_grams").as("novelty_bp"))
        .orderBy("doc_id")
    },
    Some("""
      WITH w AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      g AS (
        SELECT DISTINCT doc_id,
               substr(md5(array_to_string(w[i:i+4], ' ')), 1, 16) AS h
        FROM (SELECT doc_id, w,
                     unnest(range(1, greatest(len(w) - 4, 1) + 1)) AS i
              FROM w)
        WHERE len(w) >= 5),
      dfreq AS (SELECT h, COUNT(*) AS df FROM g GROUP BY h),
      per AS (
        SELECT doc_id, COUNT(*) AS n_grams,
               CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS novel_grams
        FROM g JOIN dfreq USING (h) GROUP BY doc_id)
      SELECT doc_id, n_grams, novel_grams,
             novel_grams * 10000 // n_grams AS novelty_bp
      FROM per ORDER BY doc_id""")
  )

  /** Bigram frequency-rank fluency score — an LM-free perplexity proxy:
    * rank every corpus bigram by frequency (rank 1 = most frequent, ties
    * share the competition rank), then score each document by the mean
    * rank of its bigram occurrences. Fluent prose rides the head of the
    * Zipf curve (low mean rank); gibberish, boilerplate-free templates
    * and wrong-language text sit in the tail. The hapax count (bigrams
    * occurring once in the whole corpus) is the rawest novelty signal.
    * This is the frequency-based stand-in pipelines use when a real LM
    * perplexity pass is too expensive for a first cut — and unlike
    * log-prob scoring it is integer-exact, so the oracle hash-matches.
    *
    * Scale shape: bigram occurrences carry only 16-char md5 digests (the
    * q140 convention); counts are one wordcount-shaped HashAggregate.
    * The rank needs a global order over VOCABULARY frequencies — the
    * scale hazard — so it is derived without ranking the vocabulary:
    * collapse counts to the count-HISTOGRAM (one row per distinct
    * frequency value; Zipf bounds this at O(√occurrences), thousands of
    * rows at 100 TB), run the exclusive cumulative sum over that tiny
    * table (the one single-partition window, bounded by construction),
    * and broadcast the count→rank map back onto the vocab-sized count
    * table. Per-doc scoring joins occurrences to ranked counts on the
    * digest (8/16-byte shuffle rows) and aggregates map-side. Text
    * never shuffles; nothing corpus- or vocab-sized crosses one task. */
  val q147 = Q(
    "q147_rank_fluency",
    (s, dir) => {
      val bi = documents(s, dir)
        .select(col("doc_id"),
          graft.functions.GraftFunctions.word_ngrams(col("text"), 2).as("g"))
        // md5_prefix64 long ≡ the 16-hex-char substring (bijection):
        // identical counts, primitive digest keys end-to-end
        .select(col("doc_id"),
          graft.functions.GraftFunctions.md5_prefix64(col("g")).as("h"))
        .materialized // consumers: corpus counts + per-doc scoring join
      val counts = bi.groupBy("h").agg(count(lit(1)).as("cnt"))
      val histo = counts.groupBy("cnt").agg(count(lit(1)).as("n_b"))
      val rankOf = histo
        .withColumn("rank",
          coalesce(sum(col("n_b")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
              .orderBy(col("cnt").desc)
              .rowsBetween(
                org.apache.spark.sql.expressions.Window.unboundedPreceding,
                -1)), lit(0L)) + lit(1L))
        .select("cnt", "rank")
      val ranked = counts.join(broadcast(rankOf), "cnt").select("h", "cnt", "rank")
      bi.join(ranked, "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("rank")).as("sum_rank"),
          sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("doc_id"), col("n_bigrams"), col("sum_rank"),
          expr("sum_rank div n_bigrams").as("mean_rank"), col("n_hapax"))
        .orderBy("doc_id")
    },
    Some("""
      WITH w AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
      bi AS (
        SELECT doc_id,
               substr(md5(array_to_string(w[i:i+1], ' ')), 1, 16) AS h
        FROM (SELECT doc_id, w,
                     unnest(range(1, greatest(len(w) - 1, 1) + 1)) AS i
              FROM w)
        WHERE len(w) >= 2),
      counts AS (SELECT h, COUNT(*) AS cnt FROM bi GROUP BY h),
      histo AS (SELECT cnt, COUNT(*) AS n_b FROM counts GROUP BY cnt),
      rank_of AS (
        SELECT cnt,
               CAST(COALESCE(SUM(n_b) OVER (ORDER BY cnt DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    + 1 AS BIGINT) AS rank
        FROM histo),
      ranked AS (
        SELECT h, c.cnt, rank FROM counts c JOIN rank_of r ON c.cnt = r.cnt)
      SELECT doc_id, COUNT(*) AS n_bigrams,
             CAST(SUM(rank) AS BIGINT) AS sum_rank,
             CAST(SUM(rank) AS BIGINT) // COUNT(*) AS mean_rank,
             CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax
      FROM bi JOIN ranked USING (h)
      GROUP BY doc_id ORDER BY doc_id""")
  )

  /** Tokenizer fertility audit per source — tokens-per-word and
    * chars-per-token under the corpus-trained BPE merge table (q97's
    * tokenizer applied, q135's training decisions): the
    * tokenizer-efficiency question every multilingual/multi-domain
    * pipeline asks before committing to a vocab ("which sources pay 2×
    * the context budget per word?"). Fertility is the standard metric
    * name (tokens emitted per input word); both ratios are ×1e6 integer
    * divisions so the oracle hash-matches.
    *
    * Scale shape, q97's argument compounded: all per-character work
    * (pair stats, the 20-step merge chain) runs over DISTINCT WORDS —
    * vocab-sized, not corpus-sized; the merge table is 20 collected
    * rows baked into the plan as literals. The per-source rollup needs
    * only (source, word)→count, which is the classic wordcount
    * HashAggregate with map-side partials, joined to the vocab-sized
    * tokenization table on the word key and collapsed to ≤|sources|
    * rows. Nothing corpus-sized crosses an exchange a second time. */
  val q153 = Q(
    "q153_tokenizer_fertility",
    (s, dir) => {
      val sw = documents(s, dir)
        .select(col("source"),
          explode(filter(split(col("text"), "\\s+"),
            x => length(x) > 0)).as("word"))
        .groupBy("source", "word").agg(count(lit(1)).as("cnt"))
        .materialized // consumers: global vocab (merge stats) + source join
      val vocab = sw.groupBy("word").agg(sum(col("cnt")).as("freq"))
        .materialized // consumers: merge-stat collect + tokenization pass
      val merges: Seq[(String, String)] = vocab
        .filter(length(col("word")) >= 2)
        .select(col("freq"), explode(
          transform(sequence(lit(1), length(col("word")) - 1),
            i => struct(
              col("word").substr(i, lit(1)).as("a"),
              col("word").substr(i + 1, lit(1)).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("wcnt"))
        .orderBy(col("wcnt").desc, col("a"), col("b"))
        .limit(20)
        .collect().toSeq
        .map(r => (r.getString(0), r.getString(1)))
      val spaced = concat_ws(" ", split(col("word"), ""))
      val tokenized = merges.foldLeft(spaced) { case (c, (a, b)) =>
        regexp_replace(c,
          lit(java.util.regex.Pattern.quote(s"$a $b")),
          lit(java.util.regex.Matcher.quoteReplacement(s"$a$b")))
      }
      val wordTok = vocab.select(col("word"),
        size(split(tokenized, " ")).cast("long").as("n_tok"),
        length(col("word")).cast("long").as("n_chr"))
      sw.join(wordTok, "word")
        .groupBy("source")
        .agg(sum(col("cnt")).as("n_words"),
          sum(col("cnt") * col("n_tok")).as("n_tokens"),
          sum(col("cnt") * col("n_chr")).as("n_chars"))
        .select(col("source"), col("n_words"), col("n_tokens"),
          col("n_chars"),
          expr("n_tokens * 1000000 div n_words").as("fertility_ppm"),
          expr("n_chars * 1000000 div n_tokens").as("chars_per_token_ppm"))
        .orderBy("source")
    },
    Some("""
      WITH RECURSIVE toks AS (
        SELECT source, unnest(list_filter(string_split_regex(text, '\s+'),
                                          x -> length(x) > 0)) AS word
        FROM documents),
      sw AS (SELECT source, word, COUNT(*) AS cnt
             FROM toks GROUP BY source, word),
      vocab AS (SELECT word, CAST(SUM(cnt) AS BIGINT) AS freq
                FROM sw GROUP BY word),
      idx AS (
        SELECT word, freq, unnest(range(1, length(word))) AS i
        FROM vocab WHERE length(word) >= 2),
      prs AS (
        SELECT substr(word, i, 1) AS a, substr(word, i + 1, 1) AS b, freq
        FROM idx),
      merges AS (
        SELECT a, b,
               ROW_NUMBER() OVER (ORDER BY SUM(freq) DESC, a, b) AS rn
        FROM prs GROUP BY a, b
        QUALIFY rn <= 20),
      apply(word, s, step) AS (
        SELECT word, array_to_string(string_split(word, ''), ' '), 0
        FROM vocab
        UNION ALL
        SELECT ap.word, replace(ap.s, m.a || ' ' || m.b, m.a || m.b),
               ap.step + 1
        FROM apply ap JOIN merges m ON m.rn = ap.step + 1),
      wtok AS (
        SELECT word, CAST(len(string_split(s, ' ')) AS BIGINT) AS n_tok,
               CAST(length(word) AS BIGINT) AS n_chr
        FROM apply WHERE step = (SELECT COUNT(*) FROM merges)),
      agg AS (
        SELECT source,
               CAST(SUM(cnt) AS BIGINT) AS n_words,
               CAST(SUM(cnt * n_tok) AS BIGINT) AS n_tokens,
               CAST(SUM(cnt * n_chr) AS BIGINT) AS n_chars
        FROM sw JOIN wtok USING (word) GROUP BY source)
      SELECT source, n_words, n_tokens, n_chars,
             n_tokens * 1000000 // n_words AS fertility_ppm,
             n_chars * 1000000 // n_tokens AS chars_per_token_ppm
      FROM agg ORDER BY source""")
  )

  /** Zipf head/tail mass audit per source — the corpus-shape fingerprint:
    * total token mass, distinct types, hapax types, and the mass carried
    * by the rank-≤10 / rank-≤100 type heads (competition ranks,
    * tie-groups included whole, so the cut is deterministic without any
    * within-tie ordering). Natural prose puts ~20-40% of mass in the
    * top-10 head and has a long hapax tail; templated/boilerplate
    * sources collapse the tail and a wrong tokenizer inflates it — this
    * is the single-pass "is this source distributionally healthy" gate
    * run before spending on dedup or LM scoring. All integer-exact.
    *
    * Scale shape: q147's rank-without-sorting trick, per source — word
    * occurrences carry 16-hex md5 digests into one wordcount aggregate;
    * type counts collapse to the per-source count-HISTOGRAM (one row per
    * distinct frequency VALUE — Zipf bounds it at O(√mass) rows); ranks
    * come from a cumulative window over that bounded histogram (per-
    * source partitions of thousands of rows at 100 TB, never
    * vocab-sized); the final aggregate is ≤|sources| rows. The
    * vocabulary is never globally sorted and text never shuffles. */
  val q154 = Q(
    "q154_zipf_mass",
    (s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val counts = documents(s, dir)
        .select(col("source"),
          explode(filter(split(col("text"), "\\s+"),
            x => length(x) > 0)).as("word"))
        // md5_prefix64 long ≡ the 16-hex-char substring (bijection)
        .select(col("source"),
          graft.functions.GraftFunctions.md5_prefix64(col("word")).as("h"))
        .groupBy("source", "h").agg(count(lit(1)).as("cnt"))
      val histo = counts.groupBy("source", "cnt")
        .agg(count(lit(1)).as("n_typ"))
      val ranked = histo.withColumn("rank",
        coalesce(sum(col("n_typ")).over(
          W.partitionBy("source").orderBy(col("cnt").desc)
            .rowsBetween(W.unboundedPreceding, -1)), lit(0L)) + lit(1L))
      ranked.groupBy("source")
        .agg(sum(col("cnt") * col("n_typ")).as("total_tokens"),
          sum(col("n_typ")).as("n_types"),
          sum(when(col("cnt") === 1, col("n_typ")).otherwise(0L))
            .as("hapax_types"),
          sum(when(col("rank") <= 10, col("cnt") * col("n_typ"))
            .otherwise(0L)).as("top10_mass"),
          sum(when(col("rank") <= 100, col("cnt") * col("n_typ"))
            .otherwise(0L)).as("top100_mass"))
        .select(col("source"), col("total_tokens"), col("n_types"),
          col("hapax_types"), col("top10_mass"), col("top100_mass"),
          expr("top10_mass * 10000 div total_tokens").as("head10_bp"),
          expr("top100_mass * 10000 div total_tokens").as("head100_bp"),
          expr("hapax_types * 10000 div total_tokens").as("hapax_bp"))
        .orderBy("source")
    },
    Some("""
      WITH toks AS (
        SELECT source, unnest(list_filter(string_split_regex(text, '\s+'),
                                          x -> length(x) > 0)) AS word
        FROM documents),
      counts AS (
        SELECT source, substr(md5(word), 1, 16) AS h, COUNT(*) AS cnt
        FROM toks GROUP BY source, h),
      histo AS (
        SELECT source, cnt, COUNT(*) AS n_typ FROM counts GROUP BY source, cnt),
      ranked AS (
        SELECT source, cnt, n_typ,
               CAST(COALESCE(SUM(n_typ) OVER (PARTITION BY source
                    ORDER BY cnt DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    + 1 AS BIGINT) AS rank
        FROM histo),
      agg AS (
        SELECT source,
               CAST(SUM(cnt * n_typ) AS BIGINT) AS total_tokens,
               CAST(SUM(n_typ) AS BIGINT) AS n_types,
               CAST(SUM(CASE WHEN cnt = 1 THEN n_typ ELSE 0 END) AS BIGINT)
                 AS hapax_types,
               CAST(SUM(CASE WHEN rank <= 10 THEN cnt * n_typ ELSE 0 END)
                 AS BIGINT) AS top10_mass,
               CAST(SUM(CASE WHEN rank <= 100 THEN cnt * n_typ ELSE 0 END)
                 AS BIGINT) AS top100_mass
        FROM ranked GROUP BY source)
      SELECT source, total_tokens, n_types, hapax_types, top10_mass,
             top100_mass,
             top10_mass * 10000 // total_tokens AS head10_bp,
             top100_mass * 10000 // total_tokens AS head100_bp,
             hapax_types * 10000 // total_tokens AS hapax_bp
      FROM agg ORDER BY source""")
  )

  /** Greedy longest-match piece count for `word` against the literal
    * `pieces` codebook (single characters are always available): one
    * `aggregate` fold over the character positions carrying (next
    * unconsumed position, count) — pure codegen'd expression, no UDF,
    * no shuffle. Package-visible so the spec can plant adversarial
    * codebooks. */
  /** Codebook as a typed array literal. `array()` with zero children
    * infers `array<null>` and fails `array_contains` analysis, so an
    * empty codebook (vocabulary with no 2..4-char substrings) gets an
    * explicit `array<string>` type — both decoders then degrade to the
    * pure single-character fold. */
  private def pieceArray(pieces: Seq[String]): Column =
    if (pieces.isEmpty) lit(Array.empty[String]) else array(pieces.map(lit): _*)

  private[graft] def greedyPieces(word: Column, pieces: Seq[String]): Column = {
    val p = pieceArray(pieces)
    val rem = (i: Column) => length(word) - i + 1
    aggregate(
      sequence(lit(1), length(word)),
      struct(lit(1).as("np"), lit(0L).as("c")),
      (acc, i) => {
        val step = when(rem(i) >= 4 && array_contains(p, word.substr(i, lit(4))), 4)
          .when(rem(i) >= 3 && array_contains(p, word.substr(i, lit(3))), 3)
          .when(rem(i) >= 2 && array_contains(p, word.substr(i, lit(2))), 2)
          .otherwise(1)
        when(i === acc.getField("np"),
          struct((acc.getField("np") + step).as("np"),
            (acc.getField("c") + 1L).as("c")))
          .otherwise(struct(acc.getField("np").as("np"),
            acc.getField("c").as("c")))
      },
      acc => acc.getField("c"))
  }

  /** Optimal (minimum) piece count for `word` against `pieces` — the
    * Viterbi/unigram-LM decoding answer to the same question: one
    * `aggregate` fold building the best[0..i] DP array (piece lengths
    * ≤ 4, singles always available), again a pure codegen'd expression.
    * try_element_at per the ANSI-mode house rule; indices are in range
    * by construction. */
  private[graft] def optPieces(word: Column, pieces: Seq[String]): Column = {
    val p = pieceArray(pieces)
    val Big = 1000000L
    aggregate(
      sequence(lit(1), length(word)),
      array(lit(0L)),
      (acc, j) => {
        def viaLen(l: Int): Column =
          when(j >= l && array_contains(p, word.substr(j - l + 1, lit(l))),
            try_element_at(acc, j - l + 1) + 1L).otherwise(lit(Big))
        concat(acc, array(least(
          try_element_at(acc, j) + 1L, viaLen(2), viaLen(3), viaLen(4))))
      },
      acc => try_element_at(acc, length(word) + 1))
  }

  /** Viterbi-vs-greedy tokenization audit — the unigram-LM decoding
    * question (Kudo, ACL'18): greedy longest-match (WordPiece-style)
    * over-fragments words whose best cover needs a SHORTER first piece;
    * exact DP segmentation prices that loss. The codebook is the top-64
    * 2..4-char substrings of the corpus vocabulary by frequency-weighted
    * occurrence (ties lexicographic — deterministic), collected
    * driver-side like the IVF/PQ codebooks and baked into the plan as
    * literals; single characters are always available, so every word
    * segments. Per word-length bucket: words, words greedy
    * over-fragments, total pieces under each decoder, and the
    * corpus-frequency-weighted token saving of exact decoding.
    *
    * Scale shape, q97's argument again: the corpus collapses to the
    * DISTINCT-WORD vocabulary at the first aggregate; substring stats
    * are vocab-sized; the codebook is 64 collected rows
    * (corpus-size-independent); BOTH decoders are single codegen'd
    * `aggregate` folds in one projection over the vocab — no join, no
    * UDF, no per-word shuffle — and the roll-up is ≤ maxWordLen rows. */
  val q159 = Q(
    "q159_viterbi_segment",
    (s, dir) => {
      val vocab = documents(s, dir)
        .select(explode(filter(split(col("text"), "\\s+"),
          x => x.rlike("^[a-z]+$"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
        .materialized // consumers: codebook collect + decoding pass
      val pieces: Seq[String] = vocab
        .select(col("word"), col("freq"),
          explode(sequence(lit(1), length(col("word")))).as("i"))
        .select(col("word"), col("freq"), col("i"),
          explode(array(lit(2), lit(3), lit(4))).as("l"))
        .filter(col("i") + col("l") - 1 <= length(col("word")))
        .select(col("word").substr(col("i"), col("l")).as("piece"), col("freq"))
        .groupBy("piece").agg(sum(col("freq")).as("t"))
        .orderBy(col("t").desc, col("piece")).limit(64)
        .collect().map(_.getString(0)).toSeq
      vocab
        .select(col("word"), col("freq"),
          greedyPieces(col("word"), pieces).as("gp"),
          optPieces(col("word"), pieces).as("op"))
        .groupBy(length(col("word")).cast("long").as("wlen"))
        .agg(count(lit(1)).as("n_words"),
          sum(when(col("gp") > col("op"), 1L).otherwise(0L)).as("n_improved"),
          sum(col("gp")).as("greedy_sum"),
          sum(col("op")).as("opt_sum"),
          sum(col("freq") * (col("gp") - col("op"))).as("tokens_saved"))
        .orderBy("wlen")
    },
    Some(raw"""
      WITH RECURSIVE tokens AS (
        SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                  x -> regexp_matches(x, '^[a-z]+$$'))) AS word
        FROM documents),
      words AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
        FROM tokens GROUP BY word),
      occ AS (
        SELECT substr(word, i, l) AS piece, freq
        FROM (SELECT word, freq, unnest(range(1, length(word) + 1)) AS i
              FROM words),
             (SELECT unnest([2, 3, 4]) AS l)
        WHERE i + l - 1 <= length(word)),
      pieces AS (
        SELECT piece FROM (
          SELECT piece, ROW_NUMBER() OVER (ORDER BY SUM(freq) DESC, piece)
            AS rn
          FROM occ GROUP BY piece)
        WHERE rn <= 64),
      pl AS (SELECT list(piece) AS ps FROM pieces),
      dp AS (
        SELECT word, freq, 0 AS i,
               CAST(0 AS BIGINT) AS b1, CAST(1000000 AS BIGINT) AS b2,
               CAST(1000000 AS BIGINT) AS b3, CAST(1000000 AS BIGINT) AS b4
        FROM words
        UNION ALL
        SELECT d.word, d.freq, d.i + 1,
               least(d.b1 + 1,
                 CASE WHEN d.i + 1 >= 2
                           AND list_contains(ps, substr(d.word, d.i, 2))
                      THEN d.b2 + 1 ELSE 1000000 END,
                 CASE WHEN d.i + 1 >= 3
                           AND list_contains(ps, substr(d.word, d.i - 1, 3))
                      THEN d.b3 + 1 ELSE 1000000 END,
                 CASE WHEN d.i + 1 >= 4
                           AND list_contains(ps, substr(d.word, d.i - 2, 4))
                      THEN d.b4 + 1 ELSE 1000000 END),
               d.b1, d.b2, d.b3
        FROM dp d, pl WHERE d.i < length(d.word)),
      opt AS (SELECT word, freq, b1 AS op FROM dp WHERE i = length(word)),
      greedy AS (
        SELECT word, freq, 1 AS pos, CAST(0 AS BIGINT) AS c FROM words
        UNION ALL
        SELECT g.word, g.freq,
               g.pos + CASE
                 WHEN length(g.word) - g.pos + 1 >= 4
                      AND list_contains(ps, substr(g.word, g.pos, 4)) THEN 4
                 WHEN length(g.word) - g.pos + 1 >= 3
                      AND list_contains(ps, substr(g.word, g.pos, 3)) THEN 3
                 WHEN length(g.word) - g.pos + 1 >= 2
                      AND list_contains(ps, substr(g.word, g.pos, 2)) THEN 2
                 ELSE 1 END,
               g.c + 1
        FROM greedy g, pl WHERE g.pos <= length(g.word)),
      gr AS (SELECT word, freq, c AS gp FROM greedy
             WHERE pos = length(word) + 1)
      SELECT CAST(length(o.word) AS BIGINT) AS wlen,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(CASE WHEN g.gp > o.op THEN 1 ELSE 0 END) AS BIGINT)
               AS n_improved,
             CAST(SUM(g.gp) AS BIGINT) AS greedy_sum,
             CAST(SUM(o.op) AS BIGINT) AS opt_sum,
             CAST(SUM(o.freq * (g.gp - o.op)) AS BIGINT) AS tokens_saved
      FROM opt o JOIN gr g USING (word, freq)
      GROUP BY 1 ORDER BY wlen""")
  )

  /** Unigram-LM tokenizer TRAINING (SentencePiece's other half next to
    * q135's BPE; Kudo ACL'18) — seed a piece vocabulary, run Viterbi-EM,
    * prune, re-estimate:
    *
    *  1. SEED: q159's codebook machinery — top-64 2..4-char substrings of
    *     the corpus vocabulary by frequency-weighted occurrence (ties
    *     lexicographic) plus every single character (required chars,
    *     never pruned), each scored by its occurrence mass;
    *  2. E-STEP: decode every vocabulary word with the integer-cost
    *     Viterbi kernel ([[graft.operators.UnigramLm]] — costs are
    *     bitlen(T div t)+1, the exact ⌈log₂⌉ quantization both engines
    *     replay; backtrack takes the LONGEST piece on ties), expected
    *     count = word-frequency-weighted piece occurrences on the
    *     canonical path;
    *  3. M-STEP + PRUNE: drop the 16 multi-char pieces with the smallest
    *     expected count (ties lexicographic — SentencePiece's
    *     lowest-likelihood-loss pruning, count-quantized), floor
    *     surviving counts at 1 (Laplace), recompute costs;
    *  4. final E-step under the pruned model → the trained table.
    *
    * Scale shape (q97/q159's argument): the corpus collapses to the
    * DISTINCT-WORD vocabulary at the first aggregate; substring stats are
    * vocab-sized; the piece table is ≤ 64+Σchars collected rows
    * (corpus-size-independent driver syncs, the IVF/PQ codebook
    * discipline); each E-step is one partition-wise flatMap over the
    * vocabulary + a piece-keyed ≤90-group aggregate. Nothing scales with
    * corpus bytes. */
  val q178 = Q(
    "q178_unigram_train",
    (s, dir) => {
      import s.implicits._
      import graft.operators.UnigramLm
      val vocab = documents(s, dir)
        .select(explode(filter(split(col("text"), "\\s+"),
          x => x.rlike("^[a-z]+$"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
        .as[(String, Long)]
        .materialized // consumers: two seed collects + two E-step passes
      val multi: Seq[(String, Long)] = vocab.toDF("word", "freq")
        .select(col("word"), col("freq"),
          explode(sequence(lit(1), length(col("word")))).as("i"))
        .select(col("word"), col("freq"), col("i"),
          explode(array(lit(2), lit(3), lit(4))).as("l"))
        .filter(col("i") + col("l") - 1 <= length(col("word")))
        .select(col("word").substr(col("i"), col("l")).as("piece"),
          col("freq"))
        .groupBy("piece").agg(sum(col("freq")).as("t"))
        .orderBy(col("t").desc, col("piece")).limit(64)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val singles: Seq[(String, Long)] = vocab.toDF("word", "freq")
        .select(col("word"), col("freq"),
          explode(sequence(lit(1), length(col("word")))).as("i"))
        .select(col("word").substr(col("i"), lit(1)).as("piece"),
          col("freq"))
        .groupBy("piece").agg(sum(col("freq")).as("t"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      def result(rows: Seq[(String, Long, Long, Long, Long)]) =
        s.createDataFrame(rows)
          .toDF("piece", "plen", "seed_t", "em1", "em2")
          .orderBy("piece")
      if (singles.isEmpty) result(Seq.empty)
      else {
        def estep(cost: Map[String, Long]): Map[String, Long] =
          vocab.mapPartitions { it =>
            it.flatMap { case (w, f) =>
              UnigramLm.viterbiPieces(w, cost).map(p => (p, f))
            }
          }.toDF("piece", "freq")
            .groupBy("piece").agg(sum(col("freq")).as("e"))
            .collect().map(r => (r.getString(0), r.getLong(1))).toMap
        val e1 = estep(UnigramLm.costs((multi ++ singles).toMap))
        val dropped = multi.map { case (p, _) => (p, e1.getOrElse(p, 0L)) }
          .sortBy { case (p, e) => (e, p) }.take(16).map(_._1).toSet
        val survivors = multi.filterNot(c => dropped(c._1)) ++ singles
        val t1 = survivors
          .map { case (p, _) => p -> math.max(e1.getOrElse(p, 0L), 1L) }
          .toMap
        val e2 = estep(UnigramLm.costs(t1))
        result(survivors.map { case (p, t0) =>
          (p, p.length.toLong, t0, e1.getOrElse(p, 0L), e2.getOrElse(p, 0L))
        })
      }
    },
    Some(raw"""
      WITH RECURSIVE
      words AS MATERIALIZED (
        SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
          SELECT unnest(list_filter(string_split_regex(text, '\s+'),
            x -> regexp_matches(x, '^[a-z]+$$'))) AS w
          FROM documents)
        GROUP BY w),
      occ AS MATERIALIZED (
        SELECT substr(word, i, l) AS piece, freq
        FROM (SELECT word, freq, unnest(range(1, length(word) + 1)) AS i
              FROM words),
             (SELECT unnest([2, 3, 4]) AS l)
        WHERE i + l - 1 <= length(word)),
      multi AS MATERIALIZED (
        SELECT piece, t FROM (
          SELECT piece, CAST(SUM(freq) AS BIGINT) AS t,
                 ROW_NUMBER() OVER (ORDER BY SUM(freq) DESC, piece) AS rn
          FROM occ GROUP BY piece)
        WHERE rn <= 64),
      singles AS MATERIALIZED (
        SELECT piece, CAST(SUM(freq) AS BIGINT) AS t FROM (
          SELECT word[i:i] AS piece, freq
          FROM (SELECT word, freq, unnest(range(1, length(word) + 1)) AS i
                FROM words))
        GROUP BY piece),
      seed AS MATERIALIZED (SELECT piece, t FROM multi UNION ALL SELECT piece, t FROM singles),
      tot0 AS (SELECT CAST(SUM(t) AS BIGINT) AS tt FROM seed),
      cost0 AS MATERIALIZED (SELECT piece, CAST(length(bin(tt // t)) + 1 AS BIGINT) AS cost
                FROM seed, tot0),
      cl0 AS MATERIALIZED (SELECT list(piece ORDER BY piece) AS ps,
                     list(cost ORDER BY piece) AS cs FROM cost0),
      dp1 AS (
        SELECT word, freq, 0 AS i, [CAST(0 AS BIGINT)] AS b FROM words
        UNION ALL
        SELECT d.word, d.freq, d.i + 1,
          list_append(d.b, least(
            CASE WHEN list_position(ps, substr(d.word, d.i + 1, 1)) IS NOT NULL
                 THEN d.b[d.i + 1] + cs[list_position(ps, substr(d.word, d.i + 1, 1))]
                 ELSE 1000000000 END,
            CASE WHEN d.i + 1 >= 2
                   AND list_position(ps, substr(d.word, d.i, 2)) IS NOT NULL
                 THEN d.b[d.i] + cs[list_position(ps, substr(d.word, d.i, 2))]
                 ELSE 1000000000 END,
            CASE WHEN d.i + 1 >= 3
                   AND list_position(ps, substr(d.word, d.i - 1, 3)) IS NOT NULL
                 THEN d.b[d.i - 1] + cs[list_position(ps, substr(d.word, d.i - 1, 3))]
                 ELSE 1000000000 END,
            CASE WHEN d.i + 1 >= 4
                   AND list_position(ps, substr(d.word, d.i - 2, 4)) IS NOT NULL
                 THEN d.b[d.i - 2] + cs[list_position(ps, substr(d.word, d.i - 2, 4))]
                 ELSE 1000000000 END))
        FROM dp1 d, cl0 WHERE d.i < length(d.word)),
      dpf1 AS MATERIALIZED (SELECT word, freq, b FROM dp1 WHERE i = length(word)),
      bt1 AS (
        SELECT word, freq, length(word) AS pos, b, CAST(NULL AS VARCHAR) AS piece
        FROM dpf1
        UNION ALL
        SELECT word, freq, pos - l, b, substr(word, pos - l + 1, l)
        FROM (
          SELECT t.word, t.freq, t.pos, t.b,
            CASE WHEN t.pos >= 4
                   AND list_position(ps, substr(t.word, t.pos - 3, 4)) IS NOT NULL
                   AND t.b[t.pos - 3]
                       + cs[list_position(ps, substr(t.word, t.pos - 3, 4))]
                       = t.b[t.pos + 1] THEN 4
                 WHEN t.pos >= 3
                   AND list_position(ps, substr(t.word, t.pos - 2, 3)) IS NOT NULL
                   AND t.b[t.pos - 2]
                       + cs[list_position(ps, substr(t.word, t.pos - 2, 3))]
                       = t.b[t.pos + 1] THEN 3
                 WHEN t.pos >= 2
                   AND list_position(ps, substr(t.word, t.pos - 1, 2)) IS NOT NULL
                   AND t.b[t.pos - 1]
                       + cs[list_position(ps, substr(t.word, t.pos - 1, 2))]
                       = t.b[t.pos + 1] THEN 2
                 ELSE 1 END AS l
          FROM bt1 t, cl0 WHERE t.pos > 0)),
      e1 AS MATERIALIZED (SELECT piece, CAST(SUM(freq) AS BIGINT) AS e
             FROM bt1 WHERE piece IS NOT NULL GROUP BY piece),
      me1 AS MATERIALIZED (
        SELECT m.piece, m.t, COALESCE(e1.e, 0) AS e,
               ROW_NUMBER() OVER (ORDER BY COALESCE(e1.e, 0) ASC, m.piece ASC)
                 AS prn
        FROM multi m LEFT JOIN e1 ON m.piece = e1.piece),
      surv AS MATERIALIZED (
        SELECT piece, t FROM me1 WHERE prn > 16
        UNION ALL SELECT piece, t FROM singles),
      t1 AS MATERIALIZED (
        SELECT s.piece, s.t AS seed_t,
               greatest(COALESCE(e1.e, 0), 1) AS t,
               COALESCE(e1.e, 0) AS em1
        FROM surv s LEFT JOIN e1 ON s.piece = e1.piece),
      tot1 AS (SELECT CAST(SUM(t) AS BIGINT) AS tt FROM t1),
      cost1 AS MATERIALIZED (SELECT piece, CAST(length(bin(tt // t)) + 1 AS BIGINT) AS cost
                FROM t1, tot1),
      cl1 AS MATERIALIZED (SELECT list(piece ORDER BY piece) AS ps,
                     list(cost ORDER BY piece) AS cs FROM cost1),
      dp2 AS (
        SELECT word, freq, 0 AS i, [CAST(0 AS BIGINT)] AS b FROM words
        UNION ALL
        SELECT d.word, d.freq, d.i + 1,
          list_append(d.b, least(
            CASE WHEN list_position(ps, substr(d.word, d.i + 1, 1)) IS NOT NULL
                 THEN d.b[d.i + 1] + cs[list_position(ps, substr(d.word, d.i + 1, 1))]
                 ELSE 1000000000 END,
            CASE WHEN d.i + 1 >= 2
                   AND list_position(ps, substr(d.word, d.i, 2)) IS NOT NULL
                 THEN d.b[d.i] + cs[list_position(ps, substr(d.word, d.i, 2))]
                 ELSE 1000000000 END,
            CASE WHEN d.i + 1 >= 3
                   AND list_position(ps, substr(d.word, d.i - 1, 3)) IS NOT NULL
                 THEN d.b[d.i - 1] + cs[list_position(ps, substr(d.word, d.i - 1, 3))]
                 ELSE 1000000000 END,
            CASE WHEN d.i + 1 >= 4
                   AND list_position(ps, substr(d.word, d.i - 2, 4)) IS NOT NULL
                 THEN d.b[d.i - 2] + cs[list_position(ps, substr(d.word, d.i - 2, 4))]
                 ELSE 1000000000 END))
        FROM dp2 d, cl1 WHERE d.i < length(d.word)),
      dpf2 AS MATERIALIZED (SELECT word, freq, b FROM dp2 WHERE i = length(word)),
      bt2 AS (
        SELECT word, freq, length(word) AS pos, b, CAST(NULL AS VARCHAR) AS piece
        FROM dpf2
        UNION ALL
        SELECT word, freq, pos - l, b, substr(word, pos - l + 1, l)
        FROM (
          SELECT t.word, t.freq, t.pos, t.b,
            CASE WHEN t.pos >= 4
                   AND list_position(ps, substr(t.word, t.pos - 3, 4)) IS NOT NULL
                   AND t.b[t.pos - 3]
                       + cs[list_position(ps, substr(t.word, t.pos - 3, 4))]
                       = t.b[t.pos + 1] THEN 4
                 WHEN t.pos >= 3
                   AND list_position(ps, substr(t.word, t.pos - 2, 3)) IS NOT NULL
                   AND t.b[t.pos - 2]
                       + cs[list_position(ps, substr(t.word, t.pos - 2, 3))]
                       = t.b[t.pos + 1] THEN 3
                 WHEN t.pos >= 2
                   AND list_position(ps, substr(t.word, t.pos - 1, 2)) IS NOT NULL
                   AND t.b[t.pos - 1]
                       + cs[list_position(ps, substr(t.word, t.pos - 1, 2))]
                       = t.b[t.pos + 1] THEN 2
                 ELSE 1 END AS l
          FROM bt2 t, cl1 WHERE t.pos > 0)),
      e2 AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS e
             FROM bt2 WHERE piece IS NOT NULL GROUP BY piece)
      SELECT t1.piece, CAST(length(t1.piece) AS BIGINT) AS plen,
             t1.seed_t, t1.em1, COALESCE(e2.e, 0) AS em2
      FROM t1 LEFT JOIN e2 ON t1.piece = e2.piece
      ORDER BY t1.piece""")
  )

  val all: Seq[Q] = Seq(q25, q30, q31, q32, q36, q78, q87, q97, q100, q124,
    q135, q140, q147, q153, q154, q159, q178)
}
