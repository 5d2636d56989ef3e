package graft.queries

import org.apache.spark.sql.functions._

import Tables._

/** Additional training-data-pipeline operators over `documents`, beyond the
  * round-1 dedup/similarity/text suites: corpus vocabulary statistics,
  * deterministic content-hash sampling, and exact distribution quantiles.
  * All three are fully hash-checked against DuckDB.
  */
object PipelineQueries {

  /** Corpus vocabulary: top-50 tokens by total frequency, with document
    * frequency. The shuffle carries (token, count) pairs after map-side
    * partial aggregation — at 100 TB this is the standard wordcount shape
    * (vocab-sized, not corpus-sized, after combine); the top-k is a
    * TakeOrdered over the vocab. Ties broken by token for determinism. */
  val q33 = Q(
    "q33_vocab",
    (s, dir) => {
      val tokens = documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
      tokens
        .groupBy("token")
        .agg(count(lit(1)).as("tf"),
          countDistinct(col("doc_id")).as("df"))
        .orderBy(col("tf").desc, col("token"))
        .limit(50)
    },
    Some("""
      WITH tokens AS (
        SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
        FROM documents),
      vocab AS (
        SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
        FROM tokens WHERE length(token) > 0
        GROUP BY token)
      SELECT token, tf, df FROM vocab
      ORDER BY tf DESC, token LIMIT 50""")
  )

  /** Deterministic stratified sampling by content hash: keep a document iff
    * the first 8 md5 hex chars, as an integer, fall under the stratum's
    * threshold (en 10%, others 30% — downsample the dominant language).
    * Unlike `df.sample()`, the decision is a pure function of content, so
    * the same doc samples identically on any cluster size, partitioning, or
    * re-run, and survivors are re-derivable — the property a training
    * pipeline needs for reproducibility. Map-side filter, no shuffle
    * (beyond the verification ORDER BY). */
  val q34 = Q(
    "q34_hash_sample",
    (s, dir) => {
      val bucket = conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")
      val threshold = when(col("lang") === "en", lit((0.10 * (1L << 32)).toLong))
        .otherwise(lit((0.30 * (1L << 32)).toLong))
      documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"), bucket.as("bucket"))
        .filter(col("bucket") < threshold)
        .orderBy("doc_id")
    },
    Some(s"""
      SELECT doc_id, lang, n_chars,
             ('0x' || substr(md5(text), 1, 8))::BIGINT AS bucket
      FROM documents
      WHERE ('0x' || substr(md5(text), 1, 8))::BIGINT <
            CASE WHEN lang = 'en' THEN ${(0.10 * (1L << 32)).toLong}
                 ELSE ${(0.30 * (1L << 32)).toLong} END
      ORDER BY doc_id""")
  )

  /** Exact per-language quantiles of document length: p25/p50/p75 via the
    * exact `percentile` aggregate. Cross-engine exactness: the percentile
    * positions are dyadic (0.25/0.5/0.75), inputs are integers, and both
    * engines use the standard `h = 1 + (n-1)p` linear interpolation — every
    * intermediate is an exact double, so the results are bit-identical.
    * (The approximate scale path is q18's sketch pattern; this is the exact
    * twin, correct at any size but requiring a per-group sort.) */
  val q35 = Q(
    "q35_quantiles",
    (s, dir) =>
      documents(s, dir)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          percentile(col("n_chars"), lit(0.25)).as("p25"),
          percentile(col("n_chars"), lit(0.5)).as("p50"),
          percentile(col("n_chars"), lit(0.75)).as("p75"))
        .orderBy("lang"),
    Some("""
      SELECT lang, COUNT(*) AS n_docs,
             quantile_cont(n_chars, 0.25) AS p25,
             quantile_cont(n_chars, 0.5) AS p50,
             quantile_cont(n_chars, 0.75) AS p75
      FROM documents GROUP BY lang ORDER BY lang""")
  )

  /** Skew-mitigated aggregation — the salting pattern from the 100 TB
    * design checklist, as a tested exemplar: a heavily skewed group key
    * (`lang` has a handful of values, so a plain groupBy sends each
    * language's entire corpus through ONE reducer) is salted into
    * `lang × 16` sub-keys for the first, corpus-sized shuffle, then the 16
    * partials per language are combined in a second, vocabulary-sized
    * shuffle. The salt is deterministic (`crc32(doc_id) % 16`) and the
    * result is salt-invariant, which is exactly what the oracle checks:
    * DuckDB computes the UNSALTED aggregate and the hashes must match.
    * (AQE's skew handling covers joins; skewed aggregation is still the
    * caller's job, and this is the shape.) Sums stay on integers so
    * regrouping cannot change the value. */
  val q37 = Q(
    "q37_salted_agg",
    (s, dir) => {
      val salted = documents(s, dir)
        .withColumn("salt",
          pmod(crc32(col("doc_id").cast("string")), lit(16)))
      salted
        .groupBy("lang", "salt")
        .agg(count(lit(1)).as("pn"), sum(col("n_chars")).as("pc"))
        .groupBy("lang")
        .agg(sum(col("pn")).cast("long").as("n_docs"),
          sum(col("pc")).cast("long").as("total_chars"))
        .withColumn("avg_chars",
          col("total_chars").cast("double") / col("n_docs"))
        .orderBy("lang")
    },
    Some("""
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_chars
      FROM documents GROUP BY lang ORDER BY lang""")
  )

  /** Per-document top-3 TF-IDF terms. The idf factor is integer-scaled
    * (`(1e9 * n_docs) div df` — floor division in both engines) instead of
    * the float `log(N/df)`: both are strictly decreasing in df, so the
    * RANKING is the classic tf-idf ranking, while every score stays an
    * exact BIGINT that cannot drift cross-engine (a libm `ln` is not
    * guaranteed bit-identical between engines; see the fixed-point dot
    * rationale in SimilarityQueries).
    *
    * Scale shape: tf is a (doc, token)-keyed count with map-side combine;
    * df aggregates tf (vocabulary-sized); the corpus count is one scalar
    * cross join. The tf→df join is keyed on token — vocabulary-sized build
    * side, AQE picks broadcast vs shuffle. Final per-doc ranking is q07's
    * window-top-k shape: one hash exchange on doc_id with partial
    * WindowGroupLimit keeping ≤4 rows per doc per partition. */
  val q46 = Q(
    "q46_tfidf",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tokens = documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
      val tf = tokens.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val n = documents(s, dir).agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("token"))
      tf.join(df, "token")
        .crossJoin(n)
        .select(col("doc_id"), col("token"), col("tf"), col("df"),
          expr("tf * ((1000000000 * n_docs) div df)").as("score"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("doc_id", "rank", "token", "tf", "df", "score")
        .orderBy("doc_id", "rank")
    },
    Some("""
      WITH tokens AS (
        SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
        FROM documents),
      tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM tokens
        WHERE length(token) > 0 GROUP BY doc_id, token),
      df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      n AS (SELECT COUNT(*) AS n_docs FROM documents),
      scored AS (
        SELECT doc_id, token, tf, df,
               tf * ((1000000000 * n_docs) // df) AS score
        FROM tf JOIN df USING (token) CROSS JOIN n),
      ranked AS (
        SELECT doc_id, token, tf, df, score,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, token) AS rank
        FROM scored)
      SELECT doc_id, rank, token, tf, df, score
      FROM ranked WHERE rank <= 3
      ORDER BY doc_id, rank""")
  )

  val all: Seq[Q] = Seq(q33, q34, q35, q37, q46)
}
