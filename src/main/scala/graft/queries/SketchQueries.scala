package graft.queries

import graft.operators.Materialize.MaterializeOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.KmvSketch
import Tables._

/** Round-3 additions: a deterministic distinct-count sketch (the oracle-
  * checkable twin of q18's HLL), a capped inverted index, and the sliding-
  * window batch twin completing the window-family coverage (tumbling q15,
  * session q16, sliding here).
  */
object SketchQueries {

  /** KMV distinct-count sketch next to the exact count. Same fixed-state /
    * sketch-shuffle scale shape as q18's HLL, but the estimate is a pure
    * integer function of md5 (see [[graft.functions.KmvSketch]]), so DuckDB
    * recomputes it exactly: k smallest distinct hashes via ROW_NUMBER, then
    * `(k-1)*2^64 // h_(k)` in HUGEINT. This upgrades the sketch-aggregation
    * category from rows-only to a full hash-checked oracle row.
    *
    * At sf0.01 each return flag sees ~2000 distinct parts (> k=256, the
    * estimator path); sf0.001 has 200 (< k, the exact path) — both paths
    * are driver- or test-exercised. */
  val q27 = Q(
    "q27_kmv_distinct",
    (s, dir) =>
      lineitem(s, dir)
        .select(
          col("l_returnflag"),
          col("l_partkey"),
          // md5_prefix64 long ≡ parseUnsignedLong(first 16 hex chars)
          // (r15 pass): the sketch ingests the 64-bit value directly —
          // same k-smallest set under unsigned order, same estimate —
          // instead of rendering 32 hex chars per row and re-parsing 16
          graft.functions.GraftFunctions
            .md5_prefix64(col("l_partkey").cast("string")).as("h"))
        .groupBy("l_returnflag")
        .agg(
          KmvSketch.kmvDistinct(col("h"), 256).as("kmv_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
    Some("""
      WITH h AS (
        SELECT DISTINCT l_returnflag,
               substr(md5(CAST(l_partkey AS VARCHAR)), 1, 16) AS h
        FROM lineitem),
      r AS (
        SELECT l_returnflag, h,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rk,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS nd
        FROM h),
      est AS (
        SELECT l_returnflag,
               CASE WHEN nd < 256 THEN nd
                    ELSE CAST((CAST(255 AS HUGEINT) * 18446744073709551616)
                              // CAST(CAST('0x' || h AS UBIGINT) AS HUGEINT)
                         AS BIGINT)
               END AS kmv_parts
        FROM r
        WHERE rk = CASE WHEN nd < 256 THEN nd ELSE 256 END),
      ex AS (
        SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag)
      SELECT ex.l_returnflag, est.kmv_parts, ex.exact_parts, ex.n
      FROM ex JOIN est USING (l_returnflag)
      ORDER BY l_returnflag""")
  )

  /** Capped inverted index: per token, document frequency, total term
    * frequency, and the first 16 doc_ids (by id) as a posting string — the
    * exact-match search primitive of a training-data pipeline.
    *
    * Scale shape: (token, doc) pairs aggregate with map-side combine
    * (wordcount-shaped); the posting cap happens BEFORE collection via the
    * q07 window-top-k pattern, so `WindowGroupLimit` keeps ≤16 rows per
    * token per partition ahead of the exchange — no unbounded
    * `collect_list` of a stopword's corpus-sized posting list ever
    * materializes. Output restricted to df >= 5, top 100 by df. */
  val q39 = Q(
    "q39_inverted_index",
    (s, dir) => {
      val pairs = documents(s, dir)
        .select(col("doc_id"),
          explode(split(col("text"), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("token", "doc_id")
        .agg(count(lit(1)).as("tf_pair"))
      val stats = pairs.groupBy("token")
        .agg(count(lit(1)).as("df"), sum(col("tf_pair")).as("tf"))
      val w = Window.partitionBy(col("token")).orderBy(col("doc_id"))
      val postings = pairs
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 16)
        .groupBy("token")
        .agg(array_join(
          sort_array(collect_list(col("doc_id"))).cast("array<string>"),
          ",").as("postings"))
      stats.join(postings, "token")
        .filter(col("df") >= 5)
        .select("token", "df", "tf", "postings")
        .orderBy(col("df").desc, col("token"))
        .limit(100)
    },
    Some("""
      WITH tokens AS (
        SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
        FROM documents),
      inv AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS tf,
               array_to_string(list_sort(list(DISTINCT doc_id))[1:16], ',')
                 AS postings
        FROM tokens WHERE length(token) > 0
        GROUP BY token)
      SELECT token, df, tf, postings FROM inv
      WHERE df >= 5
      ORDER BY df DESC, token LIMIT 100""")
  )

  /** Sliding-window aggregate (1-hour windows every 15 minutes): the batch
    * twin of `groupBy(window($"ts", "1 hour", "15 minutes"))`. Spark
    * assigns each event to duration/slide = 4 epoch-aligned windows; the
    * oracle replicates that as a 4-row offset cross join over the
    * 15-minute floor — `make_timestamp(epoch_us // 900e6 * 900e6)`, exact
    * integer arithmetic on both sides. Completes the window-family batch
    * twins (q15 tumbling, q16 session). */
  val q52 = Q(
    "q52_sliding_window",
    (s, dir) =>
      events(s, dir)
        .groupBy(
          window(col("ts"), "1 hour", "15 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy("win_start", "event_type"),
    Some(s"""
      WITH ev AS (
        SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
      offs AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS t(i)),
      win AS (
        SELECT make_timestamp(
                 (epoch_us(ts) // 900000000) * 900000000
                 - CAST(i AS BIGINT) * 900000000) AS win_start,
               event_type, value
        FROM ev CROSS JOIN offs)
      SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
             event_type, COUNT(*) AS n_events,
             ${dsumSql("value")} AS sum_value
      FROM win
      GROUP BY 1, 2 ORDER BY win_start, event_type""")
  )

  /** Log-histogram approximate quantiles (HDR-histogram shape): bucket =
    * number of binary digits of the value (computed as the LENGTH of the
    * base-2 string — pure integer/string ops, so both engines agree at
    * power-of-two boundaries where a float log2 could round either way),
    * per-group counts per bucket, quantile estimate = lower bound 2^(b-1)
    * of the first bucket whose running count crosses ⌈q·n⌉.
    *
    * This is the mergeable, fixed-size answer to quantiles at 100 TB:
    * exact per-group percentiles (q35) sort or collect value lists, while
    * the histogram is ≤64 counters per group, merges by addition (map-side
    * partial aggregation, streaming state, cross-shard union), and bounds
    * relative error by 2x by construction. Spark's own percentile_approx
    * (GK sketch) has tighter error but engine-internal state; this shape
    * is what monitoring systems (HDR, DDSketch) standardize on, and it is
    * oracle-exact. */
  val q68 = Q(
    "q68_histogram_quantiles",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hist = documents(s, dir)
        .select(col("lang"),
          length(conv(col("n_chars"), 10, 2)).cast("long").as("bucket"))
        .groupBy("lang", "bucket").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("lang").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist
        .withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("n", sum(col("cnt")).over(Window.partitionBy("lang")))
      def qlb(q: Double, name: String) =
        min(when(col("cum") * 100 >= lit((q * 100).toLong) * col("n"),
          expr("CAST(POW(2, bucket - 1) AS BIGINT)"))).as(name)
      cum.groupBy("lang")
        .agg(max(col("n")).as("n_docs"),
          qlb(0.5, "p50_lb"), qlb(0.9, "p90_lb"), qlb(0.99, "p99_lb"))
        .orderBy("lang")
    },
    Some("""
      WITH hist AS (
        SELECT lang, CAST(LENGTH(bin(n_chars)) AS BIGINT) AS bucket,
               COUNT(*) AS cnt
        FROM documents GROUP BY lang, LENGTH(bin(n_chars))),
      cum AS (
        SELECT lang, bucket, cnt,
               CAST(SUM(cnt) OVER (PARTITION BY lang ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
               CAST(SUM(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
        FROM hist)
      SELECT lang, MAX(n) AS n_docs,
             MIN(CASE WHEN cum * 100 >= 50 * n
                 THEN CAST(POW(2, bucket - 1) AS BIGINT) END) AS p50_lb,
             MIN(CASE WHEN cum * 100 >= 90 * n
                 THEN CAST(POW(2, bucket - 1) AS BIGINT) END) AS p90_lb,
             MIN(CASE WHEN cum * 100 >= 99 * n
                 THEN CAST(POW(2, bucket - 1) AS BIGINT) END) AS p99_lb
      FROM cum GROUP BY lang ORDER BY lang""")
  )

  /** Exact heavy hitters via the two-pass Misra–Gries pattern: pass 1 is
    * the bounded [[graft.functions.MisraGries]] sketch (≤ m counters per
    * partition, partial aggregation IS the sketch merge) whose guarantee
    * — every token of count > N/(m+1) survives — makes the candidate set
    * a SUPERSET of the true heavy hitters; pass 2 recounts ONLY the ≤ m
    * candidates exactly (the inner join bounds aggregation state at m
    * groups) and keeps tokens with n_exact·31 > N (integer compare,
    * sound for capacity m = 30 since N/31 ≥ N/(m+1)).
    *
    * Why not one exact vocabulary groupBy: its state is proportional to
    * DISTINCT tokens — unbounded on a 100 TB web corpus (q33's vocab cap
    * is a top-k report, not a guarantee). Here every stage's state is
    * m counters; only the final ≤ m survivors materialize. The sketch's
    * internal counts are order-dependent, so they never leave the
    * pipeline: membership (deterministic by the guarantee) + exact
    * recount is what the oracle hash-checks with a plain GROUP BY +
    * HAVING — no sketch simulation needed on the DuckDB side. */
  val q75 = Q(
    "q75_heavy_hitters",
    (s, dir) => {
      val tokens = documents(s, dir)
        .select(explode(split(col("text"), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
        .materialized // three consumers: sketch, total, recount
      val cands = tokens
        .agg(graft.functions.MisraGries.misraGries(col("token"), 30).as("cand"))
        .select(explode(col("cand")).as("token"))
      val total = tokens.agg(count(lit(1)).as("total"))
      tokens.join(cands, "token")
        .groupBy("token").agg(count(lit(1)).as("n_exact"))
        .crossJoin(total) // one-row scalar (plan-guard allowlisted)
        .filter(col("n_exact") * 31 > col("total"))
        .select(col("token"), col("n_exact"))
        .orderBy(col("n_exact").desc, col("token"))
    },
    Some("""
      WITH tok AS (
        SELECT unnest(string_split_regex(text, '\s+')) AS token
        FROM documents),
      tok2 AS (SELECT token FROM tok WHERE length(token) > 0),
      tot AS (SELECT COUNT(*) AS total FROM tok2),
      c AS (SELECT token, COUNT(*) AS n_exact FROM tok2 GROUP BY token)
      SELECT token, n_exact FROM c, tot
      WHERE n_exact * 31 > total
      ORDER BY n_exact DESC, token""")
  )

  /** Sketch MERGEABILITY, machine-checked — the property that makes HLL
    * the distributed distinct count. A 100 TB corpus is never sketched in
    * one pass over one node: every executor (or every daily batch) folds
    * its own registers, and the global answer is the register-wise MAX of
    * the shard sketches. This query runs BOTH pipelines over lineitem —
    * direct (one register fold over everything) and sharded (8 ingest
    * shards by l_orderkey, registers per shard, max-merged) — and emits
    * both estimates plus the proof bit that they are identical. Register
    * max-merge is lossless by construction (max is associative/
    * commutative); here that argument is hash-checked end-to-end instead
    * of argued, the same discipline as q24≡q90.
    *
    * Scale shape: shard registers are ≤ shards×256 rows regardless of
    * corpus size; the merge shuffle is 256 rows. The three one-row frames
    * at the end join by scalar cross joins (fixed-size at any scale). */
  val q98 = Q(
    "q98_hll_merge",
    (s, dir) => {
      import RelationalQueries.{hllFromRegisters, hllRegisters}
      val li = lineitem(s, dir)
      val direct = hllFromRegisters(
        hllRegisters(li.withColumn("scope", lit("ALL")),
          col("l_partkey"), "scope"), "scope")
        .select(col("hll_parts").as("direct_est"))
      val sharded = li.withColumn("shard", pmod(col("l_orderkey"), lit(8)))
      val merged = hllRegisters(sharded, col("l_partkey"), "shard")
        .groupBy("bucket").agg(max(col("r")).as("r"))
        .withColumn("scope", lit("ALL"))
      val mergedEst = hllFromRegisters(merged, "scope")
        .select(col("hll_parts").as("merged_est"))
      val nShards = sharded
        .select(countDistinct(col("shard")).as("n_shards"))
      direct.crossJoin(mergedEst).crossJoin(nShards)
        .select(col("direct_est"), col("merged_est"),
          (col("direct_est") === col("merged_est")).cast("int")
            .as("merge_lossless"),
          col("n_shards"))
    },
    Some(s"""
      WITH hx AS (
        SELECT l_orderkey % 8 AS shard,
               md5(CAST(l_partkey AS VARCHAR)) AS x
        FROM lineitem),
      hb AS (
        SELECT shard,
               CAST(CAST('0x' || substr(x, 1, 2) AS UBIGINT) AS INT) AS bucket,
               CAST(CAST('0x' || substr(x, 3, 14) AS UBIGINT) AS BIGINT) AS w
        FROM hx),
      b5 AS (SELECT *, CASE WHEN w >= 4294967296 THEN 32 ELSE 0 END AS s5 FROM hb),
      b4 AS (SELECT *, w >> s5 AS t4 FROM b5),
      c4 AS (SELECT *, CASE WHEN t4 >= 65536 THEN 16 ELSE 0 END AS s4 FROM b4),
      b3 AS (SELECT *, t4 >> s4 AS t3 FROM c4),
      c3 AS (SELECT *, CASE WHEN t3 >= 256 THEN 8 ELSE 0 END AS s3 FROM b3),
      b2 AS (SELECT *, t3 >> s3 AS t2 FROM c3),
      c2 AS (SELECT *, CASE WHEN t2 >= 16 THEN 4 ELSE 0 END AS s2 FROM b2),
      b1 AS (SELECT *, t2 >> s2 AS t1 FROM c2),
      c1 AS (SELECT *, CASE WHEN t1 >= 4 THEN 2 ELSE 0 END AS s1 FROM b1),
      b0 AS (SELECT *, t1 >> s1 AS t0 FROM c1),
      c0 AS (SELECT *, CASE WHEN t0 >= 2 THEN 1 ELSE 0 END AS s0 FROM b0),
      rr AS (
        SELECT shard, bucket,
               57 - (CASE WHEN w = 0 THEN 0
                          ELSE s5 + s4 + s3 + s2 + s1 + s0 + 1 END) AS rho
        FROM c0),
      dreg AS (SELECT bucket, MAX(rho) AS r FROM rr GROUP BY bucket),
      sreg AS (SELECT shard, bucket, MAX(rho) AS r
               FROM rr GROUP BY shard, bucket),
      mreg AS (SELECT bucket, MAX(r) AS r FROM sreg GROUP BY bucket),
      dag AS (
        SELECT SUM(CAST(CAST(1 AS BIGINT) << (57 - r) AS HUGEINT)) AS s_obs,
               COUNT(*) AS nb
        FROM dreg),
      mag AS (
        SELECT SUM(CAST(CAST(1 AS BIGINT) << (57 - r) AS HUGEINT)) AS s_obs,
               COUNT(*) AS nb
        FROM mreg),
      dest AS (
        SELECT CAST(CAST('${RelationalQueries.HllNum}' AS HUGEINT) //
                    (${RelationalQueries.HllAlphaDen} * (s_obs + (256 - nb) *
                       CAST(144115188075855872 AS HUGEINT))) AS BIGINT)
                 AS direct_est
        FROM dag),
      mest AS (
        SELECT CAST(CAST('${RelationalQueries.HllNum}' AS HUGEINT) //
                    (${RelationalQueries.HllAlphaDen} * (s_obs + (256 - nb) *
                       CAST(144115188075855872 AS HUGEINT))) AS BIGINT)
                 AS merged_est
        FROM mag)
      SELECT d.direct_est, m.merged_est,
             CAST(d.direct_est = m.merged_est AS INT) AS merge_lossless,
             (SELECT COUNT(DISTINCT l_orderkey % 8) FROM lineitem) AS n_shards
      FROM dest d, mest m""")
  )

  /** Log-histogram shard-merge proof — q98's mergeability law applied to
    * q68's quantile sketch: the per-(lang, bucket) counters from 8
    * independent shards, merged by SUM, must yield the same histogram AND
    * the same quantile read-offs as the direct single-pass build. That is
    * the property that lets 1000 executors each sketch their partition
    * and a coordinator merge kilobytes — machine-checked here (both
    * pipelines computed, equality emitted as a column the oracle
    * hash-verifies), not assumed. Counters are exact integers, so merge
    * losslessness is equality, not approximation.
    *
    * Scale shape: two histogram aggregates (the sharded one keyed by
    * (shard, lang, bucket) — map-side combined either way) + bucket-keyed
    * re-merge; everything after the scans is buckets×langs rows. */
  val q132 = Q(
    "q132_histogram_merge",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val src = documents(s, dir)
        .select(col("doc_id"), col("lang"),
          length(conv(col("n_chars"), 10, 2)).cast("long").as("bucket"))
      val direct = src.groupBy("lang", "bucket")
        .agg(count(lit(1)).as("cnt"))
      val merged = src
        .withColumn("shard", pmod(col("doc_id"), lit(8)))
        .groupBy("shard", "lang", "bucket").agg(count(lit(1)).as("c"))
        .groupBy("lang", "bucket").agg(sum(col("c")).as("mcnt"))
      val w = Window.partitionBy("lang").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wl = Window.partitionBy("lang")
      val joined = direct.join(merged, Seq("lang", "bucket"))
        .withColumn("cell_equal", (col("cnt") === col("mcnt")).cast("int"))
        .withColumn("cum_d", sum(col("cnt")).over(w))
        .withColumn("n_d", sum(col("cnt")).over(wl))
        .withColumn("cum_m", sum(col("mcnt")).over(w))
        .withColumn("n_m", sum(col("mcnt")).over(wl))
      val pow2 = expr("CAST(POW(2, bucket - 1) AS BIGINT)")
      joined
        .groupBy("lang")
        .agg(sum(col("cnt")).as("n_docs"),
          min(col("cell_equal")).as("all_cells_equal"),
          min(when(col("cum_d") * 2 >= col("n_d"), pow2)).as("p50_direct"),
          min(when(col("cum_m") * 2 >= col("n_m"), pow2)).as("p50_merged"))
        .withColumn("merge_lossless",
          (col("all_cells_equal") === 1 &&
            col("p50_direct") === col("p50_merged")).cast("int"))
        .orderBy("lang")
    },
    Some("""
      WITH src AS (
        SELECT doc_id, lang, CAST(LENGTH(bin(n_chars)) AS BIGINT) AS bucket
        FROM documents),
      direct AS (
        SELECT lang, bucket, COUNT(*) AS cnt
        FROM src GROUP BY 1, 2),
      sharded AS (
        SELECT doc_id % 8 AS shard, lang, bucket, COUNT(*) AS c
        FROM src GROUP BY 1, 2, 3),
      merged AS (
        SELECT lang, bucket, CAST(SUM(c) AS BIGINT) AS mcnt
        FROM sharded GROUP BY 1, 2),
      joined AS (
        SELECT lang, bucket, cnt, mcnt,
               CAST(cnt = mcnt AS INT) AS cell_equal
        FROM direct JOIN merged USING (lang, bucket)),
      agg AS (
        SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_docs,
               MIN(cell_equal) AS all_cells_equal,
               MIN(CASE WHEN cum_d * 2 >= n_d
                   THEN CAST(POW(2, bucket - 1) AS BIGINT) END) AS p50_direct,
               MIN(CASE WHEN cum_m * 2 >= n_m
                   THEN CAST(POW(2, bucket - 1) AS BIGINT) END) AS p50_merged
        FROM (SELECT *,
                CAST(SUM(cnt) OVER (PARTITION BY lang ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS cum_d,
                CAST(SUM(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n_d,
                CAST(SUM(mcnt) OVER (PARTITION BY lang ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS cum_m,
                CAST(SUM(mcnt) OVER (PARTITION BY lang) AS BIGINT) AS n_m
              FROM joined)
        GROUP BY lang)
      SELECT lang, n_docs, all_cells_equal, p50_direct, p50_merged,
             CAST(all_cells_equal = 1 AND p50_direct = p50_merged AS INT)
               AS merge_lossless
      FROM agg ORDER BY lang""")
  )

  val all: Seq[Q] = Seq(q27, q39, q52, q68, q75, q98, q132)
}
