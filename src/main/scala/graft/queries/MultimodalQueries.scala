package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal suite — binary payload columns with a stubbed decode
  * (see [[graft.operators.Multimodal]] for why the decode is fake and what
  * is real).
  *
  * q50 runs the full decode path; its fake metadata/features derive from a
  * wraparound-64-bit FNV hash, so it stays a rows-only check. q51 is the
  * oracle-checkable core split out per the same pipeline: the binary
  * payload column and its exact byte-length metadata (what a real media
  * catalog scan computes before any codec runs), aggregated per size
  * bucket — every value is integer-exact in both engines. */
object MultimodalQueries {

  val q50 = Q(
    "q50_multimodal_decode",
    (s, dir) => Multimodal.query(s, dir),
    None
  )

  val q51 = Q(
    "q51_media_meta",
    (s, dir) => {
      val meta = Multimodal.mediaTable(s, dir).toDF()
        .select(col("doc_id"), col("kind"),
          length(col("payload")).cast("long").as("n_bytes"))
      meta
        .withColumn("size_bucket", expr("n_bytes div 64"))
        .groupBy("kind", "size_bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bytes")).as("sum_bytes"),
          min(col("n_bytes")).as("min_bytes"),
          max(col("n_bytes")).as("max_bytes"))
        .orderBy("kind", "size_bucket")
    },
    // mediaTable's payload is encode(text, 'UTF-8'), so the oracle's byte
    // length is strlen(text) (DuckDB strlen counts BYTES, length counts
    // code points)
    Some("""
      WITH meta AS (
        SELECT doc_id, 'image' AS kind, CAST(strlen(text) AS BIGINT) AS n_bytes
        FROM documents)
      SELECT kind, n_bytes // 64 AS size_bucket, COUNT(*) AS n_docs,
             CAST(SUM(n_bytes) AS BIGINT) AS sum_bytes,
             MIN(n_bytes) AS min_bytes, MAX(n_bytes) AS max_bytes
      FROM meta GROUP BY kind, size_bucket
      ORDER BY kind, size_bucket""")
  )

  val all: Seq[Q] = Seq(q50, q51)
}
