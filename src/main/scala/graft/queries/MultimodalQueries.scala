package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal suite — binary payload columns with a REAL container-header
  * decode (see [[graft.operators.Multimodal]]: PNG/JPEG/GIF/WAV headers
  * parsed from their public specs; only the feature extraction is a
  * deterministic metadata-derived stand-in).
  *
  * q50 runs the full path: wrap each document's bytes in a real container
  * (format/dimensions derived from doc_id), parse the header back
  * executor-side, and emit (width, height, format, feat_norm). The oracle
  * recomputes the same values from the doc_id arithmetic + header sizes —
  * if either the builders or the parser mis-handle a single byte, the hash
  * diverges. q51 is the pre-codec catalog core (exact byte-length
  * metadata) over the raw payloads. */
object MultimodalQueries {

  val q50 = Q(
    "q50_multimodal_decode",
    (s, dir) => Multimodal.query(s, dir),
    // Mirrors the container build arithmetic: header sizes are the exact
    // public-spec header lengths the builders emit (png 33 = sig+IHDR,
    // jpeg 21 = SOI+SOF0, gif 13 = GIF89a LSD, wav 44 = RIFF/fmt/data);
    // width/height for audio carry (sample_rate, channels). feat_ss is
    // integer, so sqrt(ss)/1000 is bit-identical in both engines.
    Some("""
      WITH base AS (
        SELECT doc_id,
               doc_id % 4 AS fk,
               CAST(strlen(text) AS BIGINT) AS body_len
        FROM documents),
      meta AS (
        SELECT doc_id,
               CASE fk WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                       WHEN 2 THEN 'gif' ELSE 'wav' END AS format,
               CASE fk WHEN 0 THEN 33 WHEN 1 THEN 21
                       WHEN 2 THEN 13 ELSE 44 END + body_len AS n_bytes,
               CAST(CASE WHEN fk = 3 THEN 8000 + (doc_id % 8) * 4000
                         ELSE 16 + (doc_id * 31 + 7) % 2048 END AS INTEGER) AS width,
               CAST(CASE WHEN fk = 3 THEN 1 + doc_id % 2
                         ELSE 16 + (doc_id * 17 + 3) % 2048 END AS INTEGER) AS height
        FROM base),
      feats AS (
        SELECT m.doc_id,
               CAST(SUM(((m.width * (2*d.d + 1) + m.height * (3*d.d + 2)
                          + m.n_bytes * (d.d + 1)) % 2000 - 1000)
                        * ((m.width * (2*d.d + 1) + m.height * (3*d.d + 2)
                            + m.n_bytes * (d.d + 1)) % 2000 - 1000)) AS BIGINT) AS ss
        FROM meta m, (SELECT unnest(range(0, 8)) AS d) d
        GROUP BY m.doc_id)
      SELECT m.doc_id, m.n_bytes, m.width, m.height, m.format,
             sqrt(CAST(f.ss AS DOUBLE)) / 1000.0 AS feat_norm
      FROM meta m JOIN feats f USING (doc_id)
      ORDER BY m.doc_id""")
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

  /** Deterministic frame sampling over binary payloads — the video-shaped
    * multimodal op: K=4 evenly spaced 64-byte windows per payload
    * ("frames"), each reduced to its md5 fingerprint. The byte arithmetic
    * (offset = 1 + k·(n−64)/3, binary substring, binary md5) is exactly
    * what a real frame sampler does before the codec runs, and — unlike
    * the codec — it is fully expressible in codegen'd built-ins, so this
    * path is hash-checked while q50's stubbed decode stays rows-only.
    *
    * Scale shape: pure map-side generate → slice → hash; payload bytes
    * never shuffle (only 32-char fingerprints leave the scan stage), and
    * downstream frame-level dedup inherits q20's key discipline.
    *
    * Oracle note: the fixture payloads are `encode(text,'UTF-8')` and the
    * fixture text is pure ASCII (verified: strlen == length for every
    * row), so DuckDB — which has no BLOB substring/md5 — mirrors the byte
    * windows with VARCHAR slicing bit-for-bit. */
  val q70 = Q(
    "q70_frame_sample",
    (s, dir) => {
      val W = 64
      val K = 4
      Multimodal.mediaTable(s, dir).toDF()
        .select(col("doc_id"), col("payload"),
          length(col("payload")).cast("long").as("n_bytes"))
        .filter(col("n_bytes") >= W)
        .select(col("doc_id"), col("payload"), col("n_bytes"),
          explode(expr(s"sequence(0, ${K - 1})")).as("k"))
        .select(col("doc_id"), col("payload"),
          col("k").cast("long").as("frame_id"),
          expr(s"1 + (k * (n_bytes - $W)) div ${K - 1}").as("off"))
        .select(col("doc_id"), col("frame_id"), col("off"),
          md5(expr(s"substring(payload, CAST(off AS INT), $W)")).as("frame_hash"))
        .orderBy("doc_id", "frame_id")
    },
    Some("""
      WITH media AS (
        SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS n_bytes
        FROM documents WHERE strlen(text) >= 64),
      frames AS (
        SELECT doc_id, k, 1 + (k * (n_bytes - 64)) // 3 AS off
        FROM media, (SELECT unnest(range(0, 4)) AS k))
      SELECT f.doc_id, CAST(f.k AS BIGINT) AS frame_id, f.off,
             md5(substring(m.text, f.off, 64)) AS frame_hash
      FROM frames f JOIN media m USING (doc_id)
      ORDER BY f.doc_id, frame_id""")
  )

  /** Cross-modal fused curation gate — the keep/drop decision a multimodal
    * corpus needs to make ONCE, over both modalities: text quality
    * (integer TTR) gates every document, and documents that carry an
    * embedding must additionally pass an embedding-sanity gate (squared
    * L2 norm within ±20% of 1.0 — the cheap detector for truncated /
    * zeroed / double-scaled vectors, in exact ×1e12 fixed-point).
    * Documents without an embedding pass on text alone: coverage is
    * partial by design (the embedding table is a subset at sf≥0.1), and a
    * curation gate that silently drops unembedded docs would bias the
    * corpus toward whatever the embedding pipeline got to first.
    *
    * Scale shape: one id-equi LEFT join (both sides shuffle on the 8-byte
    * id — or co-partition/bucket by id at rest and it vanishes), norm and
    * quality are map-side codegen; output is one row per document. */
  val q126 = Q(
    "q126_fused_gate",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"),
          expr("""aggregate(
              transform(embedding,
                x -> cast(floor(cast(x as double) * 1000000) as bigint)),
              cast(0 as bigint), (a, x) -> a + x * x)""").as("norm2"))
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"),
          expr("""(1000 * size(array_distinct(
               filter(split(text, '\\s+'), x -> length(x) > 0)))) div
               size(filter(split(text, '\\s+'), x -> length(x) > 0))""")
            .as("q"))
      docs.join(emb, col("doc_id") === col("vec_id"), "left")
        .select(col("doc_id"),
          col("vec_id").isNotNull.cast("int").as("has_emb"),
          coalesce(col("norm2"), lit(-1L)).as("norm2_x1e12"),
          col("q"),
          (col("q") >= 450 &&
            (col("vec_id").isNull ||
              (col("norm2") >= 800000000000L &&
                col("norm2") <= 1200000000000L))).cast("int").as("keep"))
        .orderBy("doc_id")
    },
    Some("""
      WITH norms AS (
        SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS norm2
        FROM (SELECT vec_id,
                     CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                          AS BIGINT) AS v
              FROM embeddings)
        GROUP BY vec_id),
      docs AS (
        SELECT doc_id,
               (1000 * len(list_distinct(ws)) // len(ws)) AS q
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> length(x) > 0) AS ws
              FROM documents))
      SELECT doc_id,
             CAST(vec_id IS NOT NULL AS INT) AS has_emb,
             COALESCE(norm2, -1) AS norm2_x1e12,
             q,
             CAST(q >= 450 AND (vec_id IS NULL OR
                  (norm2 BETWEEN 800000000000 AND 1200000000000)) AS INT)
               AS keep
      FROM docs LEFT JOIN norms ON doc_id = vec_id
      ORDER BY doc_id""")
  )

  /** Modality token budgeting — the context-cost accounting a multimodal
    * pretraining mix runs before fixing its interleaving ratios: every
    * media document's CONTEXT COST is its text tokens plus its modality
    * tokens — a ViT-style 16×16 patch grid for images (⌈w/16⌉·⌈h/16⌉,
    * the patch arithmetic vision encoders bill by) and 10 ms frames for
    * audio (PCM samples from the RIFF header's rate/channels, then
    * samples·100 div rate). Per format: document count, text vs modal
    * token mass, and the modal share in basis points — the table that
    * says "png docs spend 87% of their context on pixels".
    *
    * The width/height/rate/channels feeding the patch math come from the
    * REAL container-header decode ([[graft.operators.Multimodal.MediaCodec]]
    * parses the PNG/JPEG/GIF/RIFF headers byte-for-byte); the oracle
    * recomputes them from the fixture arithmetic, so a one-byte header
    * mis-parse diverges the hash.
    *
    * Scale shape: the decode is partition-wise (payloads never leave
    * their scan task); the doc_id equi-join attaches word counts (8-byte
    * keys; co-partition by id at rest and it vanishes); the roll-up is a
    * 4-group map-side-combined aggregate. Bytes and text never shuffle. */
  val q150 = Q(
    "q150_modal_token_budget",
    (s, dir) => {
      val decoded = Multimodal.decodeAll(Multimodal.containerTable(s, dir))
        .toDF()
        .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
          col("format"))
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"),
          size(filter(split(col("text"), "\\s+"), x => length(x) > 0))
            .cast("long").as("tt"))
      decoded.join(toks, "doc_id")
        .withColumn("mt",
          when(col("format") === "wav",
            expr("(((n_bytes - 44) div (2 * height)) * 100) div width"))
            .otherwise(expr("((width + 15) div 16) * ((height + 15) div 16)")))
        .groupBy("format")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tt")).as("text_tokens"),
          sum(col("mt")).as("modal_tokens"))
        .withColumn("modal_share_bp",
          expr("modal_tokens * 10000 div (modal_tokens + text_tokens)"))
        .orderBy("format")
    },
    // Mirrors containerTable's fixture arithmetic (q50 oracle discipline):
    // header sizes 33/21/13/44, width/height from the doc_id recurrences,
    // (rate, channels) in the audio spatial slots.
    Some("""
      WITH base AS (
        SELECT doc_id, doc_id % 4 AS fk,
               CAST(strlen(text) AS BIGINT) AS body_len,
               CAST(len(list_filter(string_split_regex(text, '\s+'),
                                    x -> length(x) > 0)) AS BIGINT) AS tt
        FROM documents),
      meta AS (
        SELECT doc_id, tt,
               CASE fk WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                       WHEN 2 THEN 'gif' ELSE 'wav' END AS format,
               CASE fk WHEN 0 THEN 33 WHEN 1 THEN 21
                       WHEN 2 THEN 13 ELSE 44 END + body_len AS n_bytes,
               CASE WHEN fk = 3 THEN 8000 + (doc_id % 8) * 4000
                    ELSE 16 + (doc_id * 31 + 7) % 2048 END AS width,
               CASE WHEN fk = 3 THEN 1 + doc_id % 2
                    ELSE 16 + (doc_id * 17 + 3) % 2048 END AS height
        FROM base),
      tok AS (
        SELECT format, tt,
               CASE WHEN format = 'wav'
                    THEN (((n_bytes - 44) // (2 * height)) * 100) // width
                    ELSE ((width + 15) // 16) * ((height + 15) // 16)
               END AS mt
        FROM meta)
      SELECT format, COUNT(*) AS n_docs,
             CAST(SUM(tt) AS BIGINT) AS text_tokens,
             CAST(SUM(mt) AS BIGINT) AS modal_tokens,
             CAST(SUM(mt) AS BIGINT) * 10000
               // (CAST(SUM(mt) AS BIGINT) + CAST(SUM(tt) AS BIGINT))
               AS modal_share_bp
      FROM tok GROUP BY format ORDER BY format""")
  )

  val all: Seq[Q] = Seq(q50, q51, q70, q126, q150)
}
