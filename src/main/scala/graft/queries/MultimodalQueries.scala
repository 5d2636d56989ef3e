package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Materialize.MaterializeOps

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

  /** Image perceptual-hash near-dup — the multimodal twin of the text
    * near-dup family (q22 MinHash / q80 sign-ANN): every image container
    * decodes to a 64-bit dHash ([[Multimodal.MediaCodec.dhashBands]] —
    * 8×8 gradient bits over a 9×8 average-pooled downsample of the
    * decoded body), candidate pairs come from a Hamming-BUCKET equi-join
    * (4 × 16-bit bands; Hamming ≤ 3 ⇒ some band equal by pigeonhole —
    * never all-pairs), and survivors are scored by exact Hamming
    * distance via XOR+popcount. Audio containers (wav), corrupt payloads
    * and sub-grid bodies are excluded by the decoder itself.
    *
    * The catalog is the container fixture PLUS a planted near-duplicate
    * twin for every 5th image (img_id = doc_id + 10⁷): the same body
    * hashed under the deterministic re-encode dither (+1 gray on cells
    * j ≡ 0 mod 7), so twins land at Hamming 0–5 of their originals while
    * unrelated images measure ≥ ~17 — the query's report is dominated by
    * exactly the planted near-dups, with both engines replaying the same
    * integer pooling bit-for-bit.
    *
    * As-deployed semantics like q22/q166: band buckets are capped at 256
    * members (a degenerate hash shared by thousands of images — solid
    * borders, test cards — would otherwise quadratically explode one
    * bucket); cap-induced misses are the documented production trade and
    * the oracle applies the identical cap.
    *
    * Scale shape: the dHash is a per-row map (decode stays executor-side,
    * payload bytes never shuffle — only (img_id, 4×int16) signatures do);
    * the bucket join is an equi-join on (band, value) with the >1 and
    * ≤cap bucket filter; the rerank join touches only candidate pairs.
    * At 100 TB this is exactly the text-LSH layout with an 8-byte
    * signature instead of a 64-long MinHash. */
  val q173 = Q(
    "q173_image_phash_dedup",
    (s, dir) => {
      import s.implicits._
      val sig = Multimodal.containerTable(s, dir).mapPartitions { rows =>
        rows.flatMap { r =>
          val base = Multimodal.MediaCodec.dhashBands(r.payload)
            .map(b => (r.doc_id, b(0), b(1), b(2), b(3)))
          val twin =
            if (r.doc_id % 5 == 0)
              Multimodal.MediaCodec.dhashBands(r.payload, dither = true)
                .map(b => (r.doc_id + 10000000L, b(0), b(1), b(2), b(3)))
            else None
          base.iterator ++ twin.iterator
        }
      }.toDF("img_id", "b0", "b1", "b2", "b3")
        .materialized // consumers: band explode + both rerank sides
      val bands = sig.select(col("img_id"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
          .as(Seq("band", "bv")))
      val ok = bands.groupBy("band", "bv")
        .agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") > 1 && col("bsz") <= 256)
        .select("band", "bv")
      val bounded = bands.join(ok, Seq("band", "bv"))
      val cand = bounded.as("x")
        .join(bounded.as("y"),
          col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
            col("x.img_id") < col("y.img_id"))
        .select(col("x.img_id").as("da"), col("y.img_id").as("db"))
        .distinct()
      cand
        .join(sig.select(col("img_id").as("da"), col("b0").as("a0"),
          col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3")), "da")
        .join(sig.select(col("img_id").as("db"), col("b0").as("c0"),
          col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3")), "db")
        .withColumn("hamming",
          expr("""CAST(bit_count(a0 ^ c0) + bit_count(a1 ^ c1)
                  + bit_count(a2 ^ c2) + bit_count(a3 ^ c3) AS BIGINT)"""))
        .filter(col("hamming") <= 3)
        .select("da", "db", "hamming")
        .orderBy("da", "db")
    },
    // The oracle rebuilds the dHash from documents.text directly: the
    // container body IS the document's UTF-8 bytes (builders append it
    // verbatim after the public-spec header), image formats are
    // doc_id % 4 ∈ {0,1,2}, byte i of the body is hex-sliced out of
    // encode(text), and cell j pools bytes [⌊jn/72⌋, ⌊(j+1)n/72⌋) via the
    // exact inverse j = (72(i+1)−1) // n — bit-for-bit the executor-side
    // pooling.
    Some("""
      WITH img AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               CAST(strlen(text) AS BIGINT) AS n
        FROM documents WHERE doc_id % 4 < 3 AND strlen(text) >= 72),
      -- MATERIALIZED on every CTE read twice+ (px, cat, sig, bands, bnd):
      -- CTE inlining would replay the per-byte hex expansion per reader
      px AS MATERIALIZED (
        SELECT doc_id, (72 * (i + 1) - 1) // n AS j,
               SUM(('0x' || substr(hx, CAST(2 * i + 1 AS BIGINT),
                                   2))::BIGINT) // COUNT(*) AS p
        FROM (SELECT doc_id, hx, n,
                     CAST(unnest(range(0, n)) AS BIGINT) AS i
              FROM img)
        GROUP BY doc_id, j),
      cat AS MATERIALIZED (
        SELECT doc_id AS img_id, j, p FROM px
        UNION ALL
        SELECT doc_id + 10000000, j,
               p + CASE WHEN j % 7 = 0 THEN 1 ELSE 0 END
        FROM px WHERE doc_id % 5 = 0),
      bitvals AS (
        SELECT a.img_id, a.j // 9 * 8 + a.j % 9 AS bit,
               CASE WHEN b.p > a.p THEN 1 ELSE 0 END AS v
        FROM cat a JOIN cat b ON a.img_id = b.img_id AND b.j = a.j + 1
        WHERE a.j % 9 < 8),
      sig AS MATERIALIZED (
        SELECT img_id,
               CAST(SUM(CASE WHEN bit // 16 = 0
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b0,
               CAST(SUM(CASE WHEN bit // 16 = 1
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b1,
               CAST(SUM(CASE WHEN bit // 16 = 2
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b2,
               CAST(SUM(CASE WHEN bit // 16 = 3
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b3
        FROM bitvals GROUP BY img_id),
      bands AS (
        SELECT img_id, unnest([b0, b1, b2, b3]) AS bv,
               generate_subscripts([b0, b1, b2, b3], 1) AS band
        FROM sig),
      ok AS (SELECT band, bv FROM bands GROUP BY band, bv
             HAVING COUNT(*) > 1 AND COUNT(*) <= 256),
      bnd AS (SELECT bands.* FROM bands JOIN ok USING (band, bv)),
      cand AS (
        SELECT DISTINCT x.img_id AS da, y.img_id AS db
        FROM bnd x JOIN bnd y
          ON x.band = y.band AND x.bv = y.bv AND x.img_id < y.img_id),
      ham AS (
        SELECT da, db,
               CAST(bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
                  + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
                 AS BIGINT) AS hamming
        FROM cand
        JOIN sig sa ON sa.img_id = da
        JOIN sig sb ON sb.img_id = db)
      SELECT da, db, hamming FROM ham WHERE hamming <= 3 ORDER BY da, db""")
  )

  /** Audio perceptual near-dup — completes the text + image + audio
    * near-dup triad (q22 MinHash / q173 dHash / this): every WAV
    * container decodes to a 64-bit frame-energy sign fingerprint
    * ([[Multimodal.MediaCodec.audioBands]] — 65 pooled time frames, one
    * gradient bit per adjacent pair; gain-invariant by construction),
    * candidate pairs come from the SAME Hamming-bucket layout as q173
    * (4 × 16-bit bands, pigeonhole-complete at radius 3, buckets capped
    * at 256), survivors scored by exact XOR+popcount Hamming.
    *
    * The catalog is the q173 container fixture's audio quarter
    * (doc_id ≡ 3 mod 4) PLUS a planted re-encode twin for every audio
    * doc with doc_id ≡ 0 mod 3 (aud_id = doc_id + 10⁷): the same data
    * chunk fingerprinted under a +2 uniform gain (invisible — the
    * fingerprint is sign-of-delta) plus +1 dither on frames j ≡ 0 mod 7,
    * so twins land at Hamming 0–5 while unrelated audio measures far
    * outside the radius.
    *
    * Scale shape: identical to q173 — the fingerprint is a per-row map
    * (PCM bytes never shuffle, only (aud_id, 4×int16) signatures), the
    * bucket join is a capped (band, value) equi-join, the rerank join
    * touches only candidate pairs. At 100 TB this is the text-LSH
    * layout with an 8-byte audio signature. */
  val q174 = Q(
    "q174_audio_fingerprint_dedup",
    (s, dir) => {
      import s.implicits._
      val sig = Multimodal.containerTable(s, dir).mapPartitions { rows =>
        rows.flatMap { r =>
          val base = Multimodal.MediaCodec.audioBands(r.payload)
            .map(b => (r.doc_id, b(0), b(1), b(2), b(3)))
          val twin =
            if (r.doc_id % 3 == 0)
              Multimodal.MediaCodec.audioBands(r.payload, dither = true)
                .map(b => (r.doc_id + 10000000L, b(0), b(1), b(2), b(3)))
            else None
          base.iterator ++ twin.iterator
        }
      }.toDF("aud_id", "b0", "b1", "b2", "b3")
        .materialized // consumers: band explode + both rerank sides
      val bands = sig.select(col("aud_id"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
          .as(Seq("band", "bv")))
      val ok = bands.groupBy("band", "bv")
        .agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") > 1 && col("bsz") <= 256)
        .select("band", "bv")
      val bounded = bands.join(ok, Seq("band", "bv"))
      val cand = bounded.as("x")
        .join(bounded.as("y"),
          col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
            col("x.aud_id") < col("y.aud_id"))
        .select(col("x.aud_id").as("da"), col("y.aud_id").as("db"))
        .distinct()
      cand
        .join(sig.select(col("aud_id").as("da"), col("b0").as("a0"),
          col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3")), "da")
        .join(sig.select(col("aud_id").as("db"), col("b0").as("c0"),
          col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3")), "db")
        .withColumn("hamming",
          expr("""CAST(bit_count(a0 ^ c0) + bit_count(a1 ^ c1)
                  + bit_count(a2 ^ c2) + bit_count(a3 ^ c3) AS BIGINT)"""))
        .filter(col("hamming") <= 3)
        .select("da", "db", "hamming")
        .orderBy("da", "db")
    },
    // The oracle rebuilds the fingerprint from documents.text directly
    // (q173 discipline): the WAV data chunk IS the document's UTF-8
    // bytes, audio format is doc_id % 4 = 3, byte i is hex-sliced out of
    // encode(text), frame j pools bytes [⌊jn/65⌋, ⌊(j+1)n/65⌋) via the
    // exact inverse j = (65(i+1)−1) // n, twins add the +2 gain and the
    // j%7 dither at the frame level — bit-for-bit the executor pooling.
    Some("""
      WITH aud AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               CAST(strlen(text) AS BIGINT) AS n
        FROM documents WHERE doc_id % 4 = 3 AND strlen(text) >= 65),
      fr AS MATERIALIZED (
        SELECT doc_id, (65 * (i + 1) - 1) // n AS j,
               SUM(('0x' || substr(hx, CAST(2 * i + 1 AS BIGINT),
                                   2))::BIGINT) // COUNT(*) AS p
        FROM (SELECT doc_id, hx, n,
                     CAST(unnest(range(0, n)) AS BIGINT) AS i
              FROM aud)
        GROUP BY doc_id, j),
      cat AS MATERIALIZED (
        SELECT doc_id AS aud_id, j, p FROM fr
        UNION ALL
        SELECT doc_id + 10000000, j,
               p + 2 + CASE WHEN j % 7 = 0 THEN 1 ELSE 0 END
        FROM fr WHERE doc_id % 3 = 0),
      bitvals AS (
        SELECT a.aud_id, a.j AS bit,
               CASE WHEN b.p > a.p THEN 1 ELSE 0 END AS v
        FROM cat a JOIN cat b ON a.aud_id = b.aud_id AND b.j = a.j + 1
        WHERE a.j < 64),
      sig AS MATERIALIZED (
        SELECT aud_id,
               CAST(SUM(CASE WHEN bit // 16 = 0
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b0,
               CAST(SUM(CASE WHEN bit // 16 = 1
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b1,
               CAST(SUM(CASE WHEN bit // 16 = 2
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b2,
               CAST(SUM(CASE WHEN bit // 16 = 3
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b3
        FROM bitvals GROUP BY aud_id),
      bands AS MATERIALIZED (
        SELECT aud_id, unnest([b0, b1, b2, b3]) AS bv,
               generate_subscripts([b0, b1, b2, b3], 1) AS band
        FROM sig),
      ok AS (SELECT band, bv FROM bands GROUP BY band, bv
             HAVING COUNT(*) > 1 AND COUNT(*) <= 256),
      bnd AS MATERIALIZED (
        SELECT bands.* FROM bands JOIN ok USING (band, bv)),
      cand AS (
        SELECT DISTINCT x.aud_id AS da, y.aud_id AS db
        FROM bnd x JOIN bnd y
          ON x.band = y.band AND x.bv = y.bv AND x.aud_id < y.aud_id),
      ham AS (
        SELECT da, db,
               CAST(bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
                  + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
                 AS BIGINT) AS hamming
        FROM cand
        JOIN sig sa ON sa.aud_id = da
        JOIN sig sb ON sb.aud_id = db)
      SELECT da, db, hamming FROM ham WHERE hamming <= 3 ORDER BY da, db""")
  )

  /** Video sequence near-dup — completes the modality ladder (q22 text /
    * q173 image / q174 audio / this): every AVI container decodes to a
    * 64-bit sequence fingerprint ([[Multimodal.MediaCodec.videoBands]] —
    * q173's 9×8 dHash kernel per `00db` frame, then per-bit MAJORITY over
    * valid frames, the temporal pooling that survives any single
    * re-encoded/dropped frame), candidate pairs come from the SAME
    * Hamming-bucket layout as q173/q174 (4 × 16-bit bands,
    * pigeonhole-complete at radius 3, buckets capped at 256), survivors
    * scored by exact XOR+popcount Hamming.
    *
    * The catalog is the 4-frame AVI fixture ([[Multimodal.videoTable]])
    * PLUS a planted re-encode twin for every doc_id ≡ 0 mod 3
    * (vid_id = doc_id + 10⁷): the same frames fingerprinted under the
    * per-frame +1 dither on cells j ≡ 0 mod 7 (q173's construction), so
    * twins land at Hamming 0–5 while unrelated videos measure far outside
    * the radius. Payloads with fewer than 2 valid (≥72-byte) frames are
    * excluded by the decoder itself.
    *
    * Scale shape: identical to q173/q174 — the fingerprint is a per-row
    * map (frame bytes never shuffle, only (vid_id, 4×int16) signatures),
    * the bucket join is a capped (band, value) equi-join, the rerank join
    * touches only candidate pairs. At 100 TB this is the text-LSH layout
    * with an 8-byte video signature. */
  val q177 = Q(
    "q177_video_phash_dedup",
    (s, dir) => {
      import s.implicits._
      val sig = Multimodal.videoTable(s, dir).mapPartitions { rows =>
        rows.flatMap { r =>
          val base = Multimodal.MediaCodec.videoBands(r.payload)
            .map(b => (r.doc_id, b(0), b(1), b(2), b(3)))
          val twin =
            if (r.doc_id % 3 == 0)
              Multimodal.MediaCodec.videoBands(r.payload, dither = true)
                .map(b => (r.doc_id + 10000000L, b(0), b(1), b(2), b(3)))
            else None
          base.iterator ++ twin.iterator
        }
      }.toDF("vid_id", "b0", "b1", "b2", "b3")
        .materialized // consumers: band explode + both rerank sides
      val bands = sig.select(col("vid_id"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
          .as(Seq("band", "bv")))
      val ok = bands.groupBy("band", "bv")
        .agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") > 1 && col("bsz") <= 256)
        .select("band", "bv")
      val bounded = bands.join(ok, Seq("band", "bv"))
      val cand = bounded.as("x")
        .join(bounded.as("y"),
          col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
            col("x.vid_id") < col("y.vid_id"))
        .select(col("x.vid_id").as("da"), col("y.vid_id").as("db"))
        .distinct()
      cand
        .join(sig.select(col("vid_id").as("da"), col("b0").as("a0"),
          col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3")), "da")
        .join(sig.select(col("vid_id").as("db"), col("b0").as("c0"),
          col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3")), "db")
        .withColumn("hamming",
          expr("""CAST(bit_count(a0 ^ c0) + bit_count(a1 ^ c1)
                  + bit_count(a2 ^ c2) + bit_count(a3 ^ c3) AS BIGINT)"""))
        .filter(col("hamming") <= 3)
        .select("da", "db", "hamming")
        .orderBy("da", "db")
    },
    // The oracle rebuilds the fingerprint from documents.text (q173/q174
    // discipline): frame f of the AVI IS body bytes [⌊fn/4⌋, ⌊(f+1)n/4⌋)
    // (builders slice verbatim), byte i is hex-sliced out of encode(text),
    // its frame via the exact inverse f = (4(i+1)−1) // n, its cell via
    // j = (72(iw+1)−1) // m within the frame; frames shorter than 72
    // bytes drop out, docs with < 2 valid frames drop out, and the
    // sequence bit is the majority over valid frames — bit-for-bit the
    // executor pooling.
    Some("""
      WITH vid AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               CAST(strlen(text) AS BIGINT) AS n
        FROM documents WHERE strlen(text) >= 1),
      fb AS (
        SELECT doc_id, i, byte,
               (4 * (i + 1) - 1) // n AS f,
               (((4 * (i + 1) - 1) // n) * n) // 4 AS flo,
               ((((4 * (i + 1) - 1) // n) + 1) * n) // 4 AS fhi
        FROM (SELECT doc_id, n, i,
                     ('0x' || substr(hx, CAST(2 * i + 1 AS BIGINT),
                                     2))::BIGINT AS byte
              FROM (SELECT doc_id, hx, n,
                           CAST(unnest(range(0, n)) AS BIGINT) AS i
                    FROM vid))),
      -- MATERIALIZED on every CTE read more than once (px ×3, cat ×2 in
      -- the adjacent-cell self-join, sig ×3, bands ×2, bnd ×2): DuckDB's
      -- CTE inlining otherwise replays the per-byte hex expansion once
      -- per reader — the whole corpus re-decoded up to four times
      px AS MATERIALIZED (
        SELECT doc_id, f, (72 * (i - flo + 1) - 1) // (fhi - flo) AS j,
               SUM(byte) // COUNT(*) AS p
        FROM fb WHERE fhi - flo >= 72
        GROUP BY doc_id, f, j),
      fc AS (
        SELECT doc_id FROM (SELECT doc_id, COUNT(DISTINCT f) AS nf
                            FROM px GROUP BY doc_id)
        WHERE nf >= 2),
      cat AS MATERIALIZED (
        SELECT doc_id AS vid_id, f, j, p FROM px JOIN fc USING (doc_id)
        UNION ALL
        SELECT doc_id + 10000000, f, j,
               p + CASE WHEN j % 7 = 0 THEN 1 ELSE 0 END
        FROM px JOIN fc USING (doc_id) WHERE doc_id % 3 = 0),
      bitv AS (
        SELECT a.vid_id, a.f, a.j // 9 * 8 + a.j % 9 AS bit,
               CASE WHEN b.p > a.p THEN 1 ELSE 0 END AS v
        FROM cat a JOIN cat b
          ON a.vid_id = b.vid_id AND a.f = b.f AND b.j = a.j + 1
        WHERE a.j % 9 < 8),
      seqbit AS (
        SELECT vid_id, bit,
               CASE WHEN 2 * SUM(v) > COUNT(*) THEN 1 ELSE 0 END AS v
        FROM bitv GROUP BY vid_id, bit),
      sig AS MATERIALIZED (
        SELECT vid_id,
               CAST(SUM(CASE WHEN bit // 16 = 0
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b0,
               CAST(SUM(CASE WHEN bit // 16 = 1
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b1,
               CAST(SUM(CASE WHEN bit // 16 = 2
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b2,
               CAST(SUM(CASE WHEN bit // 16 = 3
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b3
        FROM seqbit GROUP BY vid_id),
      bands AS MATERIALIZED (
        SELECT vid_id, unnest([b0, b1, b2, b3]) AS bv,
               generate_subscripts([b0, b1, b2, b3], 1) AS band
        FROM sig),
      ok AS (SELECT band, bv FROM bands GROUP BY band, bv
             HAVING COUNT(*) > 1 AND COUNT(*) <= 256),
      bnd AS MATERIALIZED (
        SELECT bands.* FROM bands JOIN ok USING (band, bv)),
      cand AS (
        SELECT DISTINCT x.vid_id AS da, y.vid_id AS db
        FROM bnd x JOIN bnd y
          ON x.band = y.band AND x.bv = y.bv AND x.vid_id < y.vid_id),
      ham AS (
        SELECT da, db,
               CAST(bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
                  + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
                 AS BIGINT) AS hamming
        FROM cand
        JOIN sig sa ON sa.vid_id = da
        JOIN sig sb ON sb.vid_id = db)
      SELECT da, db, hamming FROM ham WHERE hamming <= 3 ORDER BY da, db""")
  )

  /** Real-pixel PNG near-dup — q173's join over REAL zlib images: every
    * document becomes an actual PNG (executor-side
    * [[Multimodal.Containers.pngGray8]] — forward-filtered scanlines,
    * real deflate, dimensions and a linear pixel field (x·a + y·b + c)
    * mod 256 derived from doc_id), decoded back through the REAL road
    * ([[Multimodal.MediaCodec.pngGray]]: inflate + unfilter + 2-D pool —
    * never the byte stand-in), and every 5th image gets a twin that is
    * the SAME pixels recompressed under a different zlib level AND
    * different per-row filter types. The law the query carries: twins'
    * byte streams differ, their dHash is IDENTICAL (Hamming 0) — the
    * recompression invariance that is impossible under byte pooling —
    * while the oracle computes every hash from the PIXEL ARITHMETIC
    * alone, never seeing a PNG byte: the whole compress→decompress→
    * unfilter→pool pipeline must be lossless and exact or the gate
    * hashes diverge. Candidates come from the same 4×16-bit
    * Hamming-band capped-bucket equi-join as q173/q174/q177.
    *
    * Scale shape: encode+decode is per-row map work (payload bytes never
    * shuffle — only 8-byte signatures do); the band join is the q173
    * layout unchanged. */
  val q183 = Q(
    "q183_png_pixel_dedup",
    (s, dir) => {
      import s.implicits._
      import Multimodal.{Containers, MediaCodec}
      val sig = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.flatMap { id =>
            val w = (16 + math.floorMod(id * 31 + 7, 48L)).toInt
            val h = (16 + math.floorMod(id * 17 + 3, 32L)).toInt
            val a = (1 + math.floorMod(id, 7L)).toInt
            val b = (1 + math.floorMod(id, 11L)).toInt
            val c = math.floorMod(id, 256L).toInt
            val px = new Array[Byte](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                px(y * w + x) = ((x * a + y * b + c) % 256).toByte
                x += 1
              }
              y += 1
            }
            val lvl = (id % 3).toInt * 4 + 1 // 1 / 5 / 9
            val base = Containers.pngGray8(w, h, px, lvl,
              y0 => ((id + y0) % 5).toInt)
            // a decode failure here is a codec bug — fail the task loudly,
            // never silently diverge from the oracle
            val bb = MediaCodec.dhashBands(base).get
            val rows = Seq((id, bb(0), bb(1), bb(2), bb(3)))
            if (id % 5 == 0) {
              val twin = Containers.pngGray8(w, h, px, 10 - lvl,
                y0 => ((id + y0 + 1) % 5).toInt)
              val tb = MediaCodec.dhashBands(twin).get
              rows :+ ((id + 10000000L, tb(0), tb(1), tb(2), tb(3)))
            } else rows
          }
        }.toDF("img_id", "b0", "b1", "b2", "b3")
        .materialized // consumers: band explode + both rerank sides
      val bands = sig.select(col("img_id"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
          .as(Seq("band", "bv")))
      val ok = bands.groupBy("band", "bv")
        .agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") > 1 && col("bsz") <= 256)
        .select("band", "bv")
      val bounded = bands.join(ok, Seq("band", "bv"))
      val cand = bounded.as("x")
        .join(bounded.as("y"),
          col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
            col("x.img_id") < col("y.img_id"))
        .select(col("x.img_id").as("da"), col("y.img_id").as("db"))
        .distinct()
      cand
        .join(sig.select(col("img_id").as("da"), col("b0").as("a0"),
          col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3")), "da")
        .join(sig.select(col("img_id").as("db"), col("b0").as("c0"),
          col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3")), "db")
        .withColumn("hamming",
          expr("""CAST(bit_count(a0 ^ c0) + bit_count(a1 ^ c1)
                  + bit_count(a2 ^ c2) + bit_count(a3 ^ c3) AS BIGINT)"""))
        .filter(col("hamming") <= 3)
        .select("da", "db", "hamming")
        .orderBy("da", "db")
    },
    // The oracle derives every cell mean straight from the pixel formula
    // (x·a + y·b + c) mod 256 over the exact 9×8 pool rectangles (cell
    // ownership via the q173 inverse (K(i+1)−1)//n); twins reuse the SAME
    // cells — recompression must be invisible. Not one PNG byte exists on
    // this side: any loss anywhere in the Spark side's deflate→inflate→
    // unfilter→pool chain breaks the hash.
    Some("""
      WITH imgs AS MATERIALIZED (
        SELECT doc_id,
               16 + (doc_id*31+7) % 48 AS w, 16 + (doc_id*17+3) % 32 AS h,
               1 + doc_id % 7 AS a, 1 + doc_id % 11 AS b,
               doc_id % 256 AS c
        FROM documents),
      ys AS (SELECT doc_id, w, h, a, b, c,
                    CAST(unnest(range(0, h)) AS BIGINT) AS y FROM imgs),
      xys AS (SELECT doc_id, w, h, a, b, c, y,
                     CAST(unnest(range(0, w)) AS BIGINT) AS x FROM ys),
      cells AS MATERIALIZED (
        SELECT doc_id,
               ((8*(y+1)-1) // h) * 9 + (9*(x+1)-1) // w AS j,
               CAST(SUM((x*a + y*b + c) % 256) // COUNT(*) AS BIGINT) AS p
        FROM xys GROUP BY doc_id, j),
      cat AS (
        SELECT doc_id AS img_id, j, p FROM cells
        UNION ALL
        SELECT doc_id + 10000000, j, p FROM cells WHERE doc_id % 5 = 0),
      bitvals AS (
        SELECT a.img_id, a.j // 9 * 8 + a.j % 9 AS bit,
               CASE WHEN b.p > a.p THEN 1 ELSE 0 END AS v
        FROM cat a JOIN cat b ON a.img_id = b.img_id AND b.j = a.j + 1
        WHERE a.j % 9 < 8),
      sig AS MATERIALIZED (
        SELECT img_id,
               CAST(SUM(CASE WHEN bit // 16 = 0
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b0,
               CAST(SUM(CASE WHEN bit // 16 = 1
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b1,
               CAST(SUM(CASE WHEN bit // 16 = 2
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b2,
               CAST(SUM(CASE WHEN bit // 16 = 3
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b3
        FROM bitvals GROUP BY img_id),
      bands AS (
        SELECT img_id, unnest([b0, b1, b2, b3]) AS bv,
               generate_subscripts([b0, b1, b2, b3], 1) AS band
        FROM sig),
      ok AS (SELECT band, bv FROM bands GROUP BY band, bv
             HAVING COUNT(*) > 1 AND COUNT(*) <= 256),
      bnd AS (SELECT bands.* FROM bands JOIN ok USING (band, bv)),
      cand AS (
        SELECT DISTINCT x.img_id AS da, y.img_id AS db
        FROM bnd x JOIN bnd y
          ON x.band = y.band AND x.bv = y.bv AND x.img_id < y.img_id),
      ham AS (
        SELECT da, db,
               CAST(bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
                  + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
                 AS BIGINT) AS hamming
        FROM cand
        JOIN sig sa ON sa.img_id = da
        JOIN sig sb ON sb.img_id = db)
      SELECT da, db, hamming FROM ham WHERE hamming <= 3 ORDER BY da, db""")
  )

  /** Cross-format pixel fingerprint — q183's discipline extended across
    * COMPRESSION STACKS: every document's pixel field (a linear
    * (x·a + y·b + c) mod 256 ramp from doc_id, different constants from
    * q183's) is encoded BOTH as a real PNG (zlib, doc_id-chosen level +
    * per-row filters) and as a real GIF (LZW with dictionary growth,
    * 4-pass interlace for odd doc_ids), each decoded back through its own
    * real road ([[Multimodal.MediaCodec.pngGray]] /
    * [[Multimodal.MediaCodec.gifGray]]), and the row carries the PNG-side
    * dHash bands plus `agree` = 1 iff the GIF-side hash is bit-identical.
    * The oracle computes the bands from the PIXEL ARITHMETIC alone and
    * asserts agree = 1 — so BOTH codec stacks must be lossless and exact,
    * per document, or the gate hash diverges. Per-row map work; no
    * payload ever shuffles. */
  val q184 = Q(
    "q184_gif_cross_format",
    (s, dir) => {
      import s.implicits._
      import Multimodal.{Containers, MediaCodec}
      Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val w = (16 + math.floorMod(id * 13 + 5, 40L)).toInt
            val h = (16 + math.floorMod(id * 7 + 1, 24L)).toInt
            val a = (1 + math.floorMod(id, 5L)).toInt
            val b = (1 + math.floorMod(id, 9L)).toInt
            val c = math.floorMod(id * 3, 256L).toInt
            val px = new Array[Byte](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                px(y * w + x) = ((x * a + y * b + c) % 256).toByte
                x += 1
              }
              y += 1
            }
            val png = Containers.pngGray8(w, h, px, (id % 3).toInt * 4 + 1,
              y0 => ((id + y0) % 5).toInt)
            val gif = Containers.gifGray8(w, h, px, interlaced = id % 2 == 1)
            val pb = MediaCodec.dhashBands(png).get
            val gb = MediaCodec.dhashBands(gif).get
            val agree =
              if (pb(0) == gb(0) && pb(1) == gb(1) && pb(2) == gb(2) &&
                pb(3) == gb(3)) 1L
              else 0L
            (id, pb(0).toLong, pb(1).toLong, pb(2).toLong, pb(3).toLong, agree)
          }
        }
        .toDF("doc_id", "b0", "b1", "b2", "b3", "agree")
        .orderBy("doc_id")
    },
    Some("""
      WITH imgs AS MATERIALIZED (
        SELECT doc_id,
               16 + (doc_id*13+5) % 40 AS w, 16 + (doc_id*7+1) % 24 AS h,
               1 + doc_id % 5 AS a, 1 + doc_id % 9 AS b,
               (doc_id*3) % 256 AS c
        FROM documents),
      ys AS (SELECT doc_id, w, h, a, b, c,
                    CAST(unnest(range(0, h)) AS BIGINT) AS y FROM imgs),
      xys AS (SELECT doc_id, w, h, a, b, c, y,
                     CAST(unnest(range(0, w)) AS BIGINT) AS x FROM ys),
      cells AS MATERIALIZED (
        SELECT doc_id,
               ((8*(y+1)-1) // h) * 9 + (9*(x+1)-1) // w AS j,
               CAST(SUM((x*a + y*b + c) % 256) // COUNT(*) AS BIGINT) AS p
        FROM xys GROUP BY doc_id, j),
      bitvals AS (
        SELECT a.doc_id, a.j // 9 * 8 + a.j % 9 AS bit,
               CASE WHEN b.p > a.p THEN 1 ELSE 0 END AS v
        FROM cells a JOIN cells b ON a.doc_id = b.doc_id AND b.j = a.j + 1
        WHERE a.j % 9 < 8)
      SELECT doc_id,
             CAST(SUM(CASE WHEN bit // 16 = 0
               THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
               AS BIGINT) AS b0,
             CAST(SUM(CASE WHEN bit // 16 = 1
               THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
               AS BIGINT) AS b1,
             CAST(SUM(CASE WHEN bit // 16 = 2
               THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
               AS BIGINT) AS b2,
             CAST(SUM(CASE WHEN bit // 16 = 3
               THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
               AS BIGINT) AS b3,
             CAST(1 AS BIGINT) AS agree
      FROM bitvals GROUP BY doc_id ORDER BY doc_id""")
  )

  /** Baseline-JPEG roundtrip — the q183/q184 discipline for the LOSSY
    * format: every document's pixel field goes through a REAL baseline
    * JPEG (DC-only quantization at a doc_id-chosen quantizer, custom
    * canonical Huffman tables, restart markers every 3 MCUs for
    * doc_id ≡ 0 mod 4, 0xFF00 byte stuffing) and back through the full
    * entropy decoder + IDCT ([[Multimodal.MediaCodec.jpegGray]]). DC-only
    * keeps the loss EXACTLY replayable: the decoded block is the integer
    * ⌊(dcQ·q0 + 4)/8⌋ + 128 of the quantized block mean, so the oracle
    * recomputes every pixel, the decode checksum AND the dHash bands from
    * integer arithmetic alone — markers, Huffman codes, bit stuffing,
    * restarts, dequant and the IDCT's DC path all have to be exact for
    * the gate hash to land. Per-row map work; payloads never shuffle. */
  val q185 = Q(
    "q185_jpeg_dc_roundtrip",
    (s, dir) => {
      import s.implicits._
      import Multimodal.{Containers, MediaCodec}
      Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val w = (16 + math.floorMod(id * 11 + 3, 40L)).toInt
            val h = (16 + math.floorMod(id * 5 + 7, 24L)).toInt
            val a = (1 + math.floorMod(id, 6L)).toInt
            val b = (1 + math.floorMod(id, 8L)).toInt
            val c = math.floorMod(id * 7, 256L).toInt
            val q0 = (1 + math.floorMod(id, 7L)).toInt
            val px = new Array[Byte](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                px(y * w + x) = ((x * a + y * b + c) % 256).toByte
                x += 1
              }
              y += 1
            }
            val jpg = Containers.jpegGray8Dc(w, h, px, q0,
              restartEvery = if (id % 4 == 0) 3 else 0)
            val (gw, gh, gray) = MediaCodec.jpegGray(jpg).get
            var sum = 0L
            var i = 0
            while (i < gray.length) { sum += gray(i) & 0xff; i += 1 }
            // fingerprint the plane already decoded for the checksum —
            // bandsOfGray is bit-identical to dhashBands' real road
            val bands = MediaCodec.bandsOfGray(gw, gh, gray).get
            (id, gw.toLong, gh.toLong, sum,
              bands(0).toLong, bands(1).toLong, bands(2).toLong,
              bands(3).toLong)
          }
        }
        .toDF("doc_id", "w", "h", "gray_sum", "b0", "b1", "b2", "b3")
        .orderBy("doc_id")
    },
    // Integer replay of the lossy road: S = Σ(p−128) per edge-replicated
    // 8×8 block, dcQ = ⌊(2S + 8q0)/(16q0)⌋ (floor(), NOT // — DuckDB's //
    // truncates toward zero on negatives), decoded pixel =
    // clamp(⌊(dcQ·q0+4)/8⌋+128); the dHash pools the blockwise-constant
    // plane. The float divisions are exact: numerators are small integers
    // and true non-integer quotients sit ≥ 1/(16·q0) from any integer.
    Some("""
      WITH imgs AS MATERIALIZED (
        SELECT doc_id,
               16 + (doc_id*11+3) % 40 AS w, 16 + (doc_id*5+7) % 24 AS h,
               1 + doc_id % 6 AS a, 1 + doc_id % 8 AS b,
               (doc_id*7) % 256 AS c, 1 + doc_id % 7 AS q0
        FROM documents),
      pys AS (SELECT doc_id, w, h, a, b, c, q0,
                     CAST(unnest(range(0, ((h+7)//8)*8)) AS BIGINT) AS y
              FROM imgs),
      pxy AS MATERIALIZED (SELECT doc_id, w, h, a, b, c, q0, y,
                     CAST(unnest(range(0, ((w+7)//8)*8)) AS BIGINT) AS x
              FROM pys),
      bsum AS MATERIALIZED (
        -- padded plane: coordinates past the edge replicate the edge pixel
        SELECT doc_id, w, h, q0, x // 8 AS bx, y // 8 AS by,
               CAST(SUM((least(x, w-1)*a + least(y, h-1)*b + c) % 256 - 128)
                 AS BIGINT) AS s
        FROM pxy GROUP BY doc_id, w, h, q0, bx, by),
      bpix AS MATERIALIZED (
        SELECT doc_id, w, h, bx, by,
               greatest(0, least(255,
                 CAST(floor((CAST(floor((2*s + 8*q0) / (16.0*q0)) AS BIGINT)
                             * q0 + 4) / 8.0) AS BIGINT) + 128)) AS pv
        FROM bsum),
      gpx AS MATERIALIZED (
        SELECT p.doc_id, p.y, p.x, b.pv
        FROM (SELECT doc_id, w, h, y, x FROM pxy WHERE x < w AND y < h) p
        JOIN bpix b ON b.doc_id = p.doc_id
                   AND b.bx = p.x // 8 AND b.by = p.y // 8),
      sums AS (
        SELECT doc_id, CAST(SUM(pv) AS BIGINT) AS gray_sum FROM gpx
        GROUP BY doc_id),
      cells AS MATERIALIZED (
        SELECT g.doc_id,
               ((8*(g.y+1)-1) // i.h) * 9 + (9*(g.x+1)-1) // i.w AS j,
               CAST(SUM(g.pv) // COUNT(*) AS BIGINT) AS p
        FROM gpx g JOIN imgs i ON i.doc_id = g.doc_id
        GROUP BY g.doc_id, j),
      bitvals AS (
        SELECT a.doc_id, a.j // 9 * 8 + a.j % 9 AS bit,
               CASE WHEN b.p > a.p THEN 1 ELSE 0 END AS v
        FROM cells a JOIN cells b ON a.doc_id = b.doc_id AND b.j = a.j + 1
        WHERE a.j % 9 < 8),
      sig AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN bit // 16 = 0
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b0,
               CAST(SUM(CASE WHEN bit // 16 = 1
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b1,
               CAST(SUM(CASE WHEN bit // 16 = 2
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b2,
               CAST(SUM(CASE WHEN bit // 16 = 3
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b3
        FROM bitvals GROUP BY doc_id)
      SELECT i.doc_id, CAST(i.w AS BIGINT) AS w, CAST(i.h AS BIGINT) AS h,
             sums.gray_sum, sig.b0, sig.b1, sig.b2, sig.b3
      FROM imgs i
      JOIN sums ON sums.doc_id = i.doc_id
      JOIN sig ON sig.doc_id = i.doc_id
      ORDER BY i.doc_id""")
  )

  /** Animated-GIF temporal dedup — q183's discipline extended to
    * ANIMATIONS (the round-14 pooling road): every document becomes a
    * REAL 3-frame GIF89a animation
    * ([[Multimodal.Containers.gifGray8Anim]]) — frame 0 a full-canvas
    * linear ramp, frame 1 a SUB-RECT delta patch with GCE-transparent
    * holes (do-not-dispose compositing), frame 2 a full-canvas
    * overwrite — decoded back through the real road
    * ([[Multimodal.MediaCodec.gifGrayFrames]]: per-frame LZW + honest
    * canvas compositing), hashed with per-bit majorities across the
    * three composited planes, and joined through the q173 Hamming-band
    * capped-bucket layout. Every 5th animation gets a twin that encodes
    * the SAME composited planes differently — the delta frame rewritten
    * as an opaque overwrite of the composite (no transparency, different
    * LZW stream): re-encoding an animation must land Hamming 0, which is
    * impossible unless LZW, the GCE transparency walk, the compositing
    * AND the majority pooling are all exact. The oracle replays the
    * composite and the majority from pure integer arithmetic — it never
    * sees a GIF byte.
    *
    * Scale shape: encode+decode is per-row map work (q183's priced
    * shape); payload bytes never shuffle, only the four 16-bit bands
    * enter the capped-bucket band join. */
  val q186 = Q(
    "q186_gif_anim_dedup",
    (s, dir) => {
      import s.implicits._
      import Multimodal.{Containers, MediaCodec}
      import Multimodal.Containers.GifFrame
      val sig = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.flatMap { id =>
            val w = (12 + math.floorMod(id, 16L)).toInt
            val h = (10 + math.floorMod(id, 8L)).toInt
            val a = (1 + math.floorMod(id, 7L)).toInt
            val b = (1 + math.floorMod(id, 11L)).toInt
            val c = math.floorMod(id, 256L).toInt
            val g0 = new Array[Byte](w * h)
            val g2 = new Array[Byte](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                g0(y * w + x) = ((x * a + y * b + c) % 256).toByte
                g2(y * w + x) =
                  ((x * 2 + y * 7 + (c * 3) % 256) % 256).toByte
                x += 1
              }
              y += 1
            }
            // delta patch: rect at (l, t), painted value range 0..254,
            // holes (transparent index 255) where (px+py+id) % 3 == 0
            val l = math.floorMod(id, 5L).toInt
            val t = math.floorMod(id, 4L).toInt
            val pw = w / 2; val ph = h / 2
            val patch = new Array[Byte](pw * ph)
            val opaque = new Array[Byte](pw * ph) // twin: composite verbatim
            var py = 0
            while (py < ph) {
              var px = 0
              while (px < pw) {
                val hole = math.floorMod(px + py + id, 3L) == 0L
                val vp = (px * 3 + py * 5 + math.floorMod(id, 255L).toInt) % 255
                patch(py * pw + px) = (if (hole) 255 else vp).toByte
                opaque(py * pw + px) =
                  if (hole) g0((t + py) * w + l + px) else vp.toByte
                px += 1
              }
              py += 1
            }
            def bandsOf(delta: GifFrame): Array[Int] = {
              val anim = Containers.gifGray8Anim(w, h, Seq(
                GifFrame(0, 0, w, h, g0), delta, GifFrame(0, 0, w, h, g2)))
              // a decode failure here is a codec bug — fail the task
              // loudly, never silently diverge from the oracle
              MediaCodec.dhashBands(anim).get
            }
            val bb = bandsOf(GifFrame(l, t, pw, ph, patch, transIdx = 255))
            val rows =
              Seq((id, bb(0).toLong, bb(1).toLong, bb(2).toLong, bb(3).toLong))
            if (id % 5 == 0) {
              val tb = bandsOf(GifFrame(l, t, pw, ph, opaque))
              rows :+ ((id + 10000000L, tb(0).toLong, tb(1).toLong,
                tb(2).toLong, tb(3).toLong))
            } else rows
          }
        }.toDF("anim_id", "b0", "b1", "b2", "b3")
        .materialized // consumers: band explode + both rerank sides
      val bands = sig.select(col("anim_id"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
          .as(Seq("band", "bv")))
      val ok = bands.groupBy("band", "bv")
        .agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") > 1 && col("bsz") <= 256)
        .select("band", "bv")
      val bounded = bands.join(ok, Seq("band", "bv"))
      val cand = bounded.as("x")
        .join(bounded.as("y"),
          col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
            col("x.anim_id") < col("y.anim_id"))
        .select(col("x.anim_id").as("da"), col("y.anim_id").as("db"))
        .distinct()
      cand
        .join(sig.select(col("anim_id").as("da"), col("b0").as("a0"),
          col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3")), "da")
        .join(sig.select(col("anim_id").as("db"), col("b0").as("c0"),
          col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3")), "db")
        .withColumn("hamming",
          expr("""CAST(bit_count(a0 ^ c0) + bit_count(a1 ^ c1)
                  + bit_count(a2 ^ c2) + bit_count(a3 ^ c3) AS BIGINT)"""))
        .filter(col("hamming") <= 3)
        .select("da", "db", "hamming")
        .orderBy("da", "db")
    },
    // The oracle replays frame 0 (ramp), frame 1 (the composite: painted
    // value where not a hole, underlying ramp where it is) and frame 2
    // (overwrite ramp) per PIXEL, pools the exact 9×8 cell means per
    // frame, takes the 2·Σv > count per-bit majority across the three
    // frames (q177's law), and runs the same band join. Twins reuse the
    // SAME cells — re-encoding must be invisible. Not one GIF byte exists
    // on this side.
    Some("""
      WITH anims AS MATERIALIZED (
        SELECT doc_id,
               12 + doc_id % 16 AS w, 10 + doc_id % 8 AS h,
               1 + doc_id % 7 AS a, 1 + doc_id % 11 AS b,
               doc_id % 256 AS c,
               doc_id % 5 AS l, doc_id % 4 AS t
        FROM documents),
      ys AS (SELECT *, CAST(unnest(range(0, h)) AS BIGINT) AS y FROM anims),
      xys AS (SELECT *, CAST(unnest(range(0, w)) AS BIGINT) AS x FROM ys),
      -- all three frame values in ONE per-pixel pass (a ×3 frame unnest
      -- at pixel grain tripled the heaviest stage); the frame axis is
      -- unpivoted later at CELL grain, 72 rows per animation
      vals AS (
        SELECT doc_id, w, h, x, y,
               (x*a + y*b + c) % 256 AS v0,
               CASE WHEN x >= l AND x < l + w // 2 AND
                         y >= t AND y < t + h // 2 AND
                         ((x - l) + (y - t) + doc_id) % 3 <> 0
                    THEN ((x - l)*3 + (y - t)*5 + doc_id % 255) % 255
                    ELSE (x*a + y*b + c) % 256 END AS v1,
               (x*2 + y*7 + (c*3) % 256) % 256 AS v2
        FROM xys),
      cgrid AS (
        SELECT doc_id,
               ((8*(y+1)-1) // h) * 9 + (9*(x+1)-1) // w AS j,
               CAST(SUM(v0) // COUNT(*) AS BIGINT) AS p0,
               CAST(SUM(v1) // COUNT(*) AS BIGINT) AS p1,
               CAST(SUM(v2) // COUNT(*) AS BIGINT) AS p2
        FROM vals GROUP BY doc_id, j),
      cells AS MATERIALIZED (
        SELECT doc_id, f,  j,
               CASE f WHEN 0 THEN p0 WHEN 1 THEN p1 ELSE p2 END AS p
        FROM cgrid CROSS JOIN
          (SELECT CAST(unnest(range(0, 3)) AS BIGINT) AS f)),
      cat AS MATERIALIZED (
        SELECT doc_id AS anim_id, f, j, p FROM cells
        UNION ALL
        SELECT doc_id + 10000000, f, j, p FROM cells WHERE doc_id % 5 = 0),
      bitv AS (
        SELECT a.anim_id, a.f, a.j // 9 * 8 + a.j % 9 AS bit,
               CASE WHEN b.p > a.p THEN 1 ELSE 0 END AS v
        FROM cat a JOIN cat b
          ON a.anim_id = b.anim_id AND a.f = b.f AND b.j = a.j + 1
        WHERE a.j % 9 < 8),
      seqbit AS (
        SELECT anim_id, bit,
               CASE WHEN 2 * SUM(v) > COUNT(*) THEN 1 ELSE 0 END AS v
        FROM bitv GROUP BY anim_id, bit),
      sig AS MATERIALIZED (
        SELECT anim_id,
               CAST(SUM(CASE WHEN bit // 16 = 0
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b0,
               CAST(SUM(CASE WHEN bit // 16 = 1
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b1,
               CAST(SUM(CASE WHEN bit // 16 = 2
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b2,
               CAST(SUM(CASE WHEN bit // 16 = 3
                 THEN v * (1::BIGINT << CAST(bit % 16 AS INT)) ELSE 0 END)
                 AS BIGINT) AS b3
        FROM seqbit GROUP BY anim_id),
      bands AS MATERIALIZED (
        SELECT anim_id, unnest([b0, b1, b2, b3]) AS bv,
               generate_subscripts([b0, b1, b2, b3], 1) AS band
        FROM sig),
      ok AS (SELECT band, bv FROM bands GROUP BY band, bv
             HAVING COUNT(*) > 1 AND COUNT(*) <= 256),
      bnd AS MATERIALIZED (
        SELECT bands.* FROM bands JOIN ok USING (band, bv)),
      cand AS (
        SELECT DISTINCT x.anim_id AS da, y.anim_id AS db
        FROM bnd x JOIN bnd y
          ON x.band = y.band AND x.bv = y.bv AND x.anim_id < y.anim_id),
      ham AS (
        SELECT da, db,
               CAST(bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
                  + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
                 AS BIGINT) AS hamming
        FROM cand
        JOIN sig sa ON sa.anim_id = da
        JOIN sig sb ON sb.anim_id = db)
      SELECT da, db, hamming FROM ham WHERE hamming <= 3 ORDER BY da, db""")
  )

  val all: Seq[Q] =
    Seq(q50, q51, q70, q126, q150, q173, q174, q177, q183, q184, q185, q186)
}
