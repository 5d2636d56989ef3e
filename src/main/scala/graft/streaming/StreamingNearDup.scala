package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash-LSH near-duplicate detection — the continuous form of
  * q82's incremental batch-vs-corpus dedup: documents arrive as a stream,
  * each exploded upstream into its LSH band keys with its full MinHash
  * signature riding along; state per band bucket holds the signatures seen
  * in that bucket so far, and every arrival probes its bucket BEFORE
  * joining it. A pair is emitted when the later document arrives — the
  * ingest-time shape a production pipeline needs ("is today's document a
  * near-dup of ANYTHING ingested before?"), which no windowed aggregation
  * can express because dedup state is permanent.
  *
  * Emission contract: exactly once per (band, pair) — the older doc sits
  * in state when the newer one probes, and a probe never re-runs. A pair
  * colliding in SEVERAL bands emits once per colliding band (bands are
  * independent keys, possibly on different executors); downstream
  * consumers take the per-pair max/distinct exactly as q22's batch LSH
  * distincts its band hits. Within a micro-batch, arrivals are processed
  * in doc_id order (iterator order is not deterministic; sorting makes
  * the stream replay-identical).
  *
  * Scale/state bounds, mirroring the batch family's discipline:
  *  - state per bucket is ≤ `cap` (doc_id, 64-long signature) entries
  *    (~528 bytes each) — an over-full bucket keeps PROBING but stops
  *    GROWING (q82's corpus-side cap: a degenerate bucket — boilerplate
  *    shingles — must not accumulate unbounded state or emit O(n²)
  *    pairs);
  *  - the shuffle carries (band, hash) keys and signatures, never
  *    documents;
  *  - state lives in the configured state store (RocksDB in production)
  *    keyed by band bucket, so the corpus signature index IS the
  *    streaming state — no external lookup service.
  */
object StreamingNearDup {

  /** One input row per (document, band): `bh` = the band's bucket hash,
    * `sig` = the full signature (shared across the doc's bands). */
  final case class BandedDoc(doc_id: Long, band: Int, bh: Long, sig: Seq[Long])

  /** `doc_new` arrived after `doc_old`; `matches` of the 64 signature
    * positions agree (estimated Jaccard = matches/64). */
  final case class NearDupHit(doc_new: Long, doc_old: Long, band: Int, matches: Int)

  /** State wire format: public so the encoder's generated code can
    * construct it (a `private` nested case class fails janino compile). */
  final case class Stored(doc_id: Long, sig: Seq[Long])
  final case class Bucket(docs: Seq[Stored])

  def probe(docs: Dataset[BandedDoc], cap: Int = 16, minMatches: Int = 32): Dataset[NearDupHit] = {
    implicit val stateEnc = Encoders.product[Bucket]
    implicit val outEnc = Encoders.product[NearDupHit]
    docs
      .groupByKey(d => (d.band, d.bh))(Encoders.product[(Int, Long)])
      .flatMapGroupsWithState[Bucket, NearDupHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Int, Long), batch: Iterator[BandedDoc], state: GroupState[Bucket]) =>
          var held: Seq[Stored] = state.getOption.map(_.docs).getOrElse(Nil)
          val out = List.newBuilder[NearDupHit]
          batch.toSeq.sortBy(_.doc_id).foreach { d =>
            held.foreach { old =>
              var m = 0
              val n = math.min(old.sig.length, d.sig.length)
              var i = 0
              while (i < n) {
                if (old.sig(i) == d.sig(i)) m += 1
                i += 1
              }
              if (m >= minMatches) out += NearDupHit(d.doc_id, old.doc_id, key._1, m)
            }
            if (held.lengthCompare(cap) < 0) held = held :+ Stored(d.doc_id, d.sig)
          }
          state.update(Bucket(held))
          out.result().iterator
      }
  }
}
