package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming image perceptual-hash near-dup — the continuous form of
  * q173's batch Hamming-bucket join, and the multimodal member of the
  * [[StreamingNearDup]] family: images arrive as a stream already decoded
  * to their 64-bit dHash (4 × 16-bit bands, see
  * `Multimodal.MediaCodec.dhashBands` — payload bytes never enter the
  * stream, only 8-byte signatures), each exploded upstream into its 4
  * band keys; state per band bucket holds the signatures seen in that
  * bucket so far (first `cap` arrivals), and every arrival probes its
  * bucket BEFORE joining it.
  * A near-dup (Hamming ≤ `maxHamming`) is emitted when the LATER image
  * arrives — the ingest-time question ("is today's image a re-encode of
  * anything ingested before?") that no windowed aggregation can express,
  * because dedup state is permanent.
  *
  * Completeness mirrors the batch operator's pigeonhole: Hamming ≤ 3 over
  * 64 bits forces at least one of the 4 bands equal, so probing the 4
  * band buckets sees every qualifying prior image — up to the bucket
  * cap, whose degenerate-bucket semantics intentionally DIVERGE from
  * the batch join's: q173 drops an over-cap bucket ENTIRELY (its
  * `bsz <= 256` filter yields no pairs there), while the stream keeps
  * probing against the first `cap` signatures held (keep-first-cap vs
  * drop-whole-bucket), so on a degenerate bucket the stream still
  * reports dups against its earliest members where the batch reports
  * none. Emission is exactly once per (band,
  * pair); a pair within radius in SEVERAL bands emits once per colliding
  * band — downstream takes the per-pair min/distinct exactly as q173's
  * batch join distincts its band hits. Within a micro-batch, arrivals are
  * processed in img_id order (iterator order is not deterministic;
  * sorting makes the stream replay-identical).
  *
  * Scale/state bounds, the family discipline:
  *  - state per bucket is ≤ `cap` (img_id, 4×int16) entries (~24 bytes
  *    each) — an over-full bucket keeps PROBING but stops GROWING (a
  *    degenerate hash — solid borders, test cards — must not accumulate
  *    unbounded state or emit O(n²) pairs);
  *  - the shuffle carries (band, value) keys and 8-byte signatures,
  *    never image payloads;
  *  - state lives in the configured state store (RocksDB in production)
  *    keyed by band bucket — the corpus fingerprint index IS the
  *    streaming state.
  */
object StreamingPhashDedup {

  /** One input row per (image, band): `bv` = this band's 16-bit value,
    * `b0..b3` = the full signature (shared across the image's bands). */
  final case class BandedImage(
      img_id: Long, band: Int, bv: Int, b0: Int, b1: Int, b2: Int, b3: Int)

  /** `img_new` arrived after `img_old`; Hamming distance over 64 bits. */
  final case class PhashHit(img_new: Long, img_old: Long, band: Int, hamming: Int)

  /** State wire format: public so the encoder's generated code can
    * construct it (a `private` nested case class fails janino compile). */
  final case class StoredSig(img_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)
  final case class SigBucket(sigs: Seq[StoredSig])

  /** Band-explode a decoded image's dHash bands for [[probe]]. */
  def banded(imgId: Long, bands: Array[Int]): Seq[BandedImage] =
    (0 until 4).map(b =>
      BandedImage(imgId, b, bands(b), bands(0), bands(1), bands(2), bands(3)))

  def probe(
      imgs: Dataset[BandedImage],
      cap: Int = 256,
      maxHamming: Int = 3): Dataset[PhashHit] = {
    implicit val stateEnc = Encoders.product[SigBucket]
    implicit val outEnc = Encoders.product[PhashHit]
    imgs
      .groupByKey(d => (d.band, d.bv))(Encoders.product[(Int, Int)])
      .flatMapGroupsWithState[SigBucket, PhashHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Int, Int), batch: Iterator[BandedImage], state: GroupState[SigBucket]) =>
          var held: Seq[StoredSig] = state.getOption.map(_.sigs).getOrElse(Nil)
          val out = List.newBuilder[PhashHit]
          batch.toSeq.sortBy(_.img_id).foreach { d =>
            held.foreach { o =>
              val h = Integer.bitCount(o.b0 ^ d.b0) +
                Integer.bitCount(o.b1 ^ d.b1) +
                Integer.bitCount(o.b2 ^ d.b2) +
                Integer.bitCount(o.b3 ^ d.b3)
              if (h <= maxHamming) out += PhashHit(d.img_id, o.img_id, key._1, h)
            }
            if (held.lengthCompare(cap) < 0)
              held = held :+ StoredSig(d.img_id, d.b0, d.b1, d.b2, d.b3)
          }
          state.update(SigBucket(held))
          out.result().iterator
      }
  }
}
