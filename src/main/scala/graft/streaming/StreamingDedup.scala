package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming incremental exact-dedup — the continuous form of q20's batch
  * hash-groupBy dedup (a training-data pipeline ingests documents as a
  * stream; dedup state must persist ACROSS micro-batches, which windowed
  * aggregation can't express — this is precisely the
  * `flatMapGroupsWithState` niche from the Structured Streaming guide).
  *
  * Semantics: group by content hash; per key, the FIRST batch that carries
  * the key emits one survivor (the smallest doc_id inside that batch — a
  * deterministic tiebreak; micro-batch iterator order is not), every later
  * batch emits nothing. State per key is one boolean, so the state store
  * grows with DISTINCT content, not stream length — the same "shuffle
  * carries hashes, not documents" scale shape as q20.
  *
  * State is kept with no timeout: content-hash dedup state is permanent by
  * nature (a duplicate a year later is still a duplicate). At 100 TB the
  * state store backend (RocksDB in production) holds it off-heap; callers
  * that want bounded state can re-key by (hash, time bucket) upstream.
  */
object StreamingDedup {

  /** Input: a document id + its content hash (compute the hash upstream
    * with `md5(text)` — only the 40-byte pair ever reaches the shuffle). */
  final case class HashedDoc(doc_id: Long, h: String)

  /** Output: one row per distinct content hash, emitted exactly once. */
  final case class Survivor(h: String, doc_id: Long, n_in_first_batch: Long)

  def firstSeen(docs: Dataset[HashedDoc]): Dataset[Survivor] = {
    implicit val stateEnc = Encoders.scalaBoolean
    implicit val outEnc = Encoders.product[Survivor]
    docs
      .groupByKey(_.h)(Encoders.STRING)
      .flatMapGroupsWithState[Boolean, Survivor](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (h: String, batch: Iterator[HashedDoc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty // key already emitted — suppress
          else {
            state.update(true)
            var minId = Long.MaxValue
            var n = 0L
            batch.foreach { d => n += 1; if (d.doc_id < minId) minId = d.doc_id }
            Iterator.single(Survivor(h, minId, n))
          }
      }
  }
}
