package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming count-min sketch — the continuous form of q63's batch sketch,
  * and the demonstration that a mergeable sketch IS streaming state: the
  * per-key update (`counter += n`) is the same operation partial
  * aggregation applies map-side in the batch plan, so batch and stream
  * converge to identical counters over the same data (the spec asserts
  * this equality, not a tolerance).
  *
  * Sharding: state is keyed by (row, bucket) — at most depth × width keys
  * (4 × 1024 here) regardless of stream length or vocabulary, each holding
  * one Long. That is the whole point of sketch-shaped streaming state at
  * 100 TB: a per-token `flatMapGroupsWithState` would grow the state store
  * with the vocabulary, while the sketch's store is FIXED-SIZE and the
  * shuffle is bounded by distinct (row, bucket) pairs per micro-batch.
  * Estimates stay one-sided (>= truth) exactly as in the batch sketch.
  *
  * Emission: Update-mode — every micro-batch emits the new value of each
  * TOUCHED counter; downstream readers keep the latest value per cell
  * (the spec folds the update stream that way before comparing to batch).
  */
object StreamingCountMin {

  /** One pre-bucketed token occurrence: sketch row r, bucket, weight n.
    * Bucketing happens upstream with the same md5-derived family as q63 —
    * the stream shuffles (int, long, long) triples, never tokens. */
  final case class CellInc(r: Int, bucket: Long, n: Long)

  /** Current value of one sketch cell after a micro-batch. */
  final case class CellValue(r: Int, bucket: Long, cnt: Long)

  def counters(incs: Dataset[CellInc]): Dataset[CellValue] = {
    implicit val stateEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[CellValue]
    incs
      .groupByKey(c => (c.r, c.bucket))(Encoders.product[(Int, Long)])
      .flatMapGroupsWithState[Long, CellValue](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: (Int, Long), batch: Iterator[CellInc], state: GroupState[Long]) =>
          val add = batch.map(_.n).sum
          val total = state.getOption.getOrElse(0L) + add
          state.update(total)
          Iterator.single(CellValue(key._1, key._2, total))
      }
  }
}
