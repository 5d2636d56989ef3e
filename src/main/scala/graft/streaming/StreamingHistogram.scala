package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming log-histogram quantiles — the continuous form of q68's batch
  * sketch: per (group, bit-length-bucket) counters accumulated across
  * micro-batches. Like the count-min twin (q63/StreamingCountMin), the
  * histogram is MERGEABLE — the streaming per-key update (`counter += n`)
  * is exactly the map-side partial aggregation of the batch plan, so the
  * stream's final counters equal the batch histogram bit-for-bit, and any
  * quantile read off them (via [[quantileLb]]) matches q68's answer.
  *
  * State: at most `groups × 64` keys (one per bit-length bucket of a
  * 64-bit value), each one Long — fixed-size regardless of stream length
  * or value distribution. Per-micro-batch shuffle is bounded by distinct
  * (group, bucket) pairs, i.e. also ≤ groups × 64 rows.
  *
  * Emission: Update mode — every batch emits the new value of each
  * touched counter; readers keep the latest (= max, counters only grow).
  */
object StreamingHistogram {

  /** One pre-bucketed observation: bucket = bit length of the value
    * (identical to q68's `LENGTH(bin(x))`), weight n. Bucketing happens
    * upstream so the stream shuffles (group, int, long) triples only. */
  final case class BucketInc(group: String, bucket: Long, n: Long)

  /** Current value of one histogram counter after a micro-batch. */
  final case class BucketCount(group: String, bucket: Long, cnt: Long)

  def counters(incs: Dataset[BucketInc]): Dataset[BucketCount] = {
    implicit val stateEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[BucketCount]
    incs
      .groupByKey(b => (b.group, b.bucket))(Encoders.product[(String, Long)])
      .flatMapGroupsWithState[Long, BucketCount](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: (String, Long), batch: Iterator[BucketInc], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + batch.map(_.n).sum
          state.update(total)
          Iterator.single(BucketCount(key._1, key._2, total))
      }
  }

  /** q-quantile lower bound from a final histogram — the same fold q68
    * runs in SQL: smallest bucket whose cumulative count reaches q·n,
    * reported as 2^(bucket−1) (the bucket's smallest member). `pct` is
    * integral (50, 90, 99) so the threshold compare stays in integers. */
  def quantileLb(hist: Map[Long, Long], pct: Long): Long = {
    val n = hist.values.sum
    var cum = 0L
    for (bucket <- hist.keys.toSeq.sorted) {
      cum += hist(bucket)
      if (cum * 100 >= pct * n) return 1L << (bucket - 1).toInt
    }
    0L
  }
}
