package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Stream-stream interval join — the continuous form of q81's batch
  * click→purchase attribution: every click is enriched with the purchases
  * the same user makes within the attribution window after it. This is the
  * one Structured Streaming join class the suite hadn't covered: BOTH
  * sides are unbounded, so Spark must buffer each side's recent rows in
  * the state store and emit matches as either side arrives.
  *
  * Scale/state story: the watermark on both sides plus the two-sided time
  * bound in the join condition is exactly what lets Spark garbage-collect
  * state — a buffered click can be dropped once the purchase-side
  * watermark passes `c_ts + window` (no future purchase can match it), and
  * a buffered purchase once the click-side watermark passes `p_ts`. State
  * is therefore bounded by (window + delay) of stream volume per side,
  * NOT by stream length; without the time bound Spark would buffer both
  * streams forever. Left-outer results for unmatched clicks emit only
  * after that same watermark expiry proves no match can still arrive.
  *
  * Column contract: clicks carry (user_id, c_event_id, c_ts), purchases
  * (p_user_id, p_event_id, p_ts, value) — distinct names keep the join
  * condition unambiguous without aliases on streaming Datasets.
  */
object StreamingIntervalJoin {

  def enrich(
      clicks: DataFrame,
      purchases: DataFrame,
      window: String = "30 minutes",
      delay: String = "10 minutes",
      joinType: String = "inner"): DataFrame =
    clicks
      .withWatermark("c_ts", delay)
      .join(
        purchases.withWatermark("p_ts", delay),
        expr(
          s"user_id = p_user_id AND p_ts >= c_ts AND " +
            s"p_ts <= c_ts + INTERVAL $window"),
        joinType)
}
