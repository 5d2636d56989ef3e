package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned (bucketed) range join — the standard rewrite that turns an
  * interval-containment join (`point BETWEEN lo AND hi`, no equi key) from
  * a nested-loop / broadcast-nested-loop plan into an ordinary shuffle hash
  * join, the optimization Spark itself does not apply automatically.
  *
  * Both sides are keyed by a bucket of width `binWidth`: a point belongs to
  * exactly one bucket; an interval is exploded into one row per bucket it
  * overlaps (`floor(lo/w) .. floor(hi/w)` — at most 2 rows when the span is
  * ≤ `binWidth`, the intended sizing; wider spans stay CORRECT, they just
  * replicate into more buckets). The equi-join on the bucket sees every
  * (point, interval) pair whose containment could hold — if `lo ≤ p ≤ hi`
  * then `bucket(lo) ≤ bucket(p) ≤ bucket(hi)` by monotonicity of floor
  * division — and the residual BETWEEN predicate filters exactly. No pair
  * can appear twice: a point lives in exactly one bucket and an interval
  * appears once per bucket.
  *
  * Scale: shuffle volume is |points| + Σ buckets-per-interval keyed rows
  * (≈ 2|intervals| at the intended sizing), both exchanges hash-partition
  * on the bucket, and AQE sizes / skew-splits them like any equi-join —
  * versus a nested loop that streams every point past every interval.
  * Bucket indices use floor division spelled `(c - pmod(c, w)) div w`:
  * the numerator is an exact multiple of `w`, so the truncating `div`
  * equals floor for negative values too — all in codegen, no UDF.
  */
object RangeJoin {

  /** Join `points` (containing long column `pointCol`) to `intervals`
    * (containing long columns `loCol`/`hiCol`, `lo ≤ hi`) on
    * `point BETWEEN lo AND hi`. Column sets of the two frames must be
    * disjoint (standard join-ambiguity rule); `binWidth` should be ≥ the
    * typical interval span (correct for any span, ≤2× replication when
    * honored). Returns all columns of both frames per matching pair. */
  def binned(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def withBucket(df: DataFrame, src: Column, out: String): DataFrame =
      df.withColumn("__m", src - pmod(src, lit(binWidth)))
        .withColumn(out, expr(s"__m div ${binWidth}L"))
        .drop("__m")
    val p = withBucket(points, col(pointCol), "__bucket")
    val i = withBucket(withBucket(intervals, col(loCol), "__blo"),
      col(hiCol), "__bhi")
      .withColumn("__bucket", explode(sequence(col("__blo"), col("__bhi"))))
      .drop("__blo", "__bhi")
    p.join(i, "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
