package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the pre-partitioning strategy for the
  * repeated big-join workloads a 100 TB pipeline runs daily: bucket both
  * fact tables by the join key at WRITE time, and every subsequent join on
  * that key runs with ZERO shuffle (both sides' partitioning already
  * satisfies the join's distribution requirement).
  */
class BucketingSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables join without any shuffle exchange") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")

    // disable auto-broadcast so the join would OTHERWISE shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val rows = joined.collect()
      assert(rows.map(_.getLong(1)).sum == 6000L) // every lineitem matched

      val plan = joined.queryExecution.executedPlan
      val shufflesBeforeAgg = collectWithSubqueries(plan) {
        case s: ShuffleExchangeExec => s
      }
      // exactly ONE exchange is allowed: the 5-group aggregation;
      // the join itself must run on the bucketed layout without shuffling
      assert(shufflesBeforeAgg.length <= 1,
        s"expected bucketed join to avoid join-side shuffles, got:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
