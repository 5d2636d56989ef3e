package graft

import org.apache.spark.sql.functions._

/** Sinks (SURVEY.md §2B row): partitioned parquet writes and the partition
  * pruning they buy on re-read — the layout decision that turns a 100 TB
  * scan into a single-partition read for selective predicates. */
class SinkSpec extends SparkSpec {

  test("partitionBy write → directory layout → pruned re-read") {
    val out = tmpDir("sink").resolve("orders_by_status").toString
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)

    // layout: one directory per partition value
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"))

    val back = spark.read.parquet(out).filter(col("o_orderstatus") === "F")
    val plan = back.queryExecution.executedPlan.toString
    // the status predicate prunes PARTITIONS (directory-level skip), it is
    // not a row-level parquet filter
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("o_orderstatus"), plan.take(1500))
    val total = orders.filter(col("o_orderstatus") === "F").count()
    assert(back.count() == total)
  }
}
