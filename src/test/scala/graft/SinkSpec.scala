package graft

import org.apache.spark.sql.functions._

/** Sinks (SURVEY.md §2B row): partitioned parquet writes and the partition
  * pruning they buy on re-read — the layout decision that turns a 100 TB
  * scan into a single-partition read for selective predicates. */
class SinkSpec extends SparkSpec {

  test("training shards: q69 output written partitioned, sorted, size-capped") {
    // The last mile of the recipe: packed sequences land on disk as the
    // shards a trainer reads — one directory per packer stream (partition
    // pruning per data-loader rank), rows sorted by bin inside each file
    // (sequential reads assemble whole training sequences), file sizes
    // capped (maxRecordsPerFile is the knob that keeps 100 TB outputs in
    // object-store-friendly chunks).
    import graft.queries.PipelineQueries
    val out = tmpDir("shards").resolve("packed").toString
    val packed = PipelineQueries.q69.spark(spark, "/root/testdata/sf0.001")
    packed
      .repartition(col("worker"))
      .sortWithinPartitions("bin", "doc_id")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 20)
      .partitionBy("worker")
      .parquet(out)

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
    assert(dirs.nonEmpty && dirs.forall(_.getName.startsWith("worker=")))
    // size cap respected in every shard
    dirs.foreach { d =>
      d.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        val n = spark.read.parquet(f.getAbsolutePath).count()
        assert(n <= 20, s"${f.getName} has $n rows")
      }
    }
    // rows inside each file are bin-sorted (sequential assembly order)
    dirs.foreach { d =>
      d.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        val bins = spark.read.parquet(f.getAbsolutePath)
          .select("bin").collect().map(_.getLong(0))
        assert(bins.sameElements(bins.sorted), s"${f.getName} not bin-sorted")
      }
    }
    // nothing lost or duplicated on the way to disk
    assert(spark.read.parquet(out).count() == packed.count())
  }

  test("schema evolution: old and new shards merge on read, old rows null-fill") {
    // A 100 TB dataset outlives its schema: shards written last year lack
    // columns added since. mergeSchema reads both generations as one
    // table — new columns null-fill on old shards, so downstream plans
    // need no per-generation branching.
    import spark.implicits._
    val out = tmpDir("evolve").resolve("docs").toString
    Seq((1L, "alpha")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$out/gen=0")
    Seq((2L, "beta", "en")).toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(s"$out/gen=1")
    val merged = spark.read.option("mergeSchema", "true").parquet(out)
      .orderBy("doc_id").collect()
    assert(merged.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val langIdx = 2
    assert(merged(0).isNullAt(langIdx)) // old shard null-fills the new column
    assert(merged(1).getString(langIdx) == "en")
  }

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
