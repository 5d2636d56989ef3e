package graft

import graft.functions.{TopKByKey, TopKHeap}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

class TopKAggSpec extends SparkSpec {

  test("TopKHeap keeps the k best (key DESC, tie ASC) pairs") {
    val h = new TopKHeap(3)
    Seq((5.0, 1L), (1.0, 2L), (9.0, 3L), (5.0, 0L), (2.0, 4L))
      .foreach { case (k, t) => h.insert(k, t) }
    val got = h.sortedIndices.map(i => (h.keys(i), h.ties(i))).toSeq
    // 9.0 best; the 5.0 tie breaks toward the LOWER tie id
    assert(got == Seq((9.0, 3L), (5.0, 0L), (5.0, 1L)))
  }

  test("NaN keys follow Spark's total order (greatest) and never wedge the heap") {
    val h = new TopKHeap(2)
    h.insert(Double.NaN, 5L)
    h.insert(1.0, 1L)   // must displace nothing (NaN is greatest) but insert fine
    h.insert(2.0, 2L)   // must displace 1.0, not be blocked by the NaN root
    val got = h.sortedIndices.map(i => (h.keys(i), h.ties(i))).toSeq
    assert(java.lang.Double.isNaN(got.head._1) && got.head._2 == 5L)
    assert(got(1) == ((2.0, 2L)), got.toString)
  }

  test("fromBytes rejects state written with a larger k (incompatible restart)") {
    val big = new TopKHeap(5)
    (1 to 5).foreach(i => big.insert(i.toDouble, i.toLong))
    val e = intercept[IllegalArgumentException] {
      TopKHeap.fromBytes(3, big.toBytes)
    }
    assert(e.getMessage.contains("capacity 3"), e.getMessage)
  }

  test("topk_by_key matches the window row_number composition on random data") {
    import spark.implicits._
    val rnd = new Random(7)
    // many groups, duplicate keys within groups, unique tie ids
    val rows = (0 until 5000).map { i =>
      (rnd.nextInt(40).toLong, math.floor(rnd.nextDouble() * 20) / 2.0, i.toLong)
    }
    // spread over partitions so partial heaps really merge across splits
    val df = rows.toDF("g", "key", "id").repartition(13)

    val viaAgg = df.groupBy($"g")
      .agg(TopKByKey.topkByKey($"key", $"id", 5).as("tk"))
      .select($"g", posexplode($"tk"))
      .select($"g", ($"pos" + 1).as("rk"), $"col.key", $"col.tie".as("id"))

    val w = Window.partitionBy($"g").orderBy($"key".desc, $"id")
    val viaWindow = df.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .select($"g", $"rk".cast("long").as("rk"), $"key", $"id")

    assert(viaAgg.collect().toSet == viaWindow.collect().toSet)
  }

  test("topk_by_key with k larger than the group returns the whole group") {
    import spark.implicits._
    val df = Seq((1L, 3.0, 10L), (1L, 1.0, 11L)).toDF("g", "key", "id")
    val out = df.groupBy($"g")
      .agg(TopKByKey.topkByKey($"key", $"id", 8).as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.key", $"e.tie")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(out == Seq((3.0, 10L), (1.0, 11L)))
  }

  test("topk_by_key skips null keys") {
    import spark.implicits._
    val df = Seq((1L, Some(3.0), 10L), (1L, None, 11L), (1L, Some(4.0), 12L))
      .toDF("g", "key", "id")
    val out = df.groupBy($"g")
      .agg(TopKByKey.topkByKey($"key", $"id", 2).as("tk"))
      .select(explode($"tk").as("e")).select($"e.tie")
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(12L, 10L))
  }

  test("q73 plan: ObjectHashAggregate partial+final, no Window, no full-row sort before agg") {
    val q = graft.queries.ScaleQueries.q73
    val plan = q.spark(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // partial (map-side) + final aggregate: bounded heaps cross the
    // exchange, never the full orders rows
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
  }
}
