package graft

/** Every declared query runs against sf0.001 and the flagship entry is
  * non-empty. (Value correctness is the DuckDB oracle's job — driven by
  * Verify + tools/check_oracle.py; this guards plan validity in CI.) */
class QueriesSmokeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val df = fn(spark, sf)
      assert(df.count() >= 0)
    }
  }
}
