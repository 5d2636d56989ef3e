package graft

import graft.functions.MisraGries
import org.apache.spark.sql.functions._

import scala.util.Random

class MisraGriesSpec extends SparkSpec {

  test("guarantee: every token with count > N/(m+1) survives eviction") {
    import spark.implicits._
    // vocabulary (8000 distinct fillers) >> capacity (10): heavy eviction.
    // hot appears 3000/11000 times > N/11, so it MUST be in the summary.
    val rnd = new Random(11)
    val shuffler = new Random(5)
    val toks = shuffler.shuffle(
      (Seq.fill(3000)("hot") ++ (0 until 8000).map(i => s"filler_${i}_${rnd.nextInt()}"))
        .toVector)
    val df = toks.toDF("token").repartition(17) // partial sketches must merge
    val cand = df.agg(MisraGries.misraGries($"token", 10).as("c"))
      .select(explode($"c").as("token"))
      .collect().map(_.getString(0)).toSet
    assert(cand.contains("hot"), s"guarantee violated: $cand")
    assert(cand.size <= 10, s"capacity exceeded: ${cand.size}")
  }

  test("output is deterministic across partitionings for non-evictable vocab") {
    import spark.implicits._
    // distinct tokens < m: the sketch holds the full vocabulary exactly,
    // so membership is partitioning-independent (counts never exposed)
    val toks = (0 until 2000).map(i => s"w${i % 12}")
    def run(parts: Int) =
      toks.toDF("token").repartition(parts)
        .agg(MisraGries.misraGries($"token", 30).as("c"))
        .select(explode($"c").as("t")).collect().map(_.getString(0)).toSeq
    assert(run(1) == run(7) && run(7) == run(32))
    assert(run(1).sorted == run(1)) // eval sorts
  }

  test("q75 two-pass result equals the exact GROUP BY heavy hitters") {
    import spark.implicits._
    // mixed skew: 3 heavy tokens above N/31, long uniform tail below
    val toks = Seq.fill(400)("alpha") ++ Seq.fill(380)("beta") ++
      Seq.fill(370)("gamma") ++ (0 until 2000).map(i => s"tail${i % 200}")
    val df = toks.toDF("token").repartition(9)
    val n = toks.length.toLong

    val cands = df.agg(MisraGries.misraGries($"token", 30).as("c"))
      .select(explode($"c").as("token"))
    val twoPass = df.join(cands, "token")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .filter($"n" * 31 > n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    val exact = df.groupBy("token").agg(count(lit(1)).as("n"))
      .filter($"n" * 31 > n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    assert(twoPass == exact, s"two-pass=$twoPass exact=$exact")
    assert(exact.map(_._1) == Set("alpha", "beta", "gamma"))
  }
}
