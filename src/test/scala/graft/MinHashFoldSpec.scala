package graft

import graft.functions.{ArrayLongFold, MinHashFold}
import org.apache.spark.sql.functions._

import scala.util.Random

/** The fused minhash fold must be value-identical to the composition it
  * replaces (project array of permuted hashes → element-wise min fold) —
  * the q22 oracle checks the end result, this pins the equivalence at the
  * operator level on adversarial inputs. */
class MinHashFoldSpec extends SparkSpec {

  test("fused fold ≡ array projection + arrayMinAgg on random (lo, hi) pairs") {
    import spark.implicits._
    val k = 16
    val p = 2305843009213693951L // 2^61 - 1, the q22 modulus
    val rnd = new Random(3)
    def mask29(x: Long) = (x & ((1L << 29) - 1)) | 1L
    val a = IndexedSeq.fill(k)(mask29(rnd.nextLong()))
    val b = IndexedSeq.fill(k)(mask29(rnd.nextLong()))
    val c = IndexedSeq.fill(k)(rnd.nextLong() & ((1L << 29) - 1))

    // 32-bit halves like md5_halves produces; include edge values
    val rows = (0 until 3000).map { i =>
      (i % 7L, rnd.nextInt().toLong & 0xFFFFFFFFL, rnd.nextInt().toLong & 0xFFFFFFFFL)
    } ++ Seq((7L, 0L, 0L), (7L, 0xFFFFFFFFL, 0xFFFFFFFFL))
    val df = rows.toDF("g", "lo", "hi").repartition(11) // force partial merges

    val fused = df.groupBy($"g")
      .agg(MinHashFold.minhashFold($"lo", $"hi", a, b, c, p).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

    val composed = df
      .select($"g", array((0 until k).map(i =>
        (lit(a(i)) * $"lo" + lit(b(i)) * $"hi" + lit(c(i))) % p): _*).as("hs"))
      .groupBy($"g").agg(ArrayLongFold.arrayMinAgg($"hs").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

    assert(fused == composed)
    assert(fused.nonEmpty && fused.head._2.length == k)
  }

  test("multipliers beyond the 29-bit overflow bound fail analysis, not silently wrap") {
    import spark.implicits._
    val df = Seq((1L, 2L, 3L)).toDF("g", "lo", "hi")
    val wide = IndexedSeq(1L << 30) // a·lo could wrap negative with 32-bit halves
    val ok = IndexedSeq(5L)
    val ex = intercept[Exception] {
      df.groupBy($"g")
        .agg(MinHashFold.minhashFold($"lo", $"hi", wide, ok, ok, 97L).as("sig"))
        .collect()
    }
    assert(ex.getMessage.contains("overflow-free"))
  }

  test("fused simhash votes ≡ array projection + arraySumAgg") {
    import spark.implicits._
    val rnd = new Random(9)
    val rows = (0 until 2000).map { i =>
      (i % 5L, rnd.nextInt().toLong & 0xFFFFFFFFL, rnd.nextInt().toLong & 0xFFFFFFFFL)
    } ++ Seq((5L, 0L, 0xFFFFFFFFL))
    val df = rows.toDF("g", "lo", "hi").repartition(7)

    val fused = df.groupBy($"g")
      .agg(graft.functions.SimHashFold.simhashFold($"lo", $"hi").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

    val composed = df
      .select($"g", array((0 until 64).map { b =>
        val src = if (b < 32) $"lo" else $"hi"
        when(src.bitwiseAND(lit(1L << (b % 32))) =!= 0L, 1L).otherwise(-1L)
      }: _*).as("votes"))
      .groupBy($"g").agg(ArrayLongFold.arraySumAgg($"votes").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

    assert(fused == composed)
    assert(fused(5L).take(32).forall(_ == -1L) && fused(5L).drop(32).forall(_ == 1L))
  }
}
