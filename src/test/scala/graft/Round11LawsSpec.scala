package graft

import graft.functions.FixedPointDot
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Round-11 regression laws for this round's semantic changes:
  *
  *  - the q94 gated-verify kernel ([[FixedPointDot.dotGated]]) must be
  *    SOUND: whenever it returns the Pruned sentinel, the exact
  *    fixed-point cosine is provably below the threshold — so the gate
  *    can never change q94's output (BallCoverSpec pins this end to end
  *    against q42; this law pins the kernel itself over randomized
  *    vectors, including the adversarial near-threshold band);
  *  - whenever the gate admits, the returned value must equal the exact
  *    ungated dot bit for bit (survivors run the identical arithmetic);
  *  - q175's drop-all contract: a document composed ENTIRELY of
  *    boilerplate lines must come back with empty clean_text and
  *    tokens_kept = 0 — no keep-first survivor (the q101 semantics this
  *    operator deliberately does not share).
  */
class Round11LawsSpec extends SparkSpec {

  private def arr(xs: Array[Float]): GenericArrayData =
    new GenericArrayData(xs.map(x => x: Any))

  test("q94 gate law: Pruned ⇒ exact cosine < t; admitted ⇒ exact dot, bit for bit") {
    val t = 0.4
    val dim = 64
    val pd = 48
    val rnd = new scala.util.Random(11)
    var pruned = 0
    var admitted = 0
    (0 until 5000).foreach { i =>
      // mix isotropic pairs with correlated pairs that hug the
      // threshold (b = a + noise), so both gate branches get traffic
      val a = Array.fill(dim)((rnd.nextFloat() - 0.5f) * 2f)
      val b =
        if (i % 3 == 0) Array.fill(dim)((rnd.nextFloat() - 0.5f) * 2f)
        else a.map(x => x + (rnd.nextFloat() - 0.5f) * (0.2f + (i % 17) * 0.1f))
      val aa = arr(a); val bb = arr(b)
      val selfA = FixedPointDot.dot(aa, aa)
      val selfB = FixedPointDot.dot(bb, bb)
      val preA = FixedPointDot.dotN(aa, aa, pd)
      val preB = FixedPointDot.dotN(bb, bb, pd)
      val na = math.sqrt(selfA / 1e15); val nb = math.sqrt(selfB / 1e15)
      val nsa = math.sqrt((selfA - preA) / 1e15 + 1e-13)
      val nsb = math.sqrt((selfB - preB) / 1e15 + 1e-13)
      val cut = ((t - 1e-9) * na * nb - nsa * nsb) * 1e15
      val gated = FixedPointDot.dotGated(aa, bb, cut, pd)
      val exact = FixedPointDot.dot(aa, bb)
      if (gated == FixedPointDot.Pruned) {
        pruned += 1
        assert(exact / 1e15 / (na * nb) < t,
          s"i=$i: pruned a pair whose exact cosine is ${exact / 1e15 / (na * nb)}")
      } else {
        admitted += 1
        assert(gated == exact, s"i=$i: admitted dot $gated != exact $exact")
      }
    }
    // both branches must actually fire for the law to mean anything
    assert(pruned > 100, s"only $pruned pruned — gate never fired")
    assert(admitted > 100, s"only $admitted admitted — gate fired always")
  }

  test("q175 law: an all-boilerplate document reassembles to empty text") {
    import spark.implicits._
    // three docs sharing every 6-token line; a fourth unique one
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, shared), (2L, shared), (3L, shared),
      (4L, (1 to 12).map(i => s"only$i").mkString(" ")))
      .toDF("doc_id", "text")
    // run the REGISTERED query against a temp table dir, so the law pins
    // the shipped q175 pipeline itself (not an inline replica that could
    // drift from it)
    val dir = java.nio.file.Files.createTempDirectory("q175law").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q175_line_dedup")(spark, dir)
      .select("doc_id", "n_dropped", "tokens_kept", "clean_text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    (1L to 3L).foreach { id =>
      val (dropped, kept, text) = out(id)
      assert(dropped == 2 && kept == 0 && text.isEmpty,
        s"doc $id: dropped=$dropped kept=$kept text='$text' — " +
          "drop-all must leave an all-boilerplate doc empty")
    }
    val (d4, k4, t4) = out(4L)
    assert(d4 == 0 && k4 == 12 && t4.startsWith("only1"), s"doc 4: $d4/$k4/$t4")
  }
}
