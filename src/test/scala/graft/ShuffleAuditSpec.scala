package graft

/** Machine-check of PLANS.md's "digests shuffle, documents don't" claim
  * (VERDICT r6 #4): run each flagship dedup query under a SparkListener
  * and assert the average shuffled record stays digest-sized. The
  * `documents.text` column averages ~300 bytes at this SF — any plan
  * that leaks text into an exchange blows the per-record ceiling. */
class ShuffleAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Digest-grain exchange ceiling: 64-bit digests + ids + UnsafeRow
    * framing land well under 100 B/record; a ~300-byte text payload in
    * any exchanged row triples it. */
  private val MaxBytesPerRecord = 128.0

  /** Capped-window exchange ceiling for the suffix-array family: the
    * one text-bearing exchange carries ≤31-word windows (short synthetic
    * words at this SF), never whole documents (~300 B average text). */
  private val MaxBytesPerWindowRecord = 512.0

  Audit.DigestShuffleQueries.foreach { name =>
    test(s"$name shuffles digest-grain records, never document text") {
      val fn = SparkEntry.queries(name)
      val (bytes, records) = Audit.measureShuffle(spark) {
        fn(spark, sf).write.format("noop").mode("overwrite").save()
      }
      assert(records > 0, "expected at least one exchange to meter")
      val perRec = bytes.toDouble / records
      info(f"$name: $bytes bytes / $records records = $perRec%.1f B/rec")
      assert(perRec <= MaxBytesPerRecord,
        f"avg shuffled record $perRec%.1f B exceeds the digest-grain " +
          f"ceiling $MaxBytesPerRecord%.0f B — a text column reached an exchange?")
    }
  }

  Audit.CappedWindowQueries.foreach { name =>
    test(s"$name exchanges at most capped 31-word windows, never documents") {
      val fn = SparkEntry.queries(name)
      val (bytes, records) = Audit.measureShuffle(spark) {
        fn(spark, sf).write.format("noop").mode("overwrite").save()
      }
      assert(records > 0, "expected at least one exchange to meter")
      val perRec = bytes.toDouble / records
      info(f"$name: $bytes bytes / $records records = $perRec%.1f B/rec")
      assert(perRec <= MaxBytesPerWindowRecord,
        f"avg shuffled record $perRec%.1f B exceeds the window-grain " +
          f"ceiling $MaxBytesPerWindowRecord%.0f B — whole documents " +
          "reached an exchange?")
    }
  }
}
