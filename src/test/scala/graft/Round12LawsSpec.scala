package graft

import graft.functions.SpanDigests
import graft.operators.Multimodal.{Containers, MediaCodec}

/** Round-12 regression laws for the contracts ADVICE.md flagged:
  *
  *  - span_digests' emit contract: q91's window-count-equals-document-count
  *    silently depends on the expression emitting per-document-DISTINCT
  *    (span, d) pairs with 16-hex-char digests. Pin both so a future
  *    relaxation of the emit-side dedup (or a digest-width change) fails a
  *    law instead of corrupting q91 without a schema signal;
  *  - audioBands must fingerprint the LOCATED data chunk, not byte 44: a
  *    non-canonical but spec-legal RIFF layout (extra LIST chunk before
  *    fmt/data, oversized fmt) must produce the identical fingerprint as
  *    the canonical container around the same PCM body.
  */
class Round12LawsSpec extends SparkSpec {

  test("span_digests law: per-row (span, d) distinct, 16 lowercase hex, dyadic spans") {
    import spark.implicits._
    // token arrays WITH heavy internal repetition, so the emit-side dedup
    // has real work to do (an all-distinct fixture would pass vacuously)
    val docs = Seq(
      (1L, Seq.fill(80)("same")),                       // one token repeated
      (2L, (0 until 90).map(i => s"t${i % 3}")),        // period-3 repetition
      (3L, (0 until 70).map(i => s"u$i")),              // all distinct
      (4L, Seq("a", "b", "a", "b", "a", "b", "a", "b")) // period-2, short
    ).toDF("doc_id", "ws")
    val rows = docs
      .select($"doc_id", SpanDigests.span_digests($"ws").as("sd"))
      .collect()
    assert(rows.length == 4)
    var deduped = false
    rows.foreach { r =>
      val sd = r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getLong(0), x.getString(1)))
      // contract 1: distinct per (span, d) within one document's output
      assert(sd.size == sd.distinct.size,
        s"doc ${r.getLong(0)}: span_digests emitted duplicate (span, d) pairs")
      // contract 2: 16 lowercase hex chars exactly
      sd.foreach { case (span, d) =>
        assert(d.length == 16 && d.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')),
          s"doc ${r.getLong(0)}: digest '$d' is not 16 lowercase hex chars")
        assert(span >= 1 && java.lang.Long.bitCount(span) == 1 && span <= 64,
          s"doc ${r.getLong(0)}: span $span is not a dyadic level ≤ 64")
      }
      // the repeated-token docs must actually exercise the dedup: doc 1's
      // level-1 output is ONE digest despite 80 positions
      if (r.getLong(0) == 1L)
        deduped = sd.count(_._1 == 1L) == 1
    }
    assert(deduped, "doc 1 (80 copies of one token) must emit a single level-1 digest")
  }

  test("audioBands law: non-canonical RIFF layout fingerprints the located data chunk") {
    val body = Array.tabulate(300)(i => ((i * 37 + 11) % 251).toByte)
    val canonical = Containers.wav(16000, 1, body)

    // spec-legal non-canonical WAVE: LIST/INFO chunk first, then an
    // oversized fmt (18-byte extensible-adjacent body), then data
    val junk = Array.tabulate(10)(i => (i * 7).toByte)
    val fmtSize = 18
    val out = new Array[Byte](12 + (8 + junk.length) + (8 + fmtSize) + 8 + body.length)
    def tag(i: Int, t: String): Unit = (0 until 4).foreach(k => out(i + k) = t.charAt(k).toByte)
    def le32(i: Int, v: Int): Unit = (0 until 4).foreach(k => out(i + k) = ((v >> (8 * k)) & 0xff).toByte)
    def le16(i: Int, v: Int): Unit = (0 until 2).foreach(k => out(i + k) = ((v >> (8 * k)) & 0xff).toByte)
    tag(0, "RIFF"); le32(4, out.length - 8); tag(8, "WAVE")
    var p = 12
    tag(p, "LIST"); le32(p + 4, junk.length)
    System.arraycopy(junk, 0, out, p + 8, junk.length); p += 8 + junk.length
    tag(p, "fmt "); le32(p + 4, fmtSize)
    le16(p + 8, 1); le16(p + 10, 1); le32(p + 12, 16000)
    le32(p + 16, 32000); le16(p + 20, 2); le16(p + 22, 16); le16(p + 24, 0)
    p += 8 + fmtSize
    tag(p, "data"); le32(p + 4, body.length)
    System.arraycopy(body, 0, out, p + 8, body.length)

    // both parse as wav and fingerprint identically over the same PCM body
    assert(MediaCodec.parseHeader(canonical)._3 == "wav")
    assert(MediaCodec.parseHeader(out)._3 == "wav")
    val fpCanon = MediaCodec.audioBands(canonical)
    val fpShift = MediaCodec.audioBands(out)
    assert(fpCanon.isDefined && fpShift.isDefined)
    assert(fpCanon.get.toSeq == fpShift.get.toSeq,
      "same PCM body must fingerprint identically regardless of chunk layout")

    // and the dithered twin keeps gain-invariance through the new walk
    val dCanon = MediaCodec.audioBands(canonical, dither = true)
    val dShift = MediaCodec.audioBands(out, dither = true)
    assert(dCanon.get.toSeq == dShift.get.toSeq)

    // a RIFF/WAVE with no data chunk at all must answer None, not hash pad
    val noData = java.util.Arrays.copyOfRange(canonical, 0, 36)
    val hdrOnly = new Array[Byte](36)
    System.arraycopy(noData, 0, hdrOnly, 0, 36)
    assert(MediaCodec.audioBands(hdrOnly).isEmpty)
  }
}
