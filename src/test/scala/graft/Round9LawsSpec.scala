package graft

import org.apache.spark.sql.functions._

/** Round-9 regression laws for the ADVICE fixes:
  *
  *  - the q158 ppm arithmetic must survive corpus-scale token counts
  *    (excis_tokens ~ 1e13 → the ×1e6 product overflows BIGINT; the
  *    DECIMAL(38,0) route must not), under the ANSI-mode house rule;
  *  - the q159 decoders must analyze and degrade to the pure
  *    single-character fold when the collected codebook is EMPTY
  *    (a vocabulary with no 2..4-char substrings) — `array()` with no
  *    children used to infer `array<null>` and fail analysis.
  */
class Round9LawsSpec extends SparkSpec {

  import spark.implicits._

  test("q158 ppm math: DECIMAL route exact at 100TB-scale token counts") {
    // 1e13 duplicated tokens of a 3e13-token corpus: the plain-BIGINT
    // product 1e13 * 1e6 = 1e19 > Long.MaxValue (~9.22e18).
    val row = Seq((10000000000000L, 30000000000000L))
      .toDF("excis_tokens", "t")
      .select(expr(
        """cast(cast(excis_tokens as decimal(38,0)) * 1000000 div t
           as bigint)""").as("ppm"))
      .head()
    assert(row.getLong(0) == 333333L, s"ppm ${row.getLong(0)}")
  }

  test("q172 law: MMR skips the near-duplicate of the top hit") {
    // q=(1,0): c10 and c11 are EXACT duplicates (rel ≈ 0.9 each, mutual
    // sim = 1), c12 mirrors them across the query axis (same rel, sim to
    // the selected c10 only ≈ 0.62). Greedy-by-relevance would pick
    // {10, 11}; MMR must pick c12 second and demote the dup c11 to third.
    def v(a: Float, b: Float) = Array(a, b) ++ Array.fill(62)(0.0f)
    val emb = Seq(
      (0L, v(1.0f, 0.0f), 0),
      (10L, v(0.9f, 0.436f), 0),
      (11L, v(0.9f, 0.436f), 0),
      (12L, v(0.9f, -0.436f), 0)).toDF("vec_id", "embedding", "label")
    val got = queries.SimilarityQueries.mmrDiversify(emb)
      .collect().map(r => (r.getLong(2), r.getLong(1))).toMap // rank -> nb
    assert(got(1L) == 10L, s"rank1 ${got(1L)}")
    assert(got(2L) == 12L, s"rank2 ${got(2L)} — duplicate not demoted")
    assert(got(3L) == 11L, s"rank3 ${got(3L)}")
  }

  test("q167 ⋈ q164 ⋈ q161 cross-laws: spectrum ties out against the datasheet and the sweep") {
    val sf = "/root/testdata/sf0.001"
    val spectrum = SparkEntry.queries("q167_phrase_spectrum")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val datasheet = SparkEntry.queries("q164_datasheet")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // length-1 positions ARE the corpus token count
    assert(spectrum(1L)._1 == datasheet("n_tokens"),
      s"${spectrum(1L)._1} vs ${datasheet("n_tokens")}")
    // some word repeats ⟺ the k=2 repeat frontier is non-empty
    val sweep2 = SparkEntry.queries("q161_repeat_sweep")(spark, sf)
      .filter(col("k") === 2).head().getLong(1)
    val hasRepeatWord = spectrum(1L)._2 < spectrum(1L)._1
    assert((sweep2 >= 1L) == hasRepeatWord,
      s"longest(2)=$sweep2 vs distinct(1)=${spectrum(1L)._2}/${spectrum(1L)._1}")
    // distinct counts never exceed positions; both fall with length
    spectrum.foreach { case (l, (np, nd)) => assert(nd <= np, s"len $l") }
  }

  test("q159 decoders: empty codebook degrades to the singles fold") {
    val out = Seq("abcd", "x").toDF("word")
      .select(col("word"),
        queries.TextQueries.greedyPieces(col("word"), Seq.empty).as("g"),
        queries.TextQueries.optPieces(col("word"), Seq.empty).as("o"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (w, g, o) =>
      assert(g == w.length.toLong, s"greedy on '$w': $g")
      assert(o == w.length.toLong, s"opt on '$w': $o")
    }
  }
}
