package graft.operators

/** Unigram-LM (SentencePiece-style, Kudo ACL'18) Viterbi decoding over an
  * integer-cost piece table — the executor-side kernel of q178's training
  * loop. Costs are integer-quantized negative log-likelihoods:
  * cost(p) = bitlen(T div t(p)) + 1, an exact ⌈log₂⌉ surrogate (both
  * engines compute it from the same integer ratio — a libm `log` would
  * not be bit-stable cross-engine).
  *
  * Tie-breaks are part of the cross-engine contract: the forward DP takes
  * the MINIMUM total cost; the backtrack picks the LONGEST piece that
  * achieves it at each boundary (the canonical path the oracle's
  * recursive CTE replays CASE-by-CASE).
  */
object UnigramLm {

  /** bit length of x ≥ 1 — `length(bin(x))` in both SQL engines. */
  def bitLen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)

  /** cost table from counts: cost(p) = bitlen(total div t) + 1. */
  def costs(t: Map[String, Long]): Map[String, Long] = {
    val total = t.valuesIterator.sum
    t.map { case (p, c) => p -> (bitLen(total / c) + 1L) }
  }

  private final val Big = 1000000000L

  /** Pieces on the canonical minimum-cost segmentation of `word`
    * (piece lengths 1..4; the cost table must cover every single char of
    * the word — q178 seeds all vocabulary chars, so decoding never
    * dead-ends). */
  def viterbiPieces(word: String, cost: Map[String, Long]): List[String] = {
    val n = word.length
    val best = new Array[Long](n + 1)
    var i = 1
    while (i <= n) {
      var b = Big
      var l = 1
      while (l <= 4 && l <= i) {
        val c = cost.getOrElse(word.substring(i - l, i), Big)
        if (c < Big && best(i - l) + c < b) b = best(i - l) + c
        l += 1
      }
      best(i) = b
      i += 1
    }
    var acc: List[String] = Nil
    var pos = n
    while (pos > 0) {
      var chosen = 1
      var l = math.min(4, pos)
      var found = false
      while (l >= 2 && !found) {
        val p = word.substring(pos - l, pos)
        val c = cost.getOrElse(p, Big)
        if (c < Big && best(pos - l) + c == best(pos)) { chosen = l; found = true }
        else l -= 1
      }
      acc = word.substring(pos - chosen, pos) :: acc
      pos -= chosen
    }
    acc
  }
}
