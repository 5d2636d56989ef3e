package graft.queries

import graft.operators.Multimodal

/** Multimodal suite — binary payload columns with a stubbed decode
  * (see [[graft.operators.Multimodal]] for why the decode is fake and what
  * is real). The n_bytes column is oracle-checkable (UTF-8 byte length of
  * the text); the decoded fake metadata/features are rows-only.
  */
object MultimodalQueries {

  val q50 = Q(
    "q50_multimodal_decode",
    (s, dir) => Multimodal.query(s, dir),
    None
  )

  val all: Seq[Q] = Seq(q50)
}
