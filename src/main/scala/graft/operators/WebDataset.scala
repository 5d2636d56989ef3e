package graft.operators

import java.io.InputStream

import graft.sources.tar.TarWalk

/** WebDataset sample pairing — the consumption side of the tar shard
  * road: multimodal training corpora ship as tar shards whose members
  * pair by basename stem (`000123.jpg` + `000123.txt` + `000123.json`,
  * the img2dataset/WebDataset layout), and the unit a pipeline consumes
  * is the paired SAMPLE, not the member. Reference anchor: the
  * one-answer-per-member-table contract at `/root/reference/main.py:
  * 147-165` — this operator is its grouping extension for the container
  * the reference never handles.
  *
  * Key/extension split follows the WebDataset convention: the extension
  * is everything after the FIRST dot of the basename (so
  * `a/000123.seg.png` keys as `a/000123` with ext `seg.png` — dotted
  * "stream" extensions stay intact), the key is the member path up to it.
  *
  * Grouping is CONTIGUOUS-run, not global: the WebDataset contract is
  * that a sample's members are adjacent in the shard (writers emit them
  * together precisely so readers can stream), so a key reappearing later
  * in the archive starts a NEW sample — faithfully, rather than silently
  * merging what a streaming consumer would see as two.
  *
  * Scale shape: the shard is the unit of parallelism (BulkIngest lists
  * and fans shards out file-grain; one task pairs one shard), and pairing
  * itself is a single streaming pass — but each SAMPLE's payloads are
  * materialized for the consumer (that is the operator's contract: a
  * caption-image pair is consumed together), so the per-task memory bound
  * is one sample, not one shard. */
object WebDataset {

  /** One paired sample: the shared key and the members in archive order
    * as (extension, payload). */
  final case class Sample(key: String, members: Seq[(String, Array[Byte])])

  /** (key, ext): basename-first-dot split, directories kept in the key. */
  def splitKey(name: String): (String, String) = {
    val slash = name.lastIndexOf('/')
    val dot = name.indexOf('.', slash + 1)
    if (dot < 0) (name, "")
    else (name.substring(0, dot), name.substring(dot + 1))
  }

  /** Pair a (decoded) tar stream's regular members into samples. One
    * streaming pass; throws on a malformed archive — the caller's
    * per-file isolation (BulkIngest's Failed row / a query's task guard)
    * is the failure boundary, same as every other byte road. */
  def samples(in: InputStream): Seq[Sample] = {
    val out = Seq.newBuilder[Sample]
    var curKey: String = null
    var cur = Seq.newBuilder[(String, Array[Byte])]
    var curEmpty = true
    TarWalk.walk(in) { (e, data) =>
      val (key, ext) = splitKey(e.name)
      if (key != curKey && !curEmpty) {
        out += Sample(curKey, cur.result())
        cur = Seq.newBuilder[(String, Array[Byte])]
        curEmpty = true
      }
      curKey = key
      cur += ext -> data.readAllBytes()
      curEmpty = false
    }
    if (!curEmpty) out += Sample(curKey, cur.result())
    out.result()
  }
}
