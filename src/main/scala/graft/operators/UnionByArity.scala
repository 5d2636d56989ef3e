package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Union-by-arity — the reference's one true dataflow operator, generalized
  * from its PDF concat path (reference `main.py:382-404`): partition a list
  * of frames by whether their column count matches the FIRST frame's, then
  * positionally concatenate each group.
  *
  * Reference quirks reproduced when `withIndexColumn = true`:
  * `reset_index(inplace=True)` after the concat prepends a surplus `index`
  * column (0-based running row number) to both the valid and invalid frames
  * (`main.py:391-392`) — observable in the reference's output schema.
  *
  * Spark notes: positional `union` (pandas `concat` aligns the identical
  * ordinal columns positionally — `unionByName` would be wrong here);
  * Catalyst collapses the adjacent unions into one `Union` node, so N
  * frames concatenate as one stage, not N-1. The `index` column needs a
  * global row number = a single-partition window; it exists only for
  * bit-faithful reference parity and is OFF by default (at scale you never
  * want it).
  */
object UnionByArity {

  final case class Result(valid: Option[DataFrame], invalid: Option[DataFrame])

  def apply(frames: Seq[DataFrame], withIndexColumn: Boolean = false): Result = {
    if (frames.isEmpty) return Result(None, None)
    val firstArity = frames.head.columns.length
    val (ok, bad) = frames.partition(_.columns.length == firstArity)
    Result(concat(ok, withIndexColumn), concat(bad, withIndexColumn))
  }

  private def concat(fs: Seq[DataFrame], withIndex: Boolean): Option[DataFrame] = {
    if (fs.isEmpty) None
    else {
      // The invalid group routinely mixes arities (that's WHY its frames
      // are there); pandas concat label-aligns the ordinal columns and
      // NaN-pads the narrow frames (`main.py:388-390`), so mirror that:
      // null-pad every frame to the group's max arity before the
      // positional union. Pad columns take the widest frame's names and
      // types. The valid group is same-arity by construction → no-op.
      val maxArity = fs.map(_.columns.length).max
      val widest = fs.find(_.columns.length == maxArity).get
      val padded = fs.map { f =>
        val n = f.columns.length
        if (n == maxArity) f
        else f.select(f.columns.map(col) ++ (n until maxArity).map { i =>
          val fld = widest.schema(i)
          lit(null).cast(fld.dataType).as(fld.name)
        }: _*)
      }
      val unioned = padded.reduce(_ union _)
      if (!withIndex) Some(unioned)
      else {
        // pandas reset_index parity: 0-based global ordinal as column "index"
        val w = Window.orderBy(monotonically_increasing_id())
        Some(
          unioned
            .withColumn("index", row_number().over(w) - 1)
            .select(col("index") +: unioned.columns.map(col): _*)
        )
      }
    }
  }
}
