package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` doorway the custom-operator surface needs:
  * wrapping a hand-built `LogicalPlan` back into a `DataFrame`
  * (`Dataset.ofRows`). Placing a shim object inside the `org.apache.
  * spark.sql` package tree is the standard technique Spark extension
  * libraries use for this — no Spark internals are modified, and the
  * method is part of Spark's own stable internal surface (every
  * `DataFrame` the session hands out is built through it).
  */
object SqlShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
