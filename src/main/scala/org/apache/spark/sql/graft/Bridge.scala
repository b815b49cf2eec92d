package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one deliberate reach into Spark's `private[sql]` surface: turn a
  * hand-built [[LogicalPlan]] back into a public [[DataFrame]].
  *
  * `Dataset.ofRows` is how every `spark.read`/`spark.sql` call constructs
  * its result internally, but it is `private[sql]` — so this single-method
  * shim lives under `org.apache.spark.sql` (the standard extension-library
  * pattern) and nothing else does. All graft code stays in the `graft`
  * package and uses only public APIs plus this bridge.
  *
  * The cast to the classic session is safe in every supported deployment:
  * a JVM-local Spark 4.x session (the only kind the driver hands us) IS an
  * `org.apache.spark.sql.classic.SparkSession`; Connect sessions cannot
  * reach a server-side logical plan in the first place.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
