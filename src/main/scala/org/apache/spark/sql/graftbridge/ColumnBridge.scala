package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters so
  * graft's custom Catalyst expressions (DotProduct, SimHash64) can be
  * exposed as ordinary Columns without session-registry round-trips.
  * Lives in an org.apache.spark.sql subpackage purely for access;
  * contains no Spark-internal logic. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Stable, collision-free id for a session (`private[sql]
    * sessionUUID`) — identityHashCode keys can recycle after GC and
    * hand a new session cached frames bound to a stopped context. */
  def sessionUUID(s: org.apache.spark.sql.SparkSession): String = s match {
    case c: org.apache.spark.sql.classic.SparkSession => c.sessionUUID
    case other => other.toString
  }

  /** The persisted RDDs backing a `localCheckpoint`'d Dataset — the
    * PRECISE handle for releasing its blocks. The global
    * before/after diff of `getPersistentRDDs` (Dedup
    * .withNewPersistentRdds) is wrong under concurrent trainings
    * (r21: pqCodebooks runs subspace Lloyd trainings in parallel —
    * one thread's diff would capture, and later unpersist, another
    * thread's LIVE sample, whose lineage the checkpoint truncated);
    * reading the RDD off the checkpoint's own LogicalRDD plan node
    * captures exactly the blocks this frame owns. */
  def checkpointRdds(ds: org.apache.spark.sql.Dataset[_])
      : Seq[org.apache.spark.rdd.RDD[_]] = ds match {
    case c: org.apache.spark.sql.classic.Dataset[_] =>
      c.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
    case _ => Nil
  }
}
