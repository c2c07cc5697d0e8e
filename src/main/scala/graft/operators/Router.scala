package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Destination routing — the reference fans events out per enabled
  * connection, batches them (transformBatchSize=10,
  * processor/processor.go:58; router MAX_BATCH_PAYLOAD_SIZE,
  * router/router.go:43) and tracks per-destination success/failure/
  * disabled stats (router.go destFailure/destSuccess/destDisabled).
  *
  * Spark-first: routing is a partition column, not a driver-side
  * dispatch loop — `df.write.partitionBy(destCol)` gives each
  * destination its own file subtree in one pass.
  */
object Router {

  /** Per-destination delivery stats (stats.go counters as one agg). */
  def fanoutStats(df: DataFrame, destCol: String, amountCol: String,
                  userCol: String): DataFrame =
    df.groupBy(col(destCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(amountCol).cast(DecimalType(12, 2))).cast("double").as("total_amount"),
        countDistinct(col(userCol)).as("n_users"))

  /** Deterministic micro-batch assignment within each destination:
    * batch k holds rows k*size..k*size+size-1 in `orderCol` order
    * (the reference slices the in-memory event list the same way). */
  def microBatch(df: DataFrame, destCol: String, orderCol: String,
                 size: Int): DataFrame = {
    val w = Window.partitionBy(col(destCol)).orderBy(col(orderCol))
    df.withColumn("batch_id", ((row_number().over(w) - 1) / size).cast("long"))
  }

  /** Gateway intake micro-batching (gateway.go:144 webRequestBatcher):
    * the reference closes a batch when `maxBatchSize` requests
    * accumulate OR `batchTimeout` elapses with no arrival. Replayed
    * over event time: an inter-arrival gap > timeout starts a new
    * batch run (gap sessionization) and the size cap splits inside a
    * run — ONE shuffle on the source key, both passes windowed on the
    * same partitioning (Spark reuses the exchange). Emits one row per
    * closed batch (the envelope the gateway would enqueue). */
  def gatewayBatches(df: DataFrame, sourceCol: String, tsMsCol: String,
                     orderCol: String, batchTimeoutMs: Long,
                     maxBatchSize: Int): DataFrame =
    Sessionize.withMaxEvents(df, sourceCol, tsMsCol, gapMs = batchTimeoutMs,
        maxEvents = maxBatchSize, orderCols = Seq(tsMsCol, orderCol))
      .groupBy(col(sourceCol), col("session_seq").as("run_seq"),
        col("session_part").as("batch_part"))
      .agg(
        count(lit(1)).as("n_in_batch"),
        min(col(orderCol)).as("first_id"),
        max(col(orderCol)).as("last_id"),
        min(col(tsMsCol)).as("start_ms"),
        max(col(tsMsCol)).as("end_ms"))

  /** Batch envelope summary — one row per `{"payload":[...]}` the
    * reference would POST (integrations/types.go BatchPayloadT). */
  def batchSummary(df: DataFrame, destCol: String, orderCol: String,
                   size: Int): DataFrame =
    microBatch(df, destCol, orderCol, size)
      .groupBy(col(destCol), col("batch_id"))
      .agg(
        count(lit(1)).as("n_in_batch"),
        min(col(orderCol)).as("first_id"),
        max(col(orderCol)).as("last_id"))
}
