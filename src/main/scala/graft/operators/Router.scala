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

  /** Delivery-ack ingestion — everything AFTER the HTTP response in
    * the reference's router loop (router.go JobsRequestWorker: POST a
    * batch, map the response to a job_status row, schedule the
    * retry). Given the envelope set and the acks that came back, emit
    * the per-batch ledger state the jobsdb would record:
    *  - last code 2xx            → succeeded
    *  - last code 429/5xx        → waiting_retry with exponential
    *                               backoff (base · 2^(attempts−1),
    *                               shift capped at 20), or aborted
    *                               once attempts ≥ maxRetry
    *  - any other code           → aborted (non-retryable 4xx)
    *  - no ack yet               → waiting
    * The POST itself is externalized (an egress layer consumes the
    * envelope body); this closes the ack→ledger loop so the retry /
    * dead-letter views downstream ([[graft.operators.JobLedger]])
    * read a live table. One partial-agg shuffle on the batch key +
    * one broadcast-friendly left join. */
  def ackLedger(envelopes: DataFrame, acks: DataFrame,
                batchKeyCols: Seq[String], attemptCol: String,
                codeCol: String, ackTsMsCol: String,
                maxRetry: Int, baseBackoffMs: Long): DataFrame = {
    val keyCols = batchKeyCols.map(col)
    val top = acks.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n_attempts"),
        max(struct(col(attemptCol).as("a"), col(codeCol).as("c"),
          col(ackTsMsCol).as("t"))).as("_last"))
      .select(keyCols ++ Seq(col("n_attempts"),
        col("_last.c").as("last_code"), col("_last.t").as("last_ack_ms")): _*)
    val retryable = col("last_code") === 429 ||
      (col("last_code") >= 500 && col("last_code") <= 599)
    envelopes.join(top, batchKeyCols, "left")
      .withColumn("n_attempts", coalesce(col("n_attempts"), lit(0L)))
      .withColumn("state",
        when(col("last_code").isNull, "waiting")
          .when(col("last_code") >= 200 && col("last_code") <= 299, "succeeded")
          .when(retryable && col("n_attempts") >= maxRetry, "aborted")
          .when(retryable, "waiting_retry")
          .otherwise("aborted"))
      .withColumn("next_retry_ms",
        when(col("state") === "waiting_retry",
          col("last_ack_ms") + lit(baseBackoffMs) *
            expr("shiftleft(1L, cast(least(n_attempts - 1, 20) as int))"))
          .otherwise(lit(null).cast("long")))
  }
}
