package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based per-user sessionization — the reference accumulates
  * per-user event lists and cuts a session when `sessionThresholdInS`
  * elapses or `sessionThresholdEvents` accumulate (kassette-server
  * processor/processor.go:346-576 addJobsToSessions/createSessions).
  *
  * Spark-first: ONE shuffle on the user key, then sort-window within
  * partitions — `lag` marks session breaks, a running sum numbers
  * them. No groupByKey materialization; a single user's events are
  * the only thing that must fit an executor (AQE skew-split handles
  * hot users at 100 TB).
  */
object Sessionize {

  /** Adds `session_seq` (1-based per user) to the frame.
    * @param orderCols total order within user (must be unique for
    *                  deterministic break placement) */
  def apply(df: DataFrame, userCol: String, tsMsCol: String,
            gapMs: Long, orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(orderCols.map(col): _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_prev_ms", lag(col(tsMsCol), 1).over(w))
      .withColumn("_brk",
        when(col("_prev_ms").isNull || col(tsMsCol) - col("_prev_ms") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("_brk")).over(wRun))
      .drop("_prev_ms", "_brk")
  }

  /** Gap sessions sub-split every `maxEvents` rows — the reference
    * cuts a user's buffer on sessionThresholdEvents too
    * (processor.go:380: "If we have enough events from that user, we
    * process jobs"). Pure second window pass on the same partitioning
    * (no extra shuffle: same key, Spark reuses the exchange). */
  def withMaxEvents(df: DataFrame, userCol: String, tsMsCol: String,
                    gapMs: Long, maxEvents: Int, orderCols: Seq[String]): DataFrame = {
    val base = apply(df, userCol, tsMsCol, gapMs, orderCols)
    val wIn = Window.partitionBy(col(userCol), col("session_seq"))
      .orderBy(orderCols.map(col): _*)
    base
      .withColumn("_rn", row_number().over(wIn))
      .withColumn("session_part", ((col("_rn") - 1) / maxEvents).cast("long"))
      .drop("_rn")
  }

  /** Collapsed per-session summary (the unit the reference hands to
    * the destination transform). */
  def summarize(df: DataFrame, userCol: String, tsMsCol: String,
                gapMs: Long, orderCols: Seq[String]): DataFrame =
    apply(df, userCol, tsMsCol, gapMs, orderCols)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsMsCol)).as("start_ms"),
        max(col(tsMsCol)).as("end_ms"))
}
