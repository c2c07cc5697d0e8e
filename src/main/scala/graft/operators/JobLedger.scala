package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The jobsdb status machine re-expressed over an append-only status
  * ledger (kassette-server jobs/jobsdb.go: job_status table, states
  * waiting/executing/succeeded/failed/waiting_retry/aborted;
  * GetUnprocessed/GetToRetry; maxRetryNumber).
  *
  * The reference mutates Postgres rows; at 100 TB the Spark-native
  * shape is an immutable event ledger + derived views. `latest` uses
  * max_by-style aggregation (max of a struct) instead of
  * row_number+filter: a struct-max supports partial (map-side)
  * aggregation, so the shuffle carries one row per key per input
  * partition instead of the whole ledger.
  */
object JobLedger {

  /** Latest status per job: argmax over (tsMs, tieBreak).
    * Emits jobCol, last_<statusCol>, last_ms. */
  def latest(df: DataFrame, jobCol: String, statusCol: String,
             tsMsCol: String, tieBreakCol: String): DataFrame =
    df.groupBy(col(jobCol))
      .agg(max(struct(col(tsMsCol), col(tieBreakCol), col(statusCol))).as("_top"))
      .select(
        col(jobCol),
        col(s"_top.$statusCol").as(s"last_$statusCol"),
        col(s"_top.$tsMsCol").as("last_ms"))

  /** GetToRetry analogue: jobs whose latest status is `failedValue`
    * and attempt count (occurrences of failedValue) < maxRetry. */
  def toRetry(df: DataFrame, jobCol: String, statusCol: String,
              tsMsCol: String, tieBreakCol: String,
              failedValue: String, maxRetry: Int): DataFrame = {
    val attempts = df.filter(col(statusCol) === failedValue)
      .groupBy(col(jobCol)).agg(count(lit(1)).as("attempts"))
    latest(df, jobCol, statusCol, tsMsCol, tieBreakCol)
      .filter(col(s"last_$statusCol") === failedValue)
      .join(attempts, jobCol)
      .filter(col("attempts") < maxRetry)
      .select(col(jobCol), col("attempts"), col("last_ms"))
  }

  /** GetUnprocessed analogue (jobsdb.go GetUnprocessed: jobs with no
    * job_status row yet): job groups that never reached the terminal
    * status. Left-anti on the job key — one shuffle per side, the
    * anti-join never expands rows, and both aggs are partial-agg
    * friendly. */
  def unprocessed(df: DataFrame, jobCols: Seq[String], statusCol: String,
                  terminalValue: String, tsMsCol: String): DataFrame = {
    val done = df.filter(col(statusCol) === terminalValue)
      .select(jobCols.map(col): _*).distinct()
    df.join(done, jobCols, "left_anti")
      .groupBy(jobCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_pending"),
        min(col(tsMsCol)).as("first_ms"),
        max(col(tsMsCol)).as("last_ms"))
  }

  /** SCD Type-2 history: the append-only ledger compressed to one row
    * per STATE RUN per key with `[valid_from_ms, valid_to_ms)`
    * validity, a version sequence and an `is_current` flag — the
    * warehouse-dimension shape of the jobsdb status machine (each
    * Postgres row UPDATE in the reference becomes a closed version
    * here; the open-ended row is the current state).
    *
    * Scale shape: ONE shuffle on the key. The change-detection lag,
    * the run-numbering running sum, the per-run aggregate and the
    * valid_to lead all require only (key)-clustering, which the first
    * exchange provides (window-subset rule); per-key history fits a
    * task by the same argument as sessionization. */
  def scd2History(df: DataFrame, keyCol: String, stateCol: String,
                  tsMsCol: String, tieBreakCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsMsCol), col(tieBreakCol))
    val chg = when(
      lag(col(stateCol), 1).over(w).isNull
        || lag(col(stateCol), 1).over(w) =!= col(stateCol), 1).otherwise(0)
    val runs = df
      .withColumn("_chg", chg)
      .withColumn("version", sum(col("_chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val versions = runs.groupBy(col(keyCol), col("version"))
      .agg(
        min(col(stateCol)).as("state"), // constant within a run
        min(col(tsMsCol)).as("valid_from_ms"),
        count(lit(1)).as("n_events"))
    val wv = Window.partitionBy(keyCol).orderBy(col("version"))
    versions
      .withColumn("valid_to_ms", lead(col("valid_from_ms"), 1).over(wv))
      .withColumn("is_current", col("valid_to_ms").isNull)
      .select(col(keyCol), col("version"), col("state"),
        col("valid_from_ms"), col("valid_to_ms"), col("is_current"),
        col("n_events"))
  }

  /** Dataset rotation — the jobsdb queue-compaction machinery
    * (jobs/jobsdb.go addNewDS / dataset migration) re-expressed as a
    * ledger rewrite: jobs whose LATEST status is terminal at or
    * before `cutoffMs` compact to ONE snapshot row (their latest
    * ledger row — intermediate history dropped, exactly what the
    * reference's migration does when it carries only live jobs into
    * the merged dataset); every other job keeps its full history in
    * the live tail. Returns (snapshot, tail) — union them for the
    * compacted ledger, or write them as the new dataset pair.
    *
    * INVARIANT (gate-proven by p_queue_rotate): the queue views —
    * [[latest]], [[toRetry]], [[unprocessed]] — return identical
    * results over `snapshot ∪ tail` and over the raw ledger. Audit
    * views that read intermediate rows of finished jobs
    * ([[deadLetter]] attempt counts) belong on the pre-rotation
    * archive, as in the reference where a migrated-away dataset is
    * dropped only after archival.
    *
    * Scale shape: one partial-agg shuffle on the job key builds the
    * latest-row snapshot (struct-max carries the whole row, so no
    * second pass re-fetches it); the tail is a left-anti join against
    * the compacted job ids — a set AQE broadcasts when small, and a
    * key-partitioned hash join (never a sort) when not. */
  def rotate(df: DataFrame, jobCol: String, statusCol: String,
             tsMsCol: String, tieBreakCol: String,
             terminalValues: Seq[String], cutoffMs: Long): (DataFrame, DataFrame) = {
    val rowStruct = struct(df.columns.map(col): _*)
    val top = df.groupBy(col(jobCol).as("_job"))
      .agg(max(struct(col(tsMsCol).as("_ts"), col(tieBreakCol).as("_tie"),
        rowStruct.as("_row"))).as("_t"))
      .select(col("_job"), col("_t._ts").as("_ts"),
        col(s"_t._row.$statusCol").as("_status"), col("_t._row").as("_row"))
    val compactable = top
      .filter(col("_status").isin(terminalValues: _*) && col("_ts") <= cutoffMs)
    val snapshot = compactable.select(col("_row.*"))
    val tail = df.join(compactable.select(col("_job").as(jobCol)),
      Seq(jobCol), "left_anti")
    (snapshot, tail)
  }

  /** Dead-letter view: jobs that accumulated >= maxRetry failures →
    * aborted (jobsdb.go maxRetryNumber / AbortedState). */
  def deadLetter(df: DataFrame, jobCol: String, statusCol: String,
                 tsMsCol: String, failedValue: String, maxRetry: Int): DataFrame =
    df.filter(col(statusCol) === failedValue)
      .groupBy(col(jobCol))
      .agg(
        count(lit(1)).as("attempts"),
        min(col(tsMsCol)).as("first_fail_ms"),
        max(col(tsMsCol)).as("last_fail_ms"))
      .filter(col("attempts") >= maxRetry)
}
