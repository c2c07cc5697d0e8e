package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental aggregation maintenance — at 100 TB you never
  * recompute a running summary from raw history; each new extraction
  * window (see sources.HighWaterMark) produces a PARTIAL summary and
  * merges it into the stored one. That only works if the summary
  * state is mergeable: count, decimal-exact sum, min, max are; this
  * operator keeps the state in exactly that form and exposes the
  * merge as a plain groupBy so Catalyst map-side-combines it.
  *
  * The reference's reporting tables are rebuilt by re-querying
  * Postgres history; re-expressed Spark-first the summary IS the
  * mergeable state and a day's load is one `partial` + one `merge`
  * over ⌈days⌉ rows, not a history scan.
  *
  * Identity (proved in the gate): merge(partials by finer keys) ==
  * direct aggregation over raw rows, for ANY split of the input.
  */
object IncrementalAgg {

  /** Mergeable partial summary per key tuple. Sum is DECIMAL(12,2) —
    * exact under any merge order (doubles would drift per shape). */
  def partial(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(DecimalType(12, 2))).as("sum_value"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"))

  /** Merge partial summaries down to coarser keys (or union several
    * windows' partials first and merge them all at once — the state
    * columns are associative+commutative, so any grouping works). */
  def merge(partials: DataFrame, keys: Seq[String]): DataFrame =
    partials.groupBy(keys.map(col): _*)
      .agg(
        sum(col("n_events")).as("n_events"),
        sum(col("sum_value")).as("sum_value"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"))

  /** Publish shape: the exact decimal state rendered for readers
    * (double total), keeping the state columns' names stable. */
  def render(summary: DataFrame): DataFrame =
    summary.withColumn("total_value", col("sum_value").cast("double"))
      .drop("sum_value")
}
