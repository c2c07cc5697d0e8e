package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed per-group running sum over a deterministic order —
  * the scale-safe form of
  * `SUM(v) OVER (PARTITION BY group ORDER BY key ROWS UNBOUNDED
  * PRECEDING)`.
  *
  * A plain per-group window hands one task the WHOLE group: with a
  * handful of corpus sources at 100 TB that is a ~20 TB single-task
  * sort. Because the order key in the packing/budgeting operators is
  * a uniform content hash, the key space can be RANGE-sharded with a
  * cheap monotone function of the key itself (no sampling pass):
  * every shard holds a contiguous key range, so
  *
  *   global running sum = shard-local running sum
  *                      + Σ totals of all earlier shards in the group.
  *
  * Three-step plan (same two-phase shape as q25's distributed decile,
  * Relational.scala):
  *   1. one partial-agg shuffle computes per-(group, shard) totals —
  *      groups × shards rows, collected to the driver;
  *   2. the driver scan-lefts prefix offsets (a few KB) and ships
  *      them back as a broadcast frame;
  *   3. the window runs partitioned by (group, shard) — each task
  *      sorts only its shard, ~1/S of the group.
  *
  * Output is EXACTLY the single-partition window's (the shard
  * function is monotone in the order key, ties share a shard), so
  * DuckDB hash-oracles written against the logical window still
  * match. At 100 TB, persist `df` before calling (two scans
  * otherwise); at test scale the double scan is cheaper than a cache.
  */
object ShardedWindow {

  /** @param df       input frame
    * @param group    grouping column name (window PARTITION BY key)
    * @param shard    monotone non-decreasing function of the leading
    *                 order key (e.g. `key div 2^55` for a 60-bit
    *                 uniform hash, `conv(substr(hex, 1, 2), 16, 10)`
    *                 for an md5 string) — defines the range shards
    * @param order    full ORDER BY columns (shard-local sort)
    * @param value    column to running-sum (must be integral)
    * @param out      name of the produced running-sum column
    */
  def runningSum(df: DataFrame, group: String, shard: Column,
                 order: Seq[Column], value: Column, out: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val tagged = df.withColumn("__shard", shard.cast("long"))
    // phase 1: per-(group, shard) totals — one map-side-combined
    // shuffle of (group, shard, long) triples
    val totals = tagged.groupBy(col(group), col("__shard"))
      .agg(sum(value).cast("long").as("__tot"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // phase 2: driver prefix offsets per group, in shard order
    val offsets = totals.groupBy(_._1).iterator.flatMap { case (g, rows) =>
      val inOrder = rows.sortBy(_._2)
      inOrder.zip(inOrder.map(_._3).scanLeft(0L)(_ + _))
        .map { case ((_, sh, _), off) => (g, sh, off) }
    }.toSeq.toDF(group, "__shard", "__off")
    // phase 3: shard-local window + broadcast offset add
    val w = Window.partitionBy(col(group), col("__shard"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged.join(broadcast(offsets), Seq(group, "__shard"))
      .withColumn(out, sum(value).over(w) + col("__off"))
      .drop("__shard", "__off")
  }

  private def ceilLog2(s: Int): Int =
    math.max(1, 32 - Integer.numberOfLeadingZeros(math.max(1, s - 1)))

  /** Shard function for a uniform 60-bit hash key ([[Dedup.shingleHash]]
    * range): the top ceil(log2(s)) bits — exact integer shift, monotone,
    * so shards are contiguous key ranges. Yields 2^ceil(log2(s)) ≥ s
    * shards. */
  def hashShard60(key: Column, s: Int): Column =
    shiftright(key, 60 - math.min(ceilLog2(s), 59))

  /** Shard function for a lowercase-hex md5 STRING key ordered
    * lexicographically: equal-length hex strings sort identically to
    * their numeric value, so the first-two-digit (8-bit) prefix is
    * monotone in the full key. Yields up to 256 shards. */
  def hexShard(key: Column, s: Int): Column =
    shiftright(conv(substring(key, 1, 2), 16, 10).cast("long"),
      8 - math.min(ceilLog2(s), 8))
}
