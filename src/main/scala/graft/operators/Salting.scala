package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting.
  *
  * AQE's skew-join splitting handles most runtime skew, but two
  * shapes still need explicit salting at 100 TB:
  *  - a groupBy where one key holds a large share of all rows (the
  *    partial agg helps, but the final reduce of that key still lands
  *    on one task when the aggregate state is large, e.g.
  *    collect_list/distinct);
  *  - a shuffle join where ONE side's hot key can't be broadcast.
  *
  * Pattern: two-phase aggregation — salt the key with a deterministic
  * shard (hash of a tiebreak column, NOT rand(): reruns and the
  * correctness gate need identical results), aggregate per
  * (key, salt), then aggregate the partials per key.
  */
object Salting {

  /** Deterministic salt in [0, buckets) from a tiebreak column. */
  def salt(tiebreak: Column, buckets: Int): Column =
    pmod(hash(tiebreak), lit(buckets))

  /** Two-phase salted count/sum aggregation: returns one row per key
    * with `n` and `total` (sum of `valueCol`), computed via
    * (key, salt) partials so no single reducer sees a whole hot key. */
  def saltedAgg(df: DataFrame, keyCol: String, valueCol: String,
                tiebreakCol: String, buckets: Int = 16): DataFrame =
    df.withColumn("_salt", salt(col(tiebreakCol), buckets))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_sum"))
      .groupBy(col(keyCol))
      .agg(sum(col("_n")).as("n"), sum(col("_sum")).as("total"))

  /** Salted collect: gathers per-key values through (key, salt)
    * partial lists then flattens — the state-heavy aggregate shape
    * where salting actually matters (plain sum/count already does
    * map-side partials). */
  def saltedCollect(df: DataFrame, keyCol: String, valueCol: String,
                    tiebreakCol: String, buckets: Int = 16): DataFrame =
    df.withColumn("_salt", salt(col(tiebreakCol), buckets))
      .groupBy(col(keyCol), col("_salt"))
      .agg(collect_list(col(valueCol)).as("_part"))
      .groupBy(col(keyCol))
      .agg(array_sort(flatten(collect_list(col("_part")))).as("values"))

  /** Salted skew join: replicate the small side `buckets`× with an
    * explicit salt column, salt the big side deterministically, join
    * on (key, salt) — the hot key's rows spread over `buckets` tasks.
    * Use when the small side is too big to broadcast but the big side
    * has hot keys. */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCol: String,
                 bigTiebreakCol: String, buckets: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("_salt", salt(col(bigTiebreakCol), buckets))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(replicatedSmall, Seq(keyCol, "_salt")).drop("_salt")
  }
}
