package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (time-band) join — every right row with `right.ts ∈
  * [left.ts − before, left.ts + after]` in the same key group: the
  * all-matches companion to AsOfJoin's nearest-match (attribution
  * windows, co-occurrence mining, stream-stream joins in batch).
  *
  * Spark-first scale shape: a naive `ON key AND ts BETWEEN …` plans
  * as an equi-join on key with a post-filter — correct, but one huge
  * key partitions the whole range onto one task. Here the LEFT side
  * explodes to the (≤ ⌈(before+after)/bucket⌉+1, i.e. 2–3) time
  * buckets its window spans and the join key becomes (key, bucket):
  * the shuffle spreads each key across its time range, skew is
  * bounded by events-per-bucket, and the band predicate only runs
  * within matching buckets. Bucket width = before+after keeps the
  * expansion factor ≤ 2 regardless of parameters.
  */
object IntervalJoin {

  /** @param rightPayload right columns carried (prefixed `r_`)
    * @return left rows × matching right rows (inner; left rows with
    *   no match drop — wrap with a left join downstream if needed) */
  def bucketed(left: DataFrame, right: DataFrame, keyCol: String,
               leftTsCol: String, rightTsCol: String,
               beforeMs: Long, afterMs: Long,
               rightPayload: Seq[String]): DataFrame = {
    require(beforeMs >= 0 && afterMs >= 0 && beforeMs + afterMs > 0,
      "interval must be non-empty")
    val bucketMs = beforeMs + afterMs
    // integer floor division (div) — a double divide + cast truncates
    // toward zero, which disagrees with floor for negative timestamps
    val l = left.withColumn("_b",
      explode(sequence(
        expr(s"($leftTsCol - $beforeMs) div $bucketMs"),
        expr(s"($leftTsCol + $afterMs) div $bucketMs"))))
    val r = right
      .select(Seq(col(keyCol), col(rightTsCol).as("_rts")) ++
        rightPayload.map(c => col(c).as(s"r_$c")): _*)
      .withColumn("_b", expr(s"_rts div $bucketMs"))
    l.join(r, Seq(keyCol, "_b"))
      .filter(col("_rts") >= col(leftTsCol) - beforeMs &&
        col("_rts") <= col(leftTsCol) + afterMs)
      .drop("_b")
  }
}
