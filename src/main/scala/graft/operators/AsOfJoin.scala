package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the latest right row with
  * `right.ts <= left.ts` in the same key group (the time-series join
  * Spark has no native operator for).
  *
  * Spark-first implementation: instead of a per-row range probe or a
  * range-condition join (which Spark plans as a broadcast/cartesian
  * range scan), both sides are UNIONED into one stream, shuffled once
  * on the key, and a running `last(..., ignoreNulls)` window carries
  * the most recent right payload forward into subsequent left rows.
  * Cost: ONE shuffle + sort per key group, linear in total rows —
  * survives 100 TB and arbitrary time ranges; skew is bounded by a
  * single key's row count (AQE/salting applies).
  *
  * Tie semantics match DuckDB/kdb ASOF: right rows at ts == left.ts
  * are visible (right sorts before left at equal ts). When the right
  * side can hold several rows at the same (key, ts), pass
  * `rightTiebreak` — the row with the GREATEST tiebreak value wins,
  * making the output deterministic across runs/partitionings.
  */
object AsOfJoin {

  /** @param rightPayload right columns to carry (key/ts excluded)
    * @param rightTiebreak right column that breaks ts ties
    *   deterministically (max wins); None = rely on unique right ts
    * @return left rows + `asof_<col>` for each payload col + `asof_ts`
    *   (`asof_ts` is epoch-MILLIS when `rightTsCol` is a timestamp,
    *   else the raw numeric value) */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
               leftTsCol: String, rightTsCol: String,
               rightPayload: Seq[String],
               rightTiebreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // normalize timestamp right-ts to epoch-ms so asof_ts units don't
    // silently depend on the input type (TimestampType.cast(long) is
    // epoch-SECONDS in Spark)
    val rTsOut: Column = right.schema(rightTsCol).dataType match {
      case _: org.apache.spark.sql.types.TimestampType => unix_millis(col(rightTsCol))
      case _ => col(rightTsCol).cast("long")
    }
    // tiebreak keeps its native type (an ANSI string→long cast would
    // throw); the null side just needs a matching type for the union
    val tieType = rightTiebreak.map(c => right.schema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.LongType)
    // aligned union schema: key, _ts, _side, _tie, left payload, right payload
    val lNorm = left
      .withColumn("_ts", col(leftTsCol))
      .withColumn("_side", lit(1))
      .select(Seq(col(keyCol).as("_key"), col("_ts"), col("_side"),
        lit(null).cast(tieType).as("_tie")) ++
        leftCols.filterNot(_ == keyCol).map(col) ++
        rightPayload.map(c => lit(null).as(s"_r_$c")) :+
        lit(null).cast("long").as("_r_ts"): _*)
    val rNorm = right
      .withColumn("_ts", col(rightTsCol))
      .withColumn("_side", lit(0))
      .select(Seq(col(keyCol).as("_key"), col("_ts"), col("_side"),
        rightTiebreak.map(col).getOrElse(lit(null).cast(tieType)).as("_tie")) ++
        leftCols.filterNot(_ == keyCol).map(c => lit(null).as(c)) ++
        rightPayload.map(c => col(c).as(s"_r_$c")) :+
        rTsOut.as("_r_ts"): _*)

    // right ties sort ascending on _tie, so the running `last` carries
    // the max-tiebreak row forward — deterministic at equal ts
    val w = Window.partitionBy("_key")
      .orderBy(col("_ts"), col("_side"), col("_tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lNorm.unionByName(rNorm)
      .select((col("_key") +: col("_ts") +: col("_side") +:
        (leftCols.filterNot(_ == keyCol).map(col) ++
          rightPayload.map(c => last(col(s"_r_$c"), ignoreNulls = true).over(w).as(s"asof_$c")) :+
          last(col("_r_ts"), ignoreNulls = true).over(w).as("asof_ts"))): _*)
      .filter(col("_side") === 1)
      .withColumnRenamed("_key", keyCol)
      .drop("_side", "_ts")
  }
}
