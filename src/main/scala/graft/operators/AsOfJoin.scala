package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — for each left row, the nearest right row in the same
  * key group: `backward` takes the latest right with `right.ts <=
  * left.ts` (attribution: purchase ← last prior view), `forward` the
  * earliest right with `right.ts >= left.ts` (follow-up: purchase →
  * next support ticket). The time-series join Spark has no native
  * operator for.
  *
  * Spark-first implementation: instead of a per-row range probe or a
  * range-condition join (which Spark plans as a broadcast/cartesian
  * range scan), both sides are UNIONED into one stream, shuffled once
  * on the key, and a running `last(..., ignoreNulls)` window carries
  * the nearest right payload into the left rows (scan ascending for
  * backward, descending for forward). Cost: ONE shuffle + sort per
  * key group, linear in total rows — survives 100 TB and arbitrary
  * time ranges; skew is bounded by a single key's row count
  * (AQE/salting applies).
  *
  * Tie semantics match DuckDB/kdb ASOF: right rows at ts == left.ts
  * are visible in BOTH directions (inclusive). When the right side
  * can hold several rows at the same (key, ts), pass `rightTiebreak`
  * — backward keeps the GREATEST tiebreak, forward the LEAST, making
  * the output deterministic across runs/partitionings.
  */
object AsOfJoin {

  /** Latest right row at or before each left row's ts.
    * @param rightPayload right columns to carry (key/ts excluded)
    * @param rightTiebreak right column that breaks ts ties
    *   deterministically (max wins); None = rely on unique right ts
    * @return left rows + `asof_<col>` for each payload col + `asof_ts`
    *   (`asof_ts` is epoch-MILLIS when `rightTsCol` is a timestamp,
    *   else the raw numeric value) */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
               leftTsCol: String, rightTsCol: String,
               rightPayload: Seq[String],
               rightTiebreak: Option[String] = None): DataFrame =
    unionScan(left, right, keyCol, leftTsCol, rightTsCol, rightPayload,
      rightTiebreak, descending = false)

  /** Earliest right row at or after each left row's ts (ties:
    * LEAST tiebreak wins). Same cost model as `backward`. */
  def forward(left: DataFrame, right: DataFrame, keyCol: String,
              leftTsCol: String, rightTsCol: String,
              rightPayload: Seq[String],
              rightTiebreak: Option[String] = None): DataFrame =
    unionScan(left, right, keyCol, leftTsCol, rightTsCol, rightPayload,
      rightTiebreak, descending = true)

  private def unionScan(left: DataFrame, right: DataFrame, keyCol: String,
                        leftTsCol: String, rightTsCol: String,
                        rightPayload: Seq[String],
                        rightTiebreak: Option[String],
                        descending: Boolean): DataFrame = {
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

    // Scan order: ts asc for backward / desc for forward; rights sort
    // before lefts inside a ts group so equal-ts rights are visible
    // (inclusive); the tiebreak orients so the running `last` keeps
    // the max (backward) / min (forward) tiebreak row — deterministic.
    val tsOrd = if (descending) col("_ts").desc else col("_ts").asc
    val tieOrd = if (descending) col("_tie").desc_nulls_first
                 else col("_tie").asc_nulls_first
    val w = Window.partitionBy("_key")
      .orderBy(tsOrd, col("_side"), tieOrd)
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
