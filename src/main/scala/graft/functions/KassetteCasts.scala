package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Kassette type system as Column algebra.
  *
  * The reference implements per-catalogue `Convert(v, type)` coercions
  * (kassette-server integrations/{postgres,powerbi,anaplan}/transformer.go,
  * sources/{camunda,postgres}/transformer.go). Exact semantics
  * preserved:
  *  - toInt: bool→1/0; string→parsed or null (Go Atoi failure → drop);
  *    float→truncation toward zero (Go int(f)); int→identity.
  *  - toFloat: bool→1/0; string→parsed or null; numeric→widen.
  *  - toBool: string == "true" (anything else false); bool→identity;
  *    other types → null (Go returns ok=false).
  *  - toString: Go `%v` ≈ SQL cast-to-string.
  *  - toDateTime/toDate: RFC3339-milli formatting
  *    ("2006-01-02T15:04:05.000Z", postgres/transformer.go:77).
  *
  * Everything is `org.apache.spark.sql.functions` composition —
  * whole-stage-codegen'd, no UDFs. Dispatch on the *source* DataType
  * happens at plan time (the reference dispatches on Go runtime type;
  * Spark knows the column type statically).
  */
object KassetteCasts {

  def toInt(c: Column, dt: DataType): Column = dt match {
    case BooleanType => when(c, 1L).otherwise(0L)
    // try_cast: null on parse failure == Convert ok=false (ANSI-safe)
    case StringType => c.try_cast(LongType)
    // Go int(float) truncates toward zero; Spark double→long matches
    case _: NumericType => c.cast(LongType)
    case _ => lit(null).cast(LongType)
  }

  def toFloat(c: Column, dt: DataType): Column = dt match {
    case BooleanType => when(c, 1.0d).otherwise(0.0d)
    case StringType => c.try_cast(DoubleType)
    case _: NumericType => c.cast(DoubleType)
    case _ => lit(null).cast(DoubleType)
  }

  def toBool(c: Column, dt: DataType): Column = dt match {
    case BooleanType => c
    case StringType => c === "true"
    case _ => lit(null).cast(BooleanType)
  }

  def toStringCol(c: Column): Column = c.cast(StringType)

  /** RFC3339 with milli precision — the reference's wire format
    * ("2006-01-02T15:04:05.000Z"). */
  def toDateTime(c: Column): Column =
    date_format(c.cast(TimestampType), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")

  def toDate(c: Column): Column =
    date_format(c.cast(TimestampType), "yyyy-MM-dd")

  /** Convert dispatch by Kassette catalogue type name
    * (sources/types.go TypeMapKassetteToSrc: INT/FLOAT/BOOLEAN/STRING/
    * TIMESTAMP/DATE). */
  def convert(c: Column, srcType: DataType, kassetteType: String): Column =
    kassetteType.toUpperCase match {
      case "INT" | "INT64" => toInt(c, srcType)
      case "FLOAT" | "FLOAT64" | "NUMBER" => toFloat(c, srcType)
      case "BOOLEAN" | "BOOL" => toBool(c, srcType)
      case "STRING" | "TEXT" => toStringCol(c)
      case "TIMESTAMP" | "DATETIME" => toDateTime(c)
      case "DATE" => toDate(c)
      case _ => lit(null)
    }
}
