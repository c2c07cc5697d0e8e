package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns as pure
  * Column algebra (`zip_with`/`aggregate` are codegen'd higher-order
  * functions — no UDF, no serialization wall). Everything folds
  * left-to-right in doubles; consumers round before comparing across
  * engines. */
object VectorFunctions {

  /** array<float> → array<double> (exact widening). */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine rounded for cross-engine comparison (absorbs FP
    * association-order differences in the partial sums). */
  def cosineRounded(a: Column, b: Column, scale: Int = 6): Column =
    round(cosine(a, b), scale)

  /** Signed projection onto a constant hyperplane (for LSH bucketing). */
  def signBit(v: Column, hyperplane: Seq[Double]): Column = {
    val h = array(hyperplane.map(lit): _*)
    (aggregate(zip_with(v, h, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x) > 0).cast("int")
  }
}
