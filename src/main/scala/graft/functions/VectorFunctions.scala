package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.plans.DotProduct

/** Dense-vector math over `array<float>`/`array<double>` embedding
  * columns. The dot product is a custom codegen'd Catalyst expression
  * (graft.plans.DotProduct) — the builtin higher-order-function
  * composition is CodegenFallback and allocates per row, which is the
  * hot loop of every similarity operator. Float elements are widened
  * to double before multiply, matching the DuckDB oracle's
  * `CAST(x AS DOUBLE)` exactly. */
object VectorFunctions {

  /** array<float> → array<double> (exact widening; rarely needed now
    * that DotProduct reads float arrays in place). */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Fused codegen'd dot product. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Nearest-centroid assignment (argmin ‖v−c‖²) as ONE native
    * expression carrying the trained centroid matrix by reference —
    * codegen-stable at any cell count (the Column-algebra form
    * inlines k·dim literals and blows janino's 64 KB limit at the
    * √n reindex cell counts; see graft.plans.NearestCell). */
  def nearestCell(v: Column, cents: Seq[Seq[Double]],
                  replayExact: Boolean): Column =
    ColumnBridge.column(graft.plans.NearestCell(
      ColumnBridge.expression(v),
      cents.map(_.toIndexedSeq).toIndexedSeq, replayExact))

  /** Two-level (hierarchical) nearest-cell assignment: group argmin
    * over ~√k group centroids, then cell argmin restricted to the
    * winning group's members — O(√k) per row instead of O(k); see
    * graft.plans.TwoLevelCell for the semantics contract. */
  def twoLevelCell(v: Column, groupCents: Seq[Seq[Double]],
                   members: Seq[Seq[Int]], cents: Seq[Seq[Double]],
                   replayExact: Boolean): Column =
    ColumnBridge.column(graft.plans.TwoLevelCell(
      ColumnBridge.expression(v),
      groupCents.map(_.toIndexedSeq).toIndexedSeq,
      members.map(_.toIndexedSeq).toIndexedSeq,
      cents.map(_.toIndexedSeq).toIndexedSeq, replayExact))

  /** Reference composition (CodegenFallback path) — kept for
    * cross-checking the custom expression in tests. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine from precomputed norms — use when norms are projected
    * once per row instead of once per pair. */
  def cosineWithNorms(dotCol: Column, normA: Column, normB: Column,
                      scale: Int = 6): Column =
    round(dotCol / (normA * normB), scale)

  /** Cosine rounded for cross-engine comparison (absorbs FP
    * association-order differences in the partial sums). */
  def cosineRounded(a: Column, b: Column, scale: Int = 6): Column =
    round(cosine(a, b), scale)

  /** Signed projection onto a constant hyperplane (for LSH bucketing). */
  def signBit(v: Column, hyperplane: Seq[Double]): Column =
    (dot(v, array(hyperplane.map(lit): _*)) > 0).cast("int")
}
