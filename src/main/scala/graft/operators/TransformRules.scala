package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model._

/** The reference's rule engine re-expressed as plan-time Column
  * algebra (kassette-server processor/transformer.go:71-190
  * transformBatchPayload). The Go code loops rules per field per
  * record; here rules compile into the logical plan once, so Catalyst
  * pushes the FieldDelete filters into the scan and prunes hidden
  * columns out of the read schema.
  *
  * Order of application mirrors the reference: source conversion →
  * FIELDDELETING record filter → FIELDHIDING → FIELDMAP rename →
  * destination-schema projection.
  */
object TransformRules {

  /** System rules always appended (transformer.go:21-27). */
  val systemRules: Seq[Rule] = Seq(FieldHide("anonymousId"))

  def apply(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val all = rules ++ systemRules
    val deleted = all.collect { case FieldDelete(f, v) => (f, v) }
      .filter { case (f, _) => df.columns.contains(f) }
      .foldLeft(df) { case (d, (f, v)) =>
        // Typed compare per transformer.go:132-148: int rule-values
        // compare numerically, bools via "true"/"false", else string.
        // A plan-time string-cast compare reproduces all three.
        d.filter(!(col(f).cast(StringType) === lit(v)) || col(f).isNull)
      }
    val hidden = all.collect { case FieldHide(f) => f }
      .filter(deleted.columns.contains)
    val afterHide = if (hidden.isEmpty) deleted else deleted.drop(hidden: _*)
    all.collect { case FieldMap(from, to) => (from, to) }
      .filter { case (f, _) => afterHide.columns.contains(f) }
      .foldLeft(afterHide) { case (d, (f, t)) => d.withColumnRenamed(f, t) }
  }

  /** Destination-schema projection (transformer.go:150-177): only
    * fields present in the destination schema survive, each converted
    * with the Kassette cast semantics; conversion failure → null
    * (transformer.go:168-173). */
  def projectToSchema(df: DataFrame, schema: TableSchema): DataFrame = {
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val cols = schema.fields.collect {
      case SchemaField(name, ktype, _) if byName.contains(name) =>
        graft.functions.KassetteCasts.convert(col(name), byName(name), ktype).as(name)
    }
    df.select(cols: _*)
  }
}
