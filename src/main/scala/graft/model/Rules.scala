package graft.model

/** Transformation rules — the reference's rule engine vocabulary
  * (kassette-server processor/transformer.go:16-35: TransType
  * FIELDMAP / FIELDHIDING / FIELDDELETING, TransformationRuleT).
  * Rules compile once into Column expressions (operators.TransformRules),
  * never evaluated row-by-row on the driver. */
sealed trait Rule
/** rename `from` → `to` (transformer.go:124-127) */
final case class FieldMap(from: String, to: String) extends Rule
/** drop the column (transformer.go:128-131; system rule hides
  * `anonymousId`, transformer.go:21-27) */
final case class FieldHide(field: String) extends Rule
/** drop the whole record when field == value, string-typed compare
  * per the reference's int/string/bool matching (transformer.go:132-148) */
final case class FieldDelete(field: String, value: String) extends Rule

/** Destination/source schema entry (integrations/types.go SchemaFieldT). */
final case class SchemaField(name: String, kassetteType: String, primaryKey: Boolean = false)
final case class TableSchema(tableName: String, fields: Seq[SchemaField])
