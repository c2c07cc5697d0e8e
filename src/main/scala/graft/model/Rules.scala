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

object Rule {
  /** Parse a `connection.transforms` JSONB array (configdb.go:167) of
    * TransformationRuleT objects (transformer.go:29-35: {type, from,
    * to, field, value}; TransType values field_map / field_hide /
    * field_delete). Rule objects are flat control-plane JSON, so a
    * depth-scan split + per-key extraction suffices; unknown types are
    * skipped like the reference's switch default. */
  def fromJson(json: String): Seq[Rule] = {
    def str(item: String, k: String): Option[String] =
      (s""""$k"\\s*:\\s*"((?:[^"\\\\]|\\\\.)*)"""").r.findFirstMatchIn(item)
        .map(_.group(1))
    splitObjects(json).flatMap { item =>
      str(item, "type") match {
        case Some("field_map") =>
          for (f <- str(item, "from"); t <- str(item, "to")) yield FieldMap(f, t)
        case Some("field_hide") => str(item, "field").map(FieldHide)
        case Some("field_delete") =>
          for (f <- str(item, "field"); v <- str(item, "value"))
            yield FieldDelete(f, v)
        case _ => None
      }
    }
  }

  /** Top-level `{...}` elements of a JSON array (string-aware). */
  private def splitObjects(s0: String): Seq[String] = {
    val s = s0.trim
    if (s.isEmpty || s == "[]" || s == "null") return Seq.empty
    val out = Seq.newBuilder[String]
    var depth = 0; var inStr = false; var esc = false; var start = -1
    for (i <- s.indices) {
      val c = s.charAt(i)
      if (esc) esc = false
      else if (inStr) { if (c == '\\') esc = true else if (c == '"') inStr = false }
      else c match {
        case '"' => inStr = true
        case '{' => if (depth == 0) start = i; depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0 && start >= 0) { out += s.substring(start, i + 1); start = -1 }
        case _ =>
      }
    }
    out.result()
  }
}

/** Destination/source schema entry (integrations/types.go SchemaFieldT). */
final case class SchemaField(name: String, kassetteType: String, primaryKey: Boolean = false)
final case class TableSchema(tableName: String, fields: Seq[SchemaField])
