package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model._
import graft.operators.TransformRules
import graft.functions.KassetteCasts

class TransformRulesSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "click", 10.5, "anon-1"),
    (2L, "error", 2.0, "anon-2"),
    (3L, "true", 7.25, "anon-3"))
    .toDF("id", "etype", "amount", "anonymousId")

  test("FieldMap renames, FieldHide drops, system rule hides anonymousId") {
    val out = TransformRules(df, Seq(FieldMap("etype", "action"), FieldHide("amount")))
    assert(out.columns.toSeq == Seq("id", "action"))
    assert(out.count() == 3)
  }

  test("FieldDelete drops matching records (typed string compare)") {
    val out = TransformRules(df, Seq(FieldDelete("etype", "error")))
    assert(out.select("etype").as[String].collect().toSet == Set("click", "true"))
  }

  test("dest-schema projection keeps only schema fields with casts") {
    val out = TransformRules.projectToSchema(df, TableSchema("t", Seq(
      SchemaField("id", "INT"), SchemaField("amount", "STRING"))))
    assert(out.columns.toSeq == Seq("id", "amount"))
    assert(out.schema("amount").dataType == StringType)
  }

  test("Kassette cast semantics match the reference converters") {
    val r = spark.range(1).select(
      KassetteCasts.toInt(lit(true), BooleanType).as("b2i"),
      KassetteCasts.toInt(lit("12"), StringType).as("s2i"),
      KassetteCasts.toInt(lit("nope"), StringType).as("bad2i"),
      KassetteCasts.toInt(lit(9.99), DoubleType).as("f2i"),
      KassetteCasts.toBool(lit("true"), StringType).as("s2b"),
      KassetteCasts.toBool(lit("TRUE"), StringType).as("s2bx"),
      KassetteCasts.toFloat(lit(false), BooleanType).as("b2f")).head()
    assert(r.getLong(0) == 1L)
    assert(r.getLong(1) == 12L)
    assert(r.isNullAt(2)) // Atoi failure -> dropped/null
    assert(r.getLong(3) == 9L) // truncation toward zero
    assert(r.getBoolean(4))
    assert(!r.getBoolean(5)) // only lowercase "true" is true
    assert(r.getDouble(6) == 0.0)
  }
}
