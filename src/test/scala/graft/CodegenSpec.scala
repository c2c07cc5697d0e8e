package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Similarity
import graft.plans.DotProduct

/** Regression tests for generated-code hygiene.
  *
  * Round-2 bug: DotProduct.doGenCode used a literal loop variable `i`,
  * so any projection holding ≥2 dot products (multi-plane LSH bucket,
  * k-means assignment) failed janino compilation ("Redefinition of
  * local variable i") and Spark silently fell back to interpreted
  * projection — exactly the hot path the expression exists to fuse.
  * The first test goes through GenerateUnsafeProjection.generate,
  * which THROWS on compile failure instead of falling back, so a
  * reintroduced collision fails loudly; the second runs the real
  * lshBucket shape end-to-end and cross-checks the codegen'd values
  * against the interpreted HOF composition.
  */
class CodegenSpec extends SparkSpec {

  private def floatVec(xs: Float*): Literal =
    Literal.create(xs, ArrayType(FloatType))

  test("16 DotProducts compile into one generated projection") {
    // 4 tables × 4 planes — the real lshTopK projection shape. Distinct
    // literals per dot so common-subexpression elimination can't merge
    // them back into a single loop.
    val exprs: Seq[Expression] = (0 until 16).map { j =>
      DotProduct(floatVec(1.0f + j, 2.0f), floatVec(3.0f, 4.0f + j))
    }
    val proj = GenerateUnsafeProjection.generate(exprs)
    val row = proj(InternalRow.empty)
    (0 until 16).foreach { j =>
      val expected = (1.0 + j) * 3.0 + 2.0 * (4.0 + j)
      assert(row.getDouble(j) === expected)
    }
  }

  test("multi-plane lshBucket matches the interpreted HOF composition end-to-end") {
    import spark.implicits._
    import graft.functions.VectorFunctions
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 2.0f, 0.25f)),
      (2L, Array(-0.5f, 1.0f, -2.0f, -0.25f)),
      (3L, Array(3.0f, 0.5f, -0.75f, 1.5f))
    ).toDF("id", "_v")
    val tablePlanes = (0 until 4).map(t => Similarity.hyperplanes(4, 4, 42L + t))
    // 16 dot products in one projection via the codegen'd expression…
    val fused = df.select(col("id"), array(
      tablePlanes.map(p => Similarity.lshBucket(col("_v"), p)): _*).as("b"))
      .orderBy("id").collect().map(_.getSeq[Int](1))
    // …vs the builtin higher-order composition (interpreted reference)
    def hofBucket(p: Seq[Seq[Double]]) = p.zipWithIndex.map { case (h, j) =>
      (VectorFunctions.dotHof(col("_v"), array(h.map(lit): _*)) > 0)
        .cast("int") * lit(1 << j)
    }.reduce(_ + _)
    val ref = df.select(col("id"), array(
      tablePlanes.map(hofBucket): _*).as("b"))
      .orderBy("id").collect().map(_.getSeq[Int](1))
    assert(fused.toSeq == ref.toSeq)
  }

  test("multiple RepetitionStats compile into one generated projection") {
    import graft.plans.RepetitionStats
    val toks = Literal.create(Seq("a", "b", "a", "b", "a"), ArrayType(StringType))
    val exprs: Seq[Expression] =
      Seq(RepetitionStats(toks, 2, 2), RepetitionStats(toks, 2, 3),
        RepetitionStats(toks, 3, 2))
    val proj = GenerateUnsafeProjection.generate(exprs)
    val row = proj(InternalRow.empty)
    val st0 = row.getStruct(0, 3)
    // "a b" x2 tops; every bigram duplicates -> all 5 positions covered
    assert(st0.getLong(0) == 2L && st0.getUTF8String(1).toString == "a b")
    assert(st0.getInt(2) == 5)
  }

  test("multiple ClassifierMargins compile into one generated projection") {
    // the DotProduct freshName lesson applied to the classifier kernel:
    // distinct weight arrays per expression so CSE can't merge them
    import graft.plans.ClassifierMargin
    val toks = Literal.create(Seq("a", "b", "c"), ArrayType(StringType))
    val exprs: Seq[Expression] = (0 until 4).map { j =>
      ClassifierMargin(toks, IndexedSeq.fill(64)(0.25d * (j + 1)), 0.5d, bigrams = true)
    }
    val proj = GenerateUnsafeProjection.generate(exprs)
    val row = proj(InternalRow.empty)
    // all weights equal per expr → margin = w + bias regardless of hash
    (0 until 4).foreach { j =>
      assert(row.getDouble(j) === 0.25d * (j + 1) + 0.5d)
    }
    // and the bigram feature count divides correctly: 2*3-1 = 5 equal
    // contributions of w each → sum/5 = w exactly (checked above)
  }

  test("native RepetitionStats matches the HOF folds on real docs") {
    import graft.functions.{TextFunctions => T}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val native = docs.select(col("doc_id"),
        T.repetitionStats(col("t"), 2, 3).as("st"))
      .select(col("doc_id"), col("st.top_cnt"), col("st.top_gram"),
        col("st.dup_covered"))
      .orderBy("doc_id").collect().toSeq
    val hof = docs.select(col("doc_id"), T.topNgram(col("t"), 2).as("top"),
        T.dupNgramCoverage(col("t"), 3).as("cov"))
      .select(col("doc_id"), col("top.cnt"), col("top.gram"), col("cov"))
      .orderBy("doc_id").collect().toSeq
    assert(native == hof)
  }
}
