package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier
import graft.functions.TextFunctions
import graft.sources.Tables

/** The in-engine quality-classifier trainer (Classifier.fit): must be
  * (a) deterministic fit-to-fit (the dyadic snap absorbs distributed
  * accumulation-order noise), (b) convergent (mean logloss strictly
  * improves from init to final), (c) dyadic — every weight a multiple
  * of 2⁻²⁰ in [-8, 8], the exact-margin precondition — and (d)
  * consistent with the row-local scoring fold the gate queries run. */
class ClassifierSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)
    .withColumn("_lbl", Classifier.langAgreeLabel(col("text"), col("lang")))
    .localCheckpoint(eager = true)

  private lazy val fit =
    Classifier.fit(docs, "doc_id", "text", "_lbl",
      d = 128, epochs = 6, lr = 3.0)

  test("fit is deterministic: refitting yields bit-identical weights") {
    val again = Classifier.fit(docs, "doc_id", "text", "_lbl",
      d = 128, epochs = 6, lr = 3.0)
    assert(fit.weights.toSeq == again.weights.toSeq)
    assert(fit.bias == again.bias)
    assert(fit.losses.toSeq == again.losses.toSeq)
  }

  test("fit converges: mean logloss strictly improves and weights moved") {
    assert(fit.losses.length == 7) // init + one per epoch
    assert(fit.losses.last < fit.losses.head,
      s"no improvement: ${fit.losses.toSeq}")
    assert(fit.weights.exists(_ != 0.0), "all weights stayed zero")
  }

  test("weights are dyadic multiples of 2^-20 in [-8, 8]") {
    val grid = 1048576.0
    (fit.weights :+ fit.bias).foreach { w =>
      assert(w * grid == math.rint(w * grid), s"off-grid weight $w")
      assert(math.abs(w) <= 8.0, s"unclamped weight $w")
    }
  }

  test("trained weights score identically through the row-local fold") {
    // the gate path: classifierLogit's fold with the trained literals
    // must equal an explicit explode-and-sum of the same features —
    // the exactness claim (dyadic sums are order-free) made testable
    val toks = split(TextFunctions.normalize(col("text")), " ")
    val folded = docs.select(col("doc_id"),
      TextFunctions.classifierLogit(toks, fit.weightSeq, fit.bias).as("m"))
    val exploded = docs
      .select(col("doc_id"), explode(toks).as("tok"))
      .select(col("doc_id"),
        element_at(typedlit(fit.weightSeq),
          (TextFunctions.featureBucket(col("tok"), 128) + 1L).cast("int"))
          .as("w"))
      .groupBy("doc_id")
      .agg((sum("w") / count(lit(1)) + lit(fit.bias)).as("m"))
    val j = folded.join(exploded.withColumnRenamed("m", "m2"), "doc_id")
      .filter(col("m") =!= col("m2"))
    assert(j.count() == 0, "fold and explode margins disagree")
  }

  test("the seed label is non-degenerate on the spec corpus") {
    val byLbl = docs.groupBy("_lbl").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byLbl.getOrElse(1L, 0L) > 0, "no positive labels")
    assert(byLbl.getOrElse(0L, 0L) > 0, "no negative labels")
  }
}
