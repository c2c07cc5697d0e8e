package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.functions.{TextFunctions => T}

/** Data-mixing policy: temperature-sampled source weights and the
  * deterministic epoch-repeat materialization they imply — the
  * curate → mix → expand seam of an LLM-training-data pipeline
  * (the policy the reference's warehouse reports feed; weights
  * ∝ tokens^0.5, the standard temperature flattening that up-weights
  * small high-quality sources vs proportional sampling).
  *
  * Determinism discipline (shared with the `d_mix_weights` /
  * `d_epoch_expand` gate queries, which ride these builders): the
  * per-source √tokens is rounded(6) into DECIMAL so the normalizing
  * sum is exact and association-order-free; rates live in INTEGER
  * micro-rate units (1e-6) after ONE shared floor-rounding; per-doc
  * copy decisions compare a content-hash uniform in [0, 1e6) against
  * the fractional micro-rate — no rand(), no per-executor seed
  * drift, so a re-run (or a different engine) repeats every document
  * identically. Scale shape: one partial-agg shuffle to the
  * source-cardinality rates frame, which broadcasts; the expansion
  * itself is a row-local explode.
  */
object Mixing {

  /** Per-source mixture policy: `n_docs`, `n_tokens`, the normalized
    * temperature `weight`, and `rate_u` — the per-source sampling
    * rate in micro-units (1e-6) that spends `tokenBudget` across the
    * mixture (`rate_u` > 1e6 ⇒ the source is epoch-repeated; < 1e6 ⇒
    * deterministic subsampling). One partial agg + a broadcast scalar
    * join; output is source-cardinality (tiny at any corpus scale). */
  def sourceRates(docs: DataFrame, textCol: String, sourceCol: String,
                  tokenBudget: Double): DataFrame = {
    val per = docs
      .select(col(sourceCol).as("source"),
        T.wsTokenCount(col(textCol)).cast("long").as("toks"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
      .withColumn("s_tok",
        round(sqrt(col("n_tokens").cast(DoubleType)), 6).cast(DecimalType(18, 6)))
    val tot = per.agg(sum(col("s_tok")).as("tot_s"))
    val frac = col("s_tok").cast(DoubleType) / col("tot_s").cast(DoubleType)
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (floor(frac * 1e6 + 0.5) / 1e6).as("weight"),
        floor(lit(tokenBudget) * frac / col("n_tokens").cast(DoubleType) * 1e6 + 0.5)
          .cast("long").as("rate_u"))
  }

  /** Per-doc copy counts from a `sourceRates` frame: keeps every
    * input column and adds `n_copies` (≥ 0) — ⌊rate⌋ plus one more
    * iff the doc's content hash falls under the fractional
    * micro-rate. Row-local given the broadcast rates. */
  def epochCopies(docs: DataFrame, textCol: String, sourceCol: String,
                  rates: DataFrame): DataFrame =
    docs
      .withColumn("__u",
        Dedup.shingleHash(concat(lit("epoch:"), col(textCol))) % 1000000L)
      .join(broadcast(rates.select(col("source").as(sourceCol), col("rate_u"))),
        Seq(sourceCol))
      .withColumn("n_copies", expr("rate_u div 1000000")
        + when(col("__u") < col("rate_u") % 1000000L, lit(1L)).otherwise(lit(0L)))
      .drop("__u", "rate_u")

  /** The materialized epoch expansion: one row per (doc, epoch) with
    * `epoch` ∈ [0, n_copies). Row-local explode — the only shuffle in
    * a mix-then-expand plan is `sourceRates`' partial agg. */
  def expandEpochs(docs: DataFrame, textCol: String, sourceCol: String,
                   rates: DataFrame): DataFrame =
    epochCopies(docs, textCol, sourceCol, rates)
      .where(col("n_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("n_copies") - 1)))
      .drop("n_copies")
}
