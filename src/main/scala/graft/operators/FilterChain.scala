package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequential quality-filter funnel — the composition layer of a
  * training-data pipeline: an ordered chain of keep-predicates
  * (length floor, language, quality score, repetition cap, ...)
  * where each stage only sees the survivors of the previous one, and
  * the report is the per-stage funnel (docs in / removed / out) that
  * data curators read before committing a corpus cut.
  *
  * Scale shape: ONE scan. Cumulative pass-flags are plain boolean
  * Columns (`p1`, `p1 AND p2`, ...) folded into a single conditional
  * aggregation — never one job per stage, never a rescan of the
  * corpus. The result is `stages.length` rows built by `stack` from
  * the one aggregate row, so the whole funnel costs exactly one
  * partial-agg reduce of booleans regardless of corpus size. */
object FilterChain {

  /** The cumulative pass-flag count columns (`c0` = total, `cI` =
    * docs surviving stages 1..I) — shared by the batch [[funnel]] and
    * the streaming complete-mode variant
    * (streaming.StreamingPipeline.funnelStream). */
  def passCounts(stages: Seq[(String, Column)]): Seq[Column] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val cumulative = stages.scanLeft(lit(true)) {
      case (acc, (_, p)) => acc && p
    }.drop(1)
    count(lit(1)).as("c0") +:
      cumulative.zipWithIndex.map { case (c, i) =>
        count(when(c, lit(1))).as(s"c${i + 1}")
      }
  }

  /** @param stages ordered (name, keep-predicate) pairs; a doc enters
    *               stage i+1 only if every predicate up to i passed.
    * @return one row per stage: (stage_no, stage, docs_in,
    *         docs_removed, docs_out). */
  def funnel(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    val counts = passCounts(stages)
    val one = df.agg(counts.head, counts.tail: _*)
    val cells = stages.zipWithIndex.flatMap { case ((name, _), i) =>
      Seq(lit(i + 1), lit(name), col(s"c$i"),
        col(s"c$i") - col(s"c${i + 1}"), col(s"c${i + 1}"))
    }
    one.select(stack((lit(stages.length) +: cells): _*)
        .as(Seq("stage_no", "stage", "docs_in", "docs_removed", "docs_out")))
      .orderBy("stage_no")
  }
}
