package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted plans for representative queries and greps the
  * scale-relevant facts: PushedFilters reaching the scan, pruned
  * ReadSchema, broadcast joins on dims, WholeStageCodegen spans.
  *   sbt "runMain graft.tools.ExplainAudit [sfDir] [name...]"
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q3_shipping_priority", "q6_revenue_delta", "q5_local_supplier",
        "p_sessionize", "d_minhash_lsh", "s_cosine_topk",
        "t_repetition", "d_substr_dup", "t_filter_chain", "d_semdedup",
        "p_scd2", "p_salted_agg", "d_bloom_contam", "t_zipf")
    val spark = graft.GraftSession.get()
    // GRAFT_EXPLAIN_EXEC=1: execute the frame first so the printed
    // plan is AQE's FINAL one (isFinalPlan=true) — ReusedExchange /
    // coalesced reads only appear there, never in the static plan
    val exec = sys.env.get("GRAFT_EXPLAIN_EXEC").contains("1")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = graft.SparkEntry.queries(n)(spark, sf)
      if (exec) df.collect()
      val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      println(plan)
      val facts = plan.linesIterator.filter(l =>
        l.contains("PushedFilters") || l.contains("ReadSchema") ||
        l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin") ||
        l.contains("WholeStageCodegen")).toSeq
      println(s"---- facts: ${facts.size} lines")
    }
    spark.stop()
  }
}
