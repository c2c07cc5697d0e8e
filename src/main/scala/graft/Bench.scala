package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line per run (driver contract).
  * Session is warmed (codegen caches, parquet footers, broadcast
  * machinery) before any query is timed so the first query doesn't
  * absorb cold-start; queries run in sorted-name order for stable
  * attribution across rounds. */
object Bench {
  def main(args: Array[String]): Unit = {
    // optional args: time only the named queries/stores (dev spot-
    // checks while iterating on one plan; the driver passes none)
    val only = args.toSet
    def wanted(name: String): Boolean = only.isEmpty || only(name)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // load disclosure (r19 verdict #6): the 1-minute system load at
    // bench start, BEFORE this JVM adds its own — a board timed under
    // campaign load (the r19 _store drift) is self-describing instead
    // of needing a prose caveat. ≲ cpus/4 reads as idle at local[32].
    val load1Start = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: touch every table + exercise join/agg/window codegen
    try {
      graft.sources.Tables.names.foreach { t =>
        graft.sources.Tables(spark, sfDir, t).limit(1).count()
      }
      SparkEntry.queries.get("q3_shipping_priority").foreach(q =>
        q(spark, sfDir).write.format("noop").mode("overwrite").save())
    } catch { case _: Throwable => () }

    // Family session stores (minhash signatures/pairs, shingle
    // overlap, kmeans cells) build ONCE per session; time them as
    // explicit `_store_*` keys so the queries that share them report
    // marginal cost instead of whichever runs first absorbing the
    // build. Store keys are min-of-2 like the queries, but COLD both
    // runs (clearStore before each) — a memo hit would time a map
    // lookup, and single-run store numbers were the noisiest rows
    // left in the round-8 bench.
    val stores = graft.queries.LlmData.storeBuilders.toSeq.sortBy(_._1)
      .filter { case (name, _) => wanted(name) }
      .map { case (name, fn) =>
        def coldOnce(): (Double, Boolean) = {
          graft.operators.Dedup.clearStore()
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir); true } catch {
            case t: Throwable =>
              System.err.println(s"BENCH FAIL $name: ${t.getClass.getName}: ${t.getMessage}")
              false
          }
          ((System.nanoTime() - t0) / 1e9, ok)
        }
        val (t1, ok1) = coldOnce()
        val best = if (ok1) { val (t2, _) = coldOnce(); math.min(t1, t2) } else t1
        (name, best, ok1)
      }
    // the clears above dropped the earlier families' memos — rebuild
    // untimed so every family query below reports MARGINAL cost (its
    // min-of-2 is warm-store by design: that is the per-query cost a
    // session that built the store once actually pays).
    // SPARK_GRAFT_REBUILD_STORES=named (opt-in, N×-campaign subset
    // runs): rebuild only the stores named in args — at 1000× the
    // rebuild-all loop pays ~20 min for stores (shingle overlap,
    // minhash) no key in the subset reads. The caller then owns
    // naming EVERY store its subset queries consume, or those
    // queries absorb the build into their min-of-2.
    val rebuildNamed =
      sys.env.get("SPARK_GRAFT_REBUILD_STORES").contains("named")
    graft.queries.LlmData.storeBuilders.iterator
      .filter { case (n, _) => !(rebuildNamed && only.nonEmpty) || only(n) }
      .foreach { case (_, fn) =>
        try fn(spark, sfDir) catch { case _: Throwable => () } }

    // (name, seconds, ok) — a throwing query is NOT swallowed into a
    // normal-looking time: it is reported by name in "failed" and its
    // stack goes to stderr for diagnosis.
    // Forcing matters: count() lets Catalyst prune projection-only
    // columns and eliminate cardinality-preserving joins, so a query
    // whose cost lives in its output expressions times near-zero. The
    // noop sink materializes EVERY output column (what Verify pays
    // when it writes parquet) without write-side I/O in the number.
    // Each query runs TWICE and reports the min: two rounds of judge
    // time went to phantom regressions that were one-off scheduler /
    // GC hiccups on the shared driver machine — min-of-2 keeps the
    // number attributable to the plan, not the machine.
    // Partition-less Window tally: a window with an empty partition
    // spec sorts its whole input on ONE task — the classic silent
    // scale-killer. Counted from the OPTIMIZED logical plan (stable
    // pre-AQE) per distinct query and reported as n_window_nopart in
    // the JSON line, so the audit survives stdout-tail truncation
    // (the r12 verdict's adjudicability note). q33's bounded
    // daily-agg window is the one documented deliberate case.
    var windowNoPart = 0
    val results = stores ++ SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => wanted(name) }
      .map { case (name, fn) =>
      def once(audit: Boolean): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok = try {
          val df = fn(spark, sfDir)
          if (audit) windowNoPart += df.queryExecution.optimizedPlan.collect {
            case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
          }.size
          df.write.format("noop").mode("overwrite").save(); true
        } catch {
          case t: Throwable =>
            System.err.println(s"BENCH FAIL $name: ${t.getClass.getName}: ${t.getMessage}")
            false
        }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (t1, ok1) = once(audit = true)
      if (!ok1) (name, t1, false)
      else { val (t2, _) = once(audit = false); (name, math.min(t1, t2), true) }
    }
    // The driver captures only the LAST 2000 chars of stdout (round-1's
    // full-precision 2.7k-char line was cut mid-line → parsed:null), and
    // sbt used to append its own "[success]" line after ours (disabled
    // in build.sbt). Keep the whole JSON line comfortably inside that
    // window: per-query entries only for queries ≥ 0.25 s, with the
    // fast tail reported in aggregate (n_fast/fast_total) so nothing is
    // silently dropped from the total.
    def s2(v: Double): String = f"$v%.2f"
    val failed = results.collect { case (n, _, false) => n }
    val times = results.map { case (n, v, _) => (n, v) }
    val total = if (times.nonEmpty) times.map(_._2).sum else 0.0
    def render(cutoff: Double): String = {
      val (big, fast) = times.partition(_._2 >= cutoff)
      val qs = big.map { case (k, v) => "\"" + k + "\":" + s2(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${s2(total)},"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")},"queries":$qs,"n_fast":${fast.size},"fast_total":${s2(fast.map(_._2).sum)},"n_window_nopart":$windowNoPart,"load1_start":${s2(load1Start)},"sf":"$sfDir"}"""
    }
    // Adaptive cutoff: raise the per-query reporting threshold until
    // the line fits the driver's 2000-char stdout tail with headroom
    // (the total/n_fast/fast_total aggregates keep full coverage).
    val line = Seq(0.25, 0.5, 1.0, 2.0, 5.0).map(render)
      .find(_.length <= 1900).getOrElse(render(Double.MaxValue))
    // Belt-and-braces for consumers that miss the stdout line: the
    // UNTRUNCATED per-query JSON lands in BENCH_local.json next to the
    // build (files have no tail window).
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_local.json"),
        (render(0.0) + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    spark.stop()
    // Printed AFTER spark.stop() so no executor/log line can land
    // between this and process exit: the JSON is the last stdout line.
    println(line)
    System.out.flush()
  }
}
