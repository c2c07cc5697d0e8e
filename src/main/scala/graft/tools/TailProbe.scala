package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev tool: attribute the bench's fast-tail fixed cost (r21 verdict
  * item 5 — 146 keys × ~0.47 s ≈ 50% of the board). For each named
  * query, splits the wall into
  *   plan   — analysis + optimization + physical planning (explain)
  *   exec1  — first noop write (codegen compile + AQE + run)
  *   exec2  — second noop write (codegen cache warm; ≈ what the
  *            bench's min-of-2 reports)
  * and counts jobs / stages / tasks / executor-cpu for exec2, so the
  * fixed cost is attributable to scheduling floor vs planning vs
  * compute. sbt "runMain graft.tools.TailProbe <sfDir> <names...>"
  */
object TailProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.names.foreach(t =>
      graft.sources.Tables(spark, sfDir, t).limit(1).count())
    // warm the query-shape caches the way Bench does
    graft.SparkEntry.queries.get("q3_shipping_priority").foreach(q =>
      q(spark, sfDir).write.format("noop").mode("overwrite").save())

    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val cpuNs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null)
          cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
        ()
      }
    })

    def ms[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val tPlan = ms(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
      val tExec1 = ms(fn(spark, sfDir).write.format("noop")
        .mode("overwrite").save())
      jobs.set(0); stages.set(0); tasks.set(0); cpuNs.set(0)
      val tExec2 = ms(fn(spark, sfDir).write.format("noop")
        .mode("overwrite").save())
      Thread.sleep(300) // let the listener bus drain (it is async)
      println(f"TAIL $name plan=$tPlan%.0fms exec1=$tExec1%.0fms " +
        f"exec2=$tExec2%.0fms jobs=${jobs.get} stages=${stages.get} " +
        f"tasks=${tasks.get} taskcpu=${cpuNs.get / 1e6}%.0fms")
    }
    spark.stop()
  }
}
