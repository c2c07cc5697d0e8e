package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (r22 fast-tail attribution): split each declared query's
  * driver-side fixed cost into
  *   build  — fn(spark, sfDir): DataFrame construction, which re-runs
  *            the analyzer once per eager Dataset transform (every
  *            withColumn chains a fresh analysis pass)
  *   plan   — optimizedPlan + executedPlan on the built frame
  * The bench pays build+plan TWICE per key (min-of-2 runs a fresh
  * fn() each time), so Σ 2·(build+plan) over the tail bounds what a
  * cheaper construction discipline could save.
  *   sbt "runMain graft.tools.ConstructProbe <sfDir> [names...]"
  * (no names = all declared queries, sorted)
  */
object ConstructProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
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
    def ms[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e6, a)
    }
    var totB = 0.0; var totP = 0.0
    val rows = for (name <- names) yield {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir) // warm (classloading, first-touch)
      val (tB, df) = ms(fn(spark, sfDir))
      val (tP, _) = ms(df.queryExecution.executedPlan)
      totB += tB; totP += tP
      (name, tB, tP)
    }
    rows.sortBy(-_._2).foreach { case (n, b, p) =>
      println(f"CONSTRUCT $n%-24s build=$b%7.1fms plan=$p%7.1fms")
    }
    println(f"CONSTRUCT_TOTAL n=${names.size} build=$totB%.0fms " +
      f"plan=$totP%.0fms perRun=${totB + totP}%.0fms " +
      f"boardCost(x2)=${2 * (totB + totP) / 1000}%.1fs")
    spark.stop()
  }
}
