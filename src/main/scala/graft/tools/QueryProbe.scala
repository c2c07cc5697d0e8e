package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: time named gate queries in isolation (cold + warm) —
  * the controlled re-run used to adjudicate driver-bench noise.
  *   sbt "runMain graft.tools.QueryProbe <sfDir> <name> [name...]"
  */
object QueryProbe {
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
    for (name <- names; fn = graft.SparkEntry.queries(name); run <- 1 to 3) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"QPROBE $name run$run ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
