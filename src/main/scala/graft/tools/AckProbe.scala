package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage probe for p_ack_ledger cost attribution. */
object AckProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.names.foreach { t =>
      graft.sources.Tables(spark, sfDir, t).limit(1).count()
    }
    import graft.operators.Router
    import graft.sources.Tables
    for (run <- 1 to 3) {
      var t0 = System.nanoTime()
      def lap(l: String): Unit = {
        println(f"ACK $l run$run ${(System.nanoTime() - t0) / 1e9}%.3f s")
        t0 = System.nanoTime()
      }
      val bs = Router.batchSummary(Tables.events(spark, sfDir),
        "event_type", "event_id", size = 50)
      bs.write.format("noop").mode("overwrite").save()
      lap("batchSummary_noop")
      val env = Router.batchSummary(Tables.events(spark, sfDir),
        "event_type", "event_id", size = 50).localCheckpoint(eager = true)
      lap("batchSummary_ckpt")
      val acks = env.select(col("event_type"), col("batch_id"),
          col("first_id"), col("last_id"),
          (lit(1) + col("first_id") % 3).cast("int").as("n_att"))
        .withColumn("attempt", explode(sequence(lit(1), col("n_att"))))
        .select(col("event_type"), col("batch_id"), col("attempt"),
          when(col("attempt") < col("n_att"), 503)
            .when(col("first_id") % 10 < 7, 200)
            .when(col("first_id") % 10 < 9, 503)
            .otherwise(400).as("code"),
          (col("last_id") * lit(1000L) + col("attempt") * lit(1000L)).as("ack_ms"))
      Router.ackLedger(env, acks, Seq("event_type", "batch_id"),
          attemptCol = "attempt", codeCol = "code", ackTsMsCol = "ack_ms",
          maxRetry = 3, baseBackoffMs = 1000L)
        .select("event_type", "batch_id", "n_in_batch", "first_id", "last_id",
          "n_attempts", "last_code", "state", "next_retry_ms")
        .orderBy("event_type", "batch_id")
        .write.format("noop").mode("overwrite").save()
      lap("ledger_tail")
      env.unpersist()
    }
    spark.stop()
  }
}
