package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: stage-attribute the m_audio_real wall (210.8 s at 100×
  * in BENCH_100x_r16 — the board's #2 recurring key after the
  * deliberate exact-pair baseline). Stages, each a noop write over
  * the same corpus:
  *   1. id scan only;
  *   2. the WAV GENERATOR (direct RIFF header assembly — post-8018553);
  *   3. generator + AudioSystem.getAudioInputStream OPEN ONLY (the
  *      javax.sound provider scan per record, format check, close) —
  *      isolates the decoder-dispatch cost from the sample loop;
  *   4. the full decode (audioChunksReal — open + readAllBytes + the
  *      per-sample chunk fold).
  *   sbt "runMain graft.tools.AudioProbe [sfDir]"
  */
object AudioProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf_x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"PROBE $label cold ${(t1 - t0) / 1e9}%.2f warm ${(System.nanoTime() - t1) / 1e9}%.2f s")
    }

    val media = graft.queries.LlmData.audioPayloadProbe(spark, sfDir)

    time("0_ids_only")(
      graft.sources.Tables.documents(spark, sfDir).select("doc_id"))
    time("1_generator")(media.toDF())
    time("2_gen_plus_open_only") {
      import org.apache.spark.sql.Encoders
      media.mapPartitions { it =>
        it.map { r =>
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          val rate = math.round(in.getFormat.getSampleRate).toLong
          in.close()
          rate
        }
      }(Encoders.scalaLong).toDF()
    }
    time("3_full_decode")(
      graft.operators.Multimodal.audioChunksReal(media, chunkMs = 50).toDF())
    spark.stop()
  }
}
