package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Dev tool: stage attribution for the t_classifier_score hot path.
  * History: the r15 HOF fold read 198 s for 500k docs (variant 9);
  * the r16 native kernel fed by builtin normalize+split read 38.5 s
  * (10b — tokenize-bound: variant 1 shows the regex pipeline alone
  * costs that), and the fully-fused string-child kernel reads 1.2 s
  * (10); variant 11 (three outputs) read 3× that while weights were
  * an Array — reference equality defeated CSE — motivating the
  * IndexedSeq change. Each variant
  * noop-writes the same corpus so the deltas isolate one layer.
  *   sbt "runMain graft.tools.ClassifierProbe <sfDir>"
  */
object ClassifierProbe {
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

    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").localCheckpoint(eager = true)
    val ws = T.classifierWeights(128)
    val w = typedlit(ws)

    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"PROBE $label cold ${(t1 - t0) / 1e9}%.2f warm ${(System.nanoTime() - t1) / 1e9}%.2f s")
    }

    val toks = split(T.normalize(col("text")), " ")

    time("0_scan_only")(docs.select(col("doc_id")))
    time("1_norm_split_size")(docs.select(col("doc_id"), size(toks).as("n")))
    time("2_fold_const")(docs.select(col("doc_id"),
      aggregate(toks, lit(0.0d), (acc, _) => acc + lit(1.0d)).as("s")))
    time("3_fold_md5bucket")(docs.select(col("doc_id"),
      aggregate(toks, lit(0.0d),
        (acc, t) => acc + T.featureBucket(t, 128).cast("double")).as("s")))
    time("4_fold_full_logit")(docs.select(col("doc_id"),
      T.classifierLogit(toks, ws, 0.05).as("lg")))
    time("5_three_outputs")(docs.select(col("doc_id"),
      T.classifierLogit(toks, ws, 0.05).as("m"),
      T.sigmoid6(T.classifierLogit(toks, ws, 0.05)).as("sc"),
      when(T.classifierLogit(toks, ws, 0.05) >= 0.0d, 1L).otherwise(0L).as("k")))
    time("6_transform_then_sum")(docs.select(col("doc_id"),
      aggregate(transform(toks,
          t => element_at(w, (T.featureBucket(t, 128) + 1L).cast("int"))),
        lit(0.0d), (acc, x) => acc + x).as("s")))
    time("8_native_margin_uni")(docs.select(col("doc_id"),
      T.classifierMargin(col("text"), ws, 0.05, bigrams = false).as("m")))
    val wsBig = T.classifierWeights(1024)
    time("9_hof_bigram_logit")(docs.select(col("doc_id"),
      T.classifierLogit(T.classifierFeatures(col("text")), wsBig, 0.05).as("m")))
    time("10_native_bigram_margin")(docs.select(col("doc_id"),
      T.classifierMargin(col("text"), wsBig, 0.05).as("m")))
    // the pre-fused formulation (array child: builtin normalize+split
    // feeds the kernel) — prices what fusing the tokenize bought
    time("10b_arraychild_margin")(docs.select(col("doc_id"),
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.plans.ClassifierMargin(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(
            split(T.normalize(col("text")), " ")),
          wsBig.toIndexedSeq, 0.05, bigrams = true)).as("m")))
    time("11_native_three_outputs")(docs.select(col("doc_id"),
      T.classifierMargin(col("text"), wsBig, 0.05).as("m"),
      T.sigmoid6(T.classifierMargin(col("text"), wsBig, 0.05)).as("sc"),
      when(T.classifierMargin(col("text"), wsBig, 0.05) >= 0.0d, 1L)
        .otherwise(0L).as("k")))
    time("7_explode_groupby")(
      docs.select(col("doc_id"), explode(toks).as("tok"))
        .select(col("doc_id"),
          element_at(w, (T.featureBucket(col("tok"), 128) + 1L).cast("int")).as("wt"))
        .groupBy("doc_id").agg(sum("wt").as("s")))

    spark.stop()
  }
}
