package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Dev tool: wall-clock + plan attribution for Classifier.fit's
  * internal passes (feature build, margin pass, stats, gradient
  * join) under BOTH epoch-loop shapes (r20 checkpoint+broadcast vs
  * r21 persist+copartitioned join), so store-build regressions are
  * attributable to one pass instead of a whole fit.
  * sbt "runMain graft.tools.FitProbe <sfDir> [variant...]" */
object FitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val variants = if (args.length > 1) args.tail.toSet else Set("old", "new")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("FITPROBE_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = 8192
    val docs = graft.sources.Tables.documents(spark, sfDir).withColumn("_lbl",
      graft.operators.Classifier.langAgreeLabel(col("text"), col("lang")))
    docs.limit(1).count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"FITPROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val baseToks = split(TextFunctions.normalize(col("text")), " ")
    val toks = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.ClassifierFeatures(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(baseToks)))

    def featOld(): DataFrame = docs
      .select(col("doc_id").as("_id"), col("_lbl").cast("double").as("_y"),
        explode(toks).as("_tok"))
      .groupBy(col("_id"), col("_y"),
        TextFunctions.featureBucket(col("_tok"), d).as("_b"))
      .agg(count(lit(1)).cast("double").as("_cnt"))
      .withColumn("_ntok", sum(col("_cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("_id")))
      .repartition(col("_id"))
      .localCheckpoint(eager = true)

    def featNew(): DataFrame = docs
      .repartition(cpus.toInt, col("doc_id"))
      .select(col("doc_id").as("_id"), col("_lbl").cast("double").as("_y"),
        toks.as("_ta"))
      .select(col("_id"), col("_y"),
        size(col("_ta")).cast("double").as("_ntok"),
        explode(col("_ta")).as("_tok"))
      .groupBy(col("_id"), col("_y"), col("_ntok"),
        TextFunctions.featureBucket(col("_tok"), d).as("_b"))
      .agg(count(lit(1)).cast("double").as("_cnt"))
      .persist()

    def epochs(feat: DataFrame, variant: String, nEpochs: Int): Unit = {
      val n = feat.select(count_distinct(col("_id"))).head().getLong(0)
      var w = Array.fill(d)(0.0)
      var bias = 0.0
      for (e <- 0 until nEpochs) {
        val wb = org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.plans.BucketWeight(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("_b")),
            w.toIndexedSeq))
        val margins = feat.groupBy("_id")
          .agg((sum(col("_cnt") * wb)
              / first(col("_ntok")) + lit(bias)).as("_m"),
            first(col("_y")).as("_y"),
            first(col("_ntok")).as("_ntok"))
        val residBase = margins.select(col("_id"),
          (lit(1.0) / (lit(1.0) + exp(-col("_m"))) - col("_y")).as("_r"),
          (lit(1.0) / col("_ntok")).as("_inv"),
          (log(lit(1.0) + exp(-abs(col("_m")))) +
            when(col("_y") > 0.5, greatest(lit(0.0), -col("_m")))
              .otherwise(greatest(lit(0.0), col("_m")))).as("_ll"))
        if (variant == "old") {
          val (resid, rdds) = graft.operators.Dedup.withNewPersistentRdds(
            residBase.localCheckpoint(eager = true))
          try {
            val stats = time(s"old_e${e}_stats")(
              resid.agg(sum(col("_ll")), sum(col("_r"))).head())
            val grads = time(s"old_e${e}_grads")(
              feat.join(broadcast(resid.select("_id", "_r", "_inv")), "_id")
                .groupBy("_b")
                .agg(sum(col("_r") * col("_inv") * col("_cnt")).as("_g"))
                .collect().map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap)
            w = w.indices.map(b => w(b) - 8.0 * grads.getOrElse(b, 0.0) / n).toArray
            bias = bias - 8.0 * (stats.getDouble(1) / n)
          } finally rdds.foreach(_.unpersist(blocking = false))
        } else {
          val resid = residBase.persist()
          try {
            val stats = time(s"new_e${e}_stats")(
              resid.agg(sum(col("_ll")), sum(col("_r"))).head())
            val gradsDf = feat.join(
                resid.select("_id", "_r", "_inv").hint("shuffle_hash"), "_id")
              .groupBy("_b")
              .agg(sum(col("_r") * col("_inv") * col("_cnt")).as("_g"))
            if (e == 0) println(gradsDf.queryExecution.explainString(
              org.apache.spark.sql.execution.SimpleMode))
            val grads = time(s"new_e${e}_grads")(
              gradsDf.collect().map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap)
            w = w.indices.map(b => w(b) - 8.0 * grads.getOrElse(b, 0.0) / n).toArray
            bias = bias - 8.0 * (stats.getDouble(1) / n)
          } finally resid.unpersist(blocking = false)
        }
      }
    }

    if (variants("micro")) {
      val f = time("micro_feat_build")(featNew())
      val n = time("micro_count")(
        f.select(count_distinct(col("_id"))).head().getLong(0))
      println(s"micro n=$n rows=${time("micro_rows")(f.count())}")
      time("micro_noop_feat")(
        f.write.format("noop").mode("overwrite").save())
      time("micro_noop_feat2")(
        f.write.format("noop").mode("overwrite").save())
      val w = Array.fill(d)(0.001)
      val wb = org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.plans.BucketWeight(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("_b")),
          w.toIndexedSeq))
      val margins = f.groupBy("_id")
        .agg((sum(col("_cnt") * wb)
            / first(col("_ntok")) + lit(0.0)).as("_m"),
          first(col("_y")).as("_y"),
          first(col("_ntok")).as("_ntok"))
      time("micro_margins_noop")(
        margins.write.format("noop").mode("overwrite").save())
      time("micro_margins_noop2")(
        margins.write.format("noop").mode("overwrite").save())
      time("micro_stats")(
        margins.select(col("_id"), (col("_m") * col("_y")).as("_r"))
          .agg(sum(col("_r"))).head())
      time("micro_stats2")(
        margins.select(col("_id"), (col("_m") * col("_y")).as("_r"))
          .agg(sum(col("_r"))).head())
      // bisect the aggregate: plain sum, sum+wb, firsts only
      val aggPlain = f.groupBy("_id").agg(sum(col("_cnt")).as("_s"))
      time("micro_agg_plainsum")(
        aggPlain.write.format("noop").mode("overwrite").save())
      time("micro_agg_plainsum2")(
        aggPlain.write.format("noop").mode("overwrite").save())
      val aggWb = f.groupBy("_id").agg(sum(col("_cnt") * wb).as("_s"))
      time("micro_agg_wbsum")(
        aggWb.write.format("noop").mode("overwrite").save())
      time("micro_agg_wbsum2")(
        aggWb.write.format("noop").mode("overwrite").save())
      val aggFirsts = f.groupBy("_id").agg(
        first(col("_y")).as("_y"), first(col("_ntok")).as("_n"))
      time("micro_agg_firsts")(
        aggFirsts.write.format("noop").mode("overwrite").save())
      time("micro_agg_firsts2")(
        aggFirsts.write.format("noop").mode("overwrite").save())
      println(margins.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    if (variants("old")) {
      val f = time("old_feat_build")(featOld())
      println(s"old feat partitions=${f.rdd.getNumPartitions}")
      time("old_epochs_x4")(epochs(f, "old", 4))
    }
    if (variants("new")) {
      val f = time("new_feat_build")(featNew())
      println(s"new feat partitions=${f.rdd.getNumPartitions}")
      time("new_epochs_x4")(epochs(f, "new", 4))
    }
    spark.stop()
  }
}
