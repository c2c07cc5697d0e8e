package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}
import graft.operators.Classifier
import graft.sources.Tables

/** Dev probe: held-out val AUC / calibrated-cut accuracy of the
  * quality classifier across (d, epochs, lr, bigrams) configs — the
  * measurement behind the t_classifier_val floor choice. Mirrors the
  * gate's split (md5 'cvsplit:' bucket 0 = val) and label exactly.
  *   sbt "runMain graft.tools.ValProbe [sfDir]"
  */
object ValProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val vb = graft.operators.Dedup.shingleHash(
      concat(lit("cvsplit:"), col("text"))) % 5
    val docs = Tables.documents(spark, sf).withColumn("_lbl",
        Classifier.langAgreeLabel(col("text"), col("lang")))
      .localCheckpoint(eager = true)
    val train = docs.filter(vb =!= 0)
    val valDs = docs.filter(vb === 0)

    // char n-gram stream over the normalized text INCLUDING spaces
    // (word boundaries carry signal for the langid-shaped seed task —
    // the fastText langid recipe); short docs degrade to one whole-
    // string feature. Probe-only Column algebra (HOF-slow is fine at
    // sf0.01); a winning family earns kernel + oracle plumbing.
    def charGrams(n: Int): org.apache.spark.sql.Column = {
      val norm = T.normalize(col("text"))
      transform(sequence(lit(1), greatest(length(norm) - (n - 1), lit(1))),
        i => norm.substr(i, lit(n)))
    }

    def evalCfg(d: Int, epochs: Int, lr: Double, bigrams: Boolean,
                label: String = "word",
                feats: Option[org.apache.spark.sql.Column] = None): Unit = {
      val t0 = System.nanoTime()
      val fit = Classifier.fit(train, "doc_id", "text", "_lbl",
        d = d, epochs = epochs, lr = lr, trainMod = 1, bigrams = bigrams,
        featsCol = feats)
      val lg = feats match {
        case Some(f) => T.classifierLogit(f, fit.weightSeq, fit.bias)
        case None => T.classifierMargin(col("text"), fit.weightSeq,
          fit.bias, bigrams = bigrams)
      }
      val cut = Classifier.calibrateCut(
        train.select(lg.as("m"), col("_lbl").as("y")), "m", "y")
      val rows = valDs.select(lg.as("m"), col("_lbl").cast("long").as("y"))
        .collect().map(r => (r.getDouble(0), r.getLong(1)))
      val pos = rows.filter(_._2 == 1L).map(_._1)
      val neg = rows.filter(_._2 == 0L).map(_._1)
      val auc = (for (p <- pos; q <- neg)
        yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0)
        .sum / (pos.length.toDouble * neg.length)
      val cutAcc = rows.count { case (m, y) =>
        (math.floor(m * 10).toLong >= cut) == (y == 1L) }.toDouble / rows.length
      val base = math.max(pos.length, neg.length).toDouble / rows.length
      println(f"CFG $label%-10s d=$d%5d ep=$epochs%3d lr=$lr%4.1f bi=$bigrams%5s | " +
        f"valAUC=$auc%.4f cut=$cut%3d cutAcc=$cutAcc%.4f base=$base%.4f " +
        f"trainLossFinal=${fit.losses.last}%.4f " +
        f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }

    // ---- r17 mode: AUC vs TRAIN-SAMPLE SIZE at the gate config ----
    // (verdict item: capacity and feature family probed flat in r16;
    // the unprobed axis is training-data volume). Hash-nested
    // fractions of the train split (1/16 ⊂ 1/8 ⊂ … ⊂ 1) at the gate
    // operating point — a flat curve from half to full data means
    // more corpus cannot reach 0.62 and the ceiling is the model
    // family, not the sample.
    if (args.lift(1).contains("sizecurve")) {
      val fb = graft.operators.Dedup.shingleHash(
        concat(lit("tsz:"), col("text"))) % 16
      for (frac <- Seq(1, 2, 4, 8, 16)) {
        val sub = train.filter(fb < frac)
        val n = sub.count()
        val t0 = System.nanoTime()
        val fit = Classifier.fit(sub, "doc_id", "text", "_lbl",
          d = 8192, epochs = 16, lr = 8.0, trainMod = 1, bigrams = true)
        val lg = T.classifierMargin(col("text"), fit.weightSeq, fit.bias)
        val rows = valDs.select(lg.as("m"), col("_lbl").cast("long").as("y"))
          .collect().map(r => (r.getDouble(0), r.getLong(1)))
        val pos = rows.filter(_._2 == 1L).map(_._1)
        val neg = rows.filter(_._2 == 0L).map(_._1)
        val auc = (for (p <- pos; q <- neg)
          yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0)
          .sum / (pos.length.toDouble * neg.length)
        println(f"SIZE frac=$frac%2d/16 nTrain=$n%7d valAUC=$auc%.4f " +
          f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
      }
      spark.stop(); return
    }

    // ---- r17 mode: seed-task ceiling probes -----------------------
    // The seed label is DETERMINISTIC in text (langId(text)==lang with
    // lang generator-assigned), so there is no aleatoric noise floor;
    // the question is what the linear-over-hashed-features family can
    // express. Three measurements: (a) the heuristic's own confidence
    // margin as a zero-parameter ranking score; (b) where the
    // disagreement mass lives on the margin axis (the hand-checkable-
    // slice read: high-margin docs should be ~all label 1); (c) an
    // ORACLE-FEATURE fit — the langid marker internals quantized into
    // categorical tokens and appended to the word stream. If (c)
    // jumps, ~0.60 is the WORD-HASH family ceiling, not the task
    // ceiling, and the next rung is the marker-feature stream.
    if (args.lift(1).contains("ceiling")) {
      val en = T.markerScore(col("text"), "en")
      val de = T.markerScore(col("text"), "de")
      val es = T.markerScore(col("text"), "es")
      val fr = T.markerScore(col("text"), "fr")
      val sorted = sort_array(array(en, de, es, fr), asc = false)
      val top = element_at(sorted, 1)
      val second = element_at(sorted, 2)
      val margin = (top - second).cast("double")

      // (a) heuristic-confidence margin as the score
      val rows = valDs.select(margin.as("m"), col("_lbl").cast("long").as("y"))
        .collect().map(r => (r.getDouble(0), r.getLong(1)))
      val pos = rows.filter(_._2 == 1L).map(_._1)
      val neg = rows.filter(_._2 == 0L).map(_._1)
      val aucM = (for (p <- pos; q <- neg)
        yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0)
        .sum / (pos.length.toDouble * neg.length)
      println(f"CEIL margin-as-score valAUC=$aucM%.4f " +
        f"(nPos=${pos.length} nNeg=${neg.length})")

      // (b) label rate by margin band — the hand-checkable slice
      docs.groupBy(least(margin, lit(8.0)).cast("long").as("margin_band"))
        .agg(count(lit(1)).as("n"), avg(col("_lbl")).as("label_rate"))
        .orderBy("margin_band").collect()
        .foreach(r => println(f"CEIL band=${r.getLong(0)}%2d " +
          f"n=${r.getLong(1)}%6d labelRate=${r.getDouble(2)}%.4f"))

      // (c) oracle-feature fits: marker internals as tokens, alone
      // and appended to the word unigram+bigram stream
      val markerToks = array(
        concat(lit("g:"), T.langId(col("text"))),
        concat(lit("mg:"), least(margin, lit(20.0)).cast("long").cast("string")),
        concat(lit("en:"), least(en, lit(30)).cast("string")),
        concat(lit("de:"), least(de, lit(30)).cast("string")),
        concat(lit("es:"), least(es, lit(30)).cast("string")),
        concat(lit("fr:"), least(fr, lit(30)).cast("string")))
      evalCfg(8192, 16, 8.0, bigrams = false, label = "markers",
        feats = Some(markerToks))
      evalCfg(8192, 16, 8.0, bigrams = false, label = "word+markers",
        feats = Some(concat(T.classifierFeatures(col("text")), markerToks)))
      evalCfg(16384, 16, 8.0, bigrams = false, label = "word+markers",
        feats = Some(concat(T.classifierFeatures(col("text")), markerToks)))
      evalCfg(8192, 24, 8.0, bigrams = false, label = "word+markers",
        feats = Some(concat(T.classifierFeatures(col("text")), markerToks)))
      spark.stop(); return
    }

    // ---- r18 mode: QUALITY-COMPOSITE seed (the verdict-2 "better
    // seed" rung) ---------------------------------------------------
    // The lang-agreement seed's Bayes ceiling is ≈0.54 because the
    // generator's lang column is ~independent of the text (r17
    // ceiling probe). The DCLM-style next seed is the output of a
    // STRONGER FILTER the model should distill: here the full
    // t_filter_chain verdict with the language stage on T.langId
    // (deterministic IN TEXT — the gate chain's metadata-lang stage
    // would re-import the unlearnable column), i.e.
    //   label = [n_tok >= 20] ∧ [langId(text) = 'en']
    //         ∧ [qualityScore >= 0.5] ∧ [dup-2gram coverage <= 0.2].
    // Every stage is an existing oracle-replayable formula
    // (filterChainSql), so a floor earned here can gate. This mode
    // measures label rate + val AUC/cutAcc of the word-hash family
    // on the composite seed at the gate split.
    if (args.lift(1).contains("seed2")) {
      val toks = split(col("text"), " ")
      val n = size(toks)
      val comp = (n >= 20) && (T.langId(col("text")) === "en") &&
        (T.qualityScore(col("text")) >= 0.5d) &&
        (round(T.repetitionStats(toks, 2, 2).getField("dup_covered")
          .cast("double") / n, 6) <= 0.2d)
      val docs2 = Tables.documents(spark, sf)
        .withColumn("_lbl", when(comp, 1L).otherwise(0L))
        .localCheckpoint(eager = true)
      val tr2 = docs2.filter(vb =!= 0)
      val vl2 = docs2.filter(vb === 0)
      val rate = docs2.agg(avg(col("_lbl"))).head().getDouble(0)
      println(f"SEED2 labelRate=$rate%.4f nTrain=${tr2.count()} nVal=${vl2.count()}")

      def evalSeed(d: Int, epochs: Int, bigrams: Boolean): Unit = {
        val t0 = System.nanoTime()
        val fit = Classifier.fit(tr2, "doc_id", "text", "_lbl",
          d = d, epochs = epochs, lr = 8.0, trainMod = 1, bigrams = bigrams)
        val lg = T.classifierMargin(col("text"), fit.weightSeq, fit.bias,
          bigrams = bigrams)
        val cut = Classifier.calibrateCut(
          tr2.select(lg.as("m"), col("_lbl").as("y")), "m", "y")
        val rows = vl2.select(lg.as("m"), col("_lbl").cast("long").as("y"))
          .collect().map(r => (r.getDouble(0), r.getLong(1)))
        val pos = rows.filter(_._2 == 1L).map(_._1)
        val neg = rows.filter(_._2 == 0L).map(_._1)
        val auc = (for (p <- pos; q <- neg)
          yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0)
          .sum / (pos.length.toDouble * neg.length)
        val cutAcc = rows.count { case (m, y) =>
          (math.floor(m * 10).toLong >= cut) == (y == 1L) }.toDouble / rows.length
        val base = math.max(pos.length, neg.length).toDouble / rows.length
        println(f"SEED2 d=$d%5d ep=$epochs%3d bi=$bigrams%5s | " +
          f"valAUC=$auc%.4f cut=$cut%3d cutAcc=$cutAcc%.4f base=$base%.4f " +
          f"trainLossFinal=${fit.losses.last}%.4f " +
          f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
      }
      evalSeed(8192, 16, bigrams = true)
      evalSeed(8192, 24, bigrams = true)
      evalSeed(16384, 16, bigrams = true)
      evalSeed(8192, 16, bigrams = false)

      // engineered-feature rungs (the r17 oracle-feature discipline):
      // the composite filter reads LENGTH, repetition coverage and
      // ratio statistics the length-normalized word bag cannot
      // express — quantize those statistics into categorical tokens
      // and append them to the word stream. A jump isolates the
      // word-only ceiling as feature starvation, not task noise.
      def evalSeedF(d: Int, epochs: Int, label: String,
                    feats: org.apache.spark.sql.Column): Unit = {
        val t0 = System.nanoTime()
        val fit = Classifier.fit(tr2, "doc_id", "text", "_lbl",
          d = d, epochs = epochs, lr = 8.0, trainMod = 1, bigrams = false,
          featsCol = Some(feats))
        val lg = T.classifierLogit(feats, fit.weightSeq, fit.bias)
        val rows = vl2.select(lg.as("m"), col("_lbl").cast("long").as("y"))
          .collect().map(r => (r.getDouble(0), r.getLong(1)))
        val pos = rows.filter(_._2 == 1L).map(_._1)
        val neg = rows.filter(_._2 == 0L).map(_._1)
        val auc = (for (p <- pos; q <- neg)
          yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0)
          .sum / (pos.length.toDouble * neg.length)
        println(f"SEED2F $label%-12s d=$d%5d ep=$epochs%3d | valAUC=$auc%.4f " +
          f"trainLossFinal=${fit.losses.last}%.4f " +
          f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
      }
      val dupCov = round(T.repetitionStats(toks, 2, 2).getField("dup_covered")
        .cast("double") / n, 6)
      val statToks = array(
        concat(lit("len:"), least(floor(log(2.0, n.cast("double"))),
          lit(12.0)).cast("long").cast("string")),
        concat(lit("rep:"), least(floor(dupCov * 10.0), lit(10.0))
          .cast("long").cast("string")),
        concat(lit("q:"), least(floor(T.qualityScore(col("text")) * 10.0),
          lit(10.0)).cast("long").cast("string")),
        concat(lit("g:"), T.langId(col("text"))))
      evalSeedF(8192, 16, "stats-only", statToks)
      evalSeedF(8192, 16, "word+stats",
        concat(T.classifierFeatures(col("text")), statToks))
      evalSeedF(8192, 24, "word+stats",
        concat(T.classifierFeatures(col("text")), statToks))
      spark.stop(); return
    }

    // r16 grid: the fused kernel made capacity cheap — probe the wider
    // hash tables the r15 verdict asked for (args override: d,ep,lr
    // triples as "4096:16:8,16384:16:8")
    val grid = args.lift(1).map(_.split(",").toSeq.map { c =>
      val Array(d, ep, lr) = c.split(":")
      (d.toInt, ep.toInt, lr.toDouble, true)
    }).getOrElse(Seq(
      (1024, 16, 8.0, true),
      (2048, 16, 8.0, true),
      (4096, 16, 8.0, true),
      (4096, 24, 8.0, true),
      (8192, 16, 8.0, true),
      (16384, 16, 8.0, true),
      (16384, 24, 8.0, true)))
    for ((d, ep, lr, bi) <- grid) evalCfg(d, ep, lr, bi)
    // char n-gram families (probe-only streams)
    for ((n, d) <- Seq((3, 4096), (3, 8192), (3, 16384),
        (4, 8192), (4, 16384), (5, 16384)))
      evalCfg(d, 16, 8.0, bigrams = false, label = s"char$n",
        feats = Some(charGrams(n)))
    // union stream: word unigram+bigram ++ char trigrams
    for (d <- Seq(8192, 16384))
      evalCfg(d, 16, 8.0, bigrams = false, label = "word+char3",
        feats = Some(concat(T.classifierFeatures(col("text")), charGrams(3))))
    spark.stop()
  }
}
