package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: linear-scaling smoke test. Replicates the sf0.1 events /
  * documents tables N× (disjoint id spaces, shifted timestamps — same
  * distribution, N× the keys) into /tmp, then times representative
  * operators at 1× and N×. A super-linear ratio flags an operator
  * whose plan would not survive a 100-TB scale-up.
  *   sbt "runMain graft.tools.ScaleSmoke [N]"
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10)
    val sf = "/root/testdata/sf0.1"
    val out = s"/tmp/graft_scale_x$n"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // replicate with disjoint key/shingle/vector spaces — the
    // transforms live in Replicate (shared with the full-gate N×
    // directory builder); see the Scaladoc there for why replica
    // spaces must be disjoint (structure replicates N×, pairs don't
    // go quadratic by construction)
    val ev = graft.sources.Tables.events(spark, sf)
    (0 until n).map(Replicate.events(ev, _)).reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/events")
    val docs = graft.sources.Tables.documents(spark, sf)
    (0 until n).map(Replicate.documents(docs, _)).reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/documents")
    val emb = graft.sources.Tables.embeddings(spark, sf)
    (0 until n).map(Replicate.embeddings(emb, _)).reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/embeddings")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"SCALE $label ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$rows")
    }

    val ev1 = ev.localCheckpoint(eager = true)
    val evBig = spark.read.parquet(s"$out/events").localCheckpoint(eager = true)
    val docs1 = docs.localCheckpoint(eager = true)
    val docsBig = spark.read.parquet(s"$out/documents").localCheckpoint(eager = true)
    val emb1 = emb.localCheckpoint(eager = true)
    val embBig = spark.read.parquet(s"$out/embeddings").localCheckpoint(eager = true)

    // aggregate over the derived session column — a bare count() lets
    // Catalyst prune the whole window away
    def sessionize(df: DataFrame): Long =
      graft.operators.Sessionize(df, "user_id", "ts_ms", 1800000L,
        Seq("ts_ms", "event_id"))
        .agg(sum(col("session_seq"))).collect()(0).getLong(0)
    def minhash(df: DataFrame): Long =
      graft.operators.Dedup.minhashLsh(df, "doc_id", "text").count()
    def agg(df: DataFrame): Long =
      df.groupBy("event_type").agg(sum("value"), count(lit(1))).count()
    def gatewayBatch(df: DataFrame): Long =
      graft.operators.Router.gatewayBatches(df, "event_type", "ts_ms",
        "event_id", 3600000L, 20)
        .agg(sum(col("n_in_batch"))).collect()(0).getLong(0)
    def bigramNll(df: DataFrame): Long = {
      // inline the t_bigram_nll shape over an arbitrary docs frame
      val docs = df.select(col("doc_id"), lower(col("text")).as("text"))
      val uni = docs.select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c1"))
      val bg = graft.operators.Dedup.shingles(docs, "doc_id", "text", k = 2)
      val c2 = bg.groupBy("shingle").agg(count(lit(1)).as("c2"))
      val score = c2.withColumn("w1", element_at(split(col("shingle"), " "), 1))
        .join(uni, col("w1") === col("w"))
        .select(col("shingle"),
          (log(col("c1").cast("double")) - log(col("c2").cast("double"))).as("nll"))
      bg.join(score, "shingle").groupBy("doc_id")
        .agg(avg(col("nll"))).count()
    }

    def repetition(df: DataFrame): Long =
      df.select(split(col("text"), " ").as("t"))
        .select(graft.functions.TextFunctions
          .repetitionStats(col("t"), 2, 3).getField("dup_covered").as("c"))
        .agg(sum(col("c"))).collect()(0).getLong(0)
    def substrDup(df: DataFrame): Long =
      graft.operators.Dedup
        .crossDocSpanCoverage(df, "doc_id", "text", k = 5, minDocs = 2)
        .agg(sum(col("n_covered"))).collect()(0).getLong(0)

    time("agg_x1")(agg(ev1)); time(s"agg_x$n")(agg(evBig))
    time("sessionize_x1")(sessionize(ev1)); time(s"sessionize_x$n")(sessionize(evBig))
    time("minhash_x1")(minhash(docs1)); time(s"minhash_x$n")(minhash(docsBig))
    time("gateway_batch_x1")(gatewayBatch(ev1)); time(s"gateway_batch_x$n")(gatewayBatch(evBig))
    time("bigram_nll_x1")(bigramNll(docs1)); time(s"bigram_nll_x$n")(bigramNll(docsBig))
    time("repetition_x1")(repetition(docs1)); time(s"repetition_x$n")(repetition(docsBig))
    time("substr_dup_x1")(substrDup(docs1)); time(s"substr_dup_x$n")(substrDup(docsBig))
    def semDedup(df: DataFrame): Long =
      graft.operators.Similarity
        .semanticDedup(df, "vec_id", "embedding", numPlanes = 6, dim = 64,
          minCos = 0.35)
        .count()
    time("semdedup_x1")(semDedup(emb1)); time(s"semdedup_x$n")(semDedup(embBig))
    // round-12 entry: the EXECUTABLE plane-scaling rule — autoPlanes
    // holds bucket occupancy at a target as the corpus grows, so the
    // within-bucket pair join stays ~linear in n where the pinned-
    // plane form above goes quadratic (the 100× campaign measured
    // 36 s at 6 fixed planes; scaled planes should hold the wall to
    // ~N× the 1× figure)
    def semDedupAuto(df: DataFrame): Long =
      graft.operators.Similarity
        .semanticDedupAuto(df, "vec_id", "embedding", dim = 64,
          minCos = 0.35, targetOccupancy = 64.0)
        .count()
    time("semdedup_auto_x1")(semDedupAuto(emb1))
    time(s"semdedup_auto_x$n")(semDedupAuto(embBig))
    // round-8 entry: the min-label closure over the semantic pair
    // graph — at 10× the pair graph sits AT the percolation threshold
    // (deep chains, 100× pairs), the regime that exposed the one-hop
    // cap-out and the Catalyst stats wedge; pass count is logarithmic
    // (pointer jumps), so the wall should grow ~linearly with the
    // pair volume, not with chain depth
    def semClusters(df: DataFrame): Long =
      graft.operators.Dedup.clusterPairs(
        graft.operators.Similarity.semanticDedup(df, "vec_id", "embedding",
          numPlanes = 6, dim = 64, minCos = 0.35))
        .count()
    time("sem_clusters_x1")(semClusters(emb1))
    time(s"sem_clusters_x$n")(semClusters(embBig))
    // round-6 entries: both are one-window-shuffle shapes — the wall
    // should track the shuffle volume linearly
    def scd2(df: DataFrame): Long =
      graft.operators.JobLedger
        .scd2History(df, "user_id", "event_type", "ts_ms", "event_id")
        .agg(sum(col("version"))).collect()(0).getLong(0)
    def seqPack(df: DataFrame): Long = {
      val toks = df.select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        graft.operators.Dedup.shingleHash(concat(lit("pack:"), col("text"))).as("ph"))
      graft.operators.ShardedWindow.runningSum(toks, "source",
        graft.operators.ShardedWindow.hashShard60(col("ph"), 32),
        Seq(col("ph"), col("doc_id")), col("n_tokens"), "cum")
        .agg(sum(expr("(cum - n_tokens) div 512"))).collect()(0).getLong(0)
    }
    // round-7 entry: queue rotation = one struct-max agg + one
    // anti-join on the job key — wall should track shuffle volume
    def rotate(df: DataFrame): Long = {
      val (snap, tail) = graft.operators.JobLedger.rotate(df, "user_id",
        "event_type", "ts_ms", "event_id", Seq("purchase"), 1705276800000L)
      snap.count() + tail.count()
    }
    time("scd2_x1")(scd2(ev1)); time(s"scd2_x$n")(scd2(evBig))
    time("rotate_x1")(rotate(ev1)); time(s"rotate_x$n")(rotate(evBig))
    time("seq_pack_x1")(seqPack(docs1)); time(s"seq_pack_x$n")(seqPack(docsBig))
    // skewed regime: ONE source holds the whole corpus — the old
    // per-source window sorted everything on one task here; the
    // sharded prefix sum must scale like the flat case
    val skew1 = docs1.withColumn("source", lit("s0"))
    val skewBig = docsBig.withColumn("source", lit("s0"))
    time("seq_pack_skew_x1")(seqPack(skew1)); time(s"seq_pack_skew_x$n")(seqPack(skewBig))
    // round-8 entry: micro-batch assignment with ONE destination —
    // the worst-case regime for the old partitionBy(dest) row_number
    // window (whole ledger sorted on one task); the sharded running
    // count must stay flat 1×→N×
    def microBatchSum(df: DataFrame): Long =
      graft.operators.Router.batchSummary(df, "event_type", "event_id", 50)
        .agg(sum(col("n_in_batch"))).collect()(0).getLong(0)
    val oneDest1 = ev1.withColumn("event_type", lit("d0"))
    val oneDestBig = evBig.withColumn("event_type", lit("d0"))
    time("micro_batch_skew_x1")(microBatchSum(oneDest1))
    time(s"micro_batch_skew_x$n")(microBatchSum(oneDestBig))
    // round-9 entry: ONE destination AND a density-CLUSTERED order key
    // — 90% of ids packed into a sliver of the key span, 10% spread
    // 100× wider. An equi-width [min,max] shard split lands the hot
    // mass in one shard (single-task sort returns); quantile-bounded
    // shards must keep this flat 1×→N×
    def clustered(df: DataFrame): DataFrame = df.withColumn("event_id",
      when(pmod(col("event_id"), lit(10)) =!= 0,
        pmod(col("event_id"), lit(1000000L)))
        .otherwise(col("event_id") * 100L))
    val clust1 = clustered(oneDest1)
    val clustBig = clustered(oneDestBig)
    time("micro_batch_clustered_x1")(microBatchSum(clust1))
    time(s"micro_batch_clustered_x$n")(microBatchSum(clustBig))
    // r9-close entry: ONE destination AND a STRING order key whose ids
    // all share a long common prefix (the uuid/message-id regime) —
    // a fixed-width prefix image would collapse every key into one
    // shard here (single-task sort); the common-prefix skip must keep
    // this flat 1×→N× like the numeric regimes
    def strung(df: DataFrame): DataFrame = df.withColumn("event_id",
      concat(lit("evt-2024-01-01-message-"), lpad(col("event_id"), 12, "0")))
    val str1 = strung(oneDest1)
    val strBig = strung(oneDestBig)
    time("micro_batch_string_x1")(microBatchSum(str1))
    time(s"micro_batch_string_x$n")(microBatchSum(strBig))
    // round-10 entry: the trainer-facing shard export at N× — the
    // global permutation is a ONE-group sharded prefix count (no
    // single-task corpus sort), so the wall must track corpus size
    // ~linearly; and the manifest must be BIT-IDENTICAL across
    // physical input layouts (the content-seeded order has no
    // partition dependence — the reproducibility a training run
    // actually needs)
    def exportOnce(df: DataFrame, root: String): Long = {
      graft.sinks.ShardExport.export(df, "text", "doc_id", "source",
        root, shardSize = 1000L)
      graft.sinks.ShardExport.readManifest(spark, root)
        .agg(count(lit(1))).collect()(0).getLong(0)
    }
    time("shard_export_x1")(exportOnce(docs1, s"$out/exp_1"))
    time(s"shard_export_x$n")(exportOnce(docsBig, s"$out/exp_N"))
    time(s"shard_export_x${n}_relayout")(
      exportOnce(docsBig.repartition(17), s"$out/exp_N2"))
    def manifestRows(root: String): Seq[String] =
      graft.sinks.ShardExport.readManifest(spark, root)
        .orderBy("shard").collect().map(_.toString).toSeq
    val stable = manifestRows(s"$out/exp_N") == manifestRows(s"$out/exp_N2")
    println(s"SCALE shard_export_manifest_stable_across_layouts $stable")
    // round-10 entry: simhash hamming-ball near-dup — replica token
    // spaces are disjoint so fingerprints decorrelate across replicas
    // (random 64-bit pairs land within hamming 3 with p ≈ 2e-15):
    // pairs grow ~N×, and the 16-bit block-bucket join must keep the
    // WALL ~linear (the property under test — a naive all-pairs form
    // would grow N²)
    def simhashPairs(df: DataFrame): Long =
      graft.operators.Dedup.simhashNearDup(df, "doc_id", "text")
        .agg(count(lit(1))).collect()(0).getLong(0)
    time("simhash_neardup_x1")(simhashPairs(docs1))
    time(s"simhash_neardup_x$n")(simhashPairs(docsBig))
    // round-11 entry: PQ ADC top-k at N× — codebooks train ONCE on
    // the 1× sample (a real index trains on a sample and codes at
    // ingest); with |Q| fixed the candidate side streams m-byte codes
    // only and the shortlist is a ShardedWindow two-phase top-k (no
    // corpus-sized per-query window partition), so the wall must
    // track candidate volume ~linearly — the naive per-qid rank
    // window form this replaced sorts |Q| full corpora
    val pqBooks = graft.operators.Similarity.pqCodebooks(
      emb1, "vec_id", "embedding", m = 4, ks = 8, dim = 64,
      iters = 4, trainMod = 4)
    def pqShortTopK(df: DataFrame): Long =
      graft.operators.Similarity.pqTopK(emb1.filter(col("vec_id") < 10),
          df, "vec_id", "embedding", pqBooks, k = 3, shortlist = 64)
        .agg(count(lit(1))).collect()(0).getLong(0)
    time("pq_topk_x1")(pqShortTopK(emb1))
    time(s"pq_topk_x$n")(pqShortTopK(embBig))
    // round-11 second entry: the composed IVFADC at N× — same
    // queries, but the probe prune restricts the ADC stream to
    // nprobe-of-8 cells, so the wall must sit BELOW the un-pruned
    // pq_topk at the same scale and grow sub-linearly. The timer
    // deliberately includes the coarse training (Lloyd on the
    // corpus's hash sample) — the full build-and-query cost.
    def ivfPqSmoke(df: DataFrame): Long = {
      val cents = graft.operators.Similarity.kmeansCentroids(
        df, "vec_id", "embedding", k = 8, iters = 4, trainMod = 4)
      val cells = graft.operators.Similarity.kmeansCells(
        df, "vec_id", "embedding", k = 8, iters = 4, trainMod = 4)
      graft.operators.Similarity.ivfPqTopK(emb1.filter(col("vec_id") < 10),
          df, "vec_id", "embedding", cells, cents, pqBooks, k = 3,
          nprobe = 3, shortlist = 64)
        .agg(count(lit(1))).collect()(0).getLong(0)
    }
    time("ivfpq_topk_x1")(ivfPqSmoke(emb1))
    time(s"ivfpq_topk_x$n")(ivfPqSmoke(embBig))
    // round-12 entry: the EXECUTABLE cell-scaling rule (autoCells ≈
    // √n — the autoPlanes discipline applied to the coarse
    // quantizer). At N× a fixed 8-cell index runs n/8 members per
    // cell — far out of the rated [16,128] band, where the tuning
    // curve's recall floor stops applying; re-training at √n cells
    // restores occupancy to ~√n, so the SAME nprobe scans a
    // collapsing FRACTION of the corpus as n grows. Printed: recall@3
    // vs exact brute force for fixed-8 vs reindexed at the default
    // nprobe=4, plus the scanned-cell occupancy both ways — the
    // measured evidence behind AnnIndex.reindex's Scaladoc claim.
    def recallOf(df: DataFrame, cents: Array[Array[Double]],
                 nprobe: Int): Double = {
      val q = emb1.filter(col("vec_id") < 10)
      val approx = graft.operators.Similarity.ivfPqTopK(q, df, "vec_id",
        "embedding", graft.operators.Similarity.assignCellsLiteral(
          df, "vec_id", "embedding", cents), cents, pqBooks,
        k = 3, nprobe = nprobe, shortlist = 64)
      val exact = graft.operators.Similarity.bruteForceTopK(q, df,
        "vec_id", "embedding", k = 3)
      approx.select("qid", "cid").intersect(exact.select("qid", "cid"))
        .count().toDouble / exact.count()
    }
    val nBig = embBig.count()
    val cents8 = graft.operators.Similarity.kmeansCentroids(
      embBig, "vec_id", "embedding", k = 8, iters = 4, trainMod = 4)
    val centsAuto = graft.operators.Similarity.kmeansCentroids(
      embBig, "vec_id", "embedding",
      k = graft.operators.Similarity.autoCells(nBig), iters = 4, trainMod = 4)
    var r8 = 0.0; var rAuto = 0.0
    time(s"ivfpq_recall_fixed8_x$n") { r8 = recallOf(embBig, cents8, 4); 1L }
    time(s"ivfpq_recall_autocells_x$n") { rAuto = recallOf(embBig, centsAuto, 4); 1L }
    println(f"SCALE ivfpq_reindex n=$nBig cells_fixed=8 cells_auto=${centsAuto.length} " +
      f"recall_fixed8=$r8%.3f recall_autocells=$rAuto%.3f " +
      f"scan_frac_fixed8=${4.0 / 8}%.3f scan_frac_auto=${4.0 / centsAuto.length}%.4f")
    // round-14 entry: PQ-book staleness at reindex — the kept-books
    // approximation made MEASURABLE (Similarity.bookDrift: mean
    // residual quantization error of the 1×-trained books under the
    // N× re-trained quantizer vs a fresh training on the same
    // sample). Replicated growth is the SAME distribution, so the
    // rule must stay quiet (ratio ≈ 1); a corpus that has collapsed
    // onto a few modes (the near-dup regime — residuals become
    // highly quantizable structure only a fresh training captures)
    // must fire it (ratio ≥ threshold) — the signal
    // AnnIndex.reindex previously had no way to surface.
    val cents8_1 = graft.operators.Similarity.kmeansCentroids(
      emb1, "vec_id", "embedding", k = 8, iters = 4, trainMod = 4)
    val resBooks = graft.operators.Similarity.pqResidualCodebooks(
      emb1, "vec_id", "embedding", cents8_1, m = 4, ks = 8, dim = 64,
      iters = 4, trainMod = 4)
    var driftRep = 0.0; var driftShift = 0.0
    time(s"ivfpq_bookdrift_replicated_x$n") {
      driftRep = graft.operators.Similarity.bookDrift(embBig, "vec_id",
        "embedding", centsAuto, resBooks); 1L
    }
    val modeVecs = emb1.filter(col("vec_id") < 64)
      .select(col("vec_id").as("mode_id"), col("embedding").as("mvec"))
    val embShift = embBig
      .select(col("vec_id"), pmod(col("vec_id"), lit(64L)).as("mode_id"))
      .join(broadcast(modeVecs), "mode_id")
      .select(col("vec_id"), transform(col("mvec"), (x, i) =>
          (x + when(i === 0,
            pmod(col("vec_id"), lit(1000L)).cast("float") * lit(1e-5f))
            .otherwise(lit(0.0f))).cast("float"))
        .as("embedding"))
      .localCheckpoint(eager = true)
    val centsShift = graft.operators.Similarity.kmeansCentroids(
      embShift, "vec_id", "embedding",
      k = graft.operators.Similarity.autoCells(nBig), iters = 4, trainMod = 4)
    time(s"ivfpq_bookdrift_shifted_x$n") {
      driftShift = graft.operators.Similarity.bookDrift(embShift, "vec_id",
        "embedding", centsShift, resBooks); 1L
    }
    val thr = graft.operators.Similarity.BookDriftThreshold
    println(f"SCALE ivfpq_bookdrift replicated=$driftRep%.3f " +
      f"shifted=$driftShift%.3f threshold=$thr%.1f " +
      f"fires_replicated=${driftRep >= thr} fires_shifted=${driftShift >= thr}")
    spark.stop()
  }
}
