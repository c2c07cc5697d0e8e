package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED form of the composed IVFADC index
  * ([[Similarity.ivfPqTopK]]) — the artifact a 100-TB deployment
  * actually serves from, closing the gap between "at scale the codes
  * table is bucketed by cell" in the Scaladoc and what exists on
  * disk. Analogous to what [[Dedup.minhashLshDelta]] does for the
  * MinHash band table: train once, persist the compressed index,
  * append deltas row-locally, search forever without touching the
  * training path again.
  *
  * Layout under `dir`:
  *  - `codes/` — the bucketed codes table (idCol, cell,
  *    code_0..code_{m-1}): parquet CLUSTERED BY (cell) SORTED BY
  *    (cell) INTO numBuckets BUCKETS, registered as an EXTERNAL table
  *    so a fresh session re-attaches with one DDL statement
  *    ([[load]]). Bucketing by the probe key is the scan-pruning
  *    story: a search's probed cells reduce to a literal IN filter on
  *    the bucket column, so FileSourceScanExec prunes buckets at the
  *    SCAN (`SelectedBucketsCount` < total — pinned in AnnIndexSpec),
  *    and the probe equi-join itself broadcasts the |Q|·nprobe probe
  *    set: the codes never shuffle.
  *  - `meta_params/`, `meta_cents/`, `meta_books/` — the trained
  *    artifacts (Lloyd centroids, PQ codebooks) plus shape params as
  *    tiny parquet tables. Doubles round-trip exactly through
  *    parquet, so a search from a re-loaded index is bit-identical to
  *    one from the in-session training run (spec-pinned).
  *
  * Codes are RESIDUAL-encoded (Jégou'11 §IV): code_* quantizes
  * x − q1(x) against residual-trained codebooks
  * ([[Similarity.pqResidualCodebooks]]), via the offset identity in
  * [[Similarity.residualOffsets]] — per-row work stays raw-slice
  * dots, and the same m bytes quantize the much-smaller residual,
  * so recall at a fixed operating point beats raw-vector PQ.
  *
  * Delta append ([[append]]): new vectors are coded ROW-LOCALLY
  * against the persisted literals ([[Similarity.pqCodesResidual]] —
  * identical rounding/tiebreak to the build path), then written
  * into the same bucketed table. Float vectors never re-shuffle; the
  * coding pass is fully partition-local (its collapse barrier is an
  * object fence, not an exchange) and the only shuffle is code rows
  * moving into their buckets at the write.
  * append == rebuild parity is spec-pinned (AnnIndexSpec): building
  * on a base corpus and appending a delta yields byte-identical codes
  * — and therefore identical search results — to coding the full
  * corpus with the same trained artifacts.
  */
object AnnIndex {

  /** Trained index artifacts + shape. `cents`: ncells × dim Lloyd
    * centroids; `books`: m × ks × (dim/m) PQ codebooks — kilobytes,
    * driver-held, interpolated into searches as literals. */
  case class IndexMeta(idCol: String, idType: String, numBuckets: Int,
                       cents: Array[Array[Double]],
                       books: Array[Array[Array[Double]]]) {
    def m: Int = books.length
    def ncells: Int = cents.length
  }

  /** The codes frame for `df` under trained artifacts — shared by
    * build (full corpus) and append (delta): RESIDUAL-encoded
    * (Jégou'11 §IV — codes quantize x − q1(x), so `books` must be
    * [[Similarity.pqResidualCodebooks]] trainings). Row-local per-row
    * work; the floats are read once and never shuffle — the coding
    * pass inside [[Similarity.pqCodesResidual]] is partition-local
    * end to end (its collapse barrier is an object fence, not an
    * exchange). */
  def codeRows(df: DataFrame, idCol: String, vecCol: String,
               cents: Array[Array[Double]],
               books: Array[Array[Array[Double]]]): DataFrame =
    Similarity.pqCodesResidual(df, idCol, vecCol, cents, books)

  /** Train (or take pre-trained artifacts) and write the full index.
    * Passing `cents`/`books` trained elsewhere (e.g. the session
    * memo stores) keeps one Lloyd run per corpus; omitting them
    * trains here with the standard deterministic trainer. */
  def write(df: DataFrame, idCol: String, vecCol: String,
            dir: String, table: String,
            cents: Array[Array[Double]],
            books: Array[Array[Array[Double]]],
            numBuckets: Int = 8): IndexMeta = {
    val spark = df.sparkSession
    val idType = df.schema(idCol).dataType.sql
    val meta = IndexMeta(idCol, idType, numBuckets, cents, books)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    deleteRecursively(new java.io.File(s"$dir/codes"))
    // any rebuild moves the operating curve: a tuning frame measured
    // under the old quantizer must not drive searchAuto on the new
    // one — drop it; the maintenance flow re-measures + writeTuning
    deleteRecursively(new java.io.File(s"$dir/meta_tuning"))
    writeCodes(codeRows(df, idCol, vecCol, cents, books), dir, table,
      idCol, numBuckets, SaveMode.Overwrite)
    writeMeta(spark, dir, meta)
    meta
  }

  /** Append a delta: code the new vectors row-locally against the
    * persisted artifacts and add them to the bucketed table. No
    * retraining, no float shuffle — the production ingest path. */
  def append(newDf: DataFrame, vecCol: String,
             dir: String, table: String): Unit = {
    val spark = newDf.sparkSession
    val meta = loadMeta(spark, dir)
    registerIfAbsent(spark, dir, table, meta)
    writeCodes(codeRows(newDf, meta.idCol, vecCol, meta.cents, meta.books),
      dir, table, meta.idCol, meta.numBuckets, SaveMode.Append)
  }

  /** Re-train the coarse quantizer at the corpus's CURRENT size and
    * rewrite the bucketed artifact — the maintenance operation for a
    * corpus that has outgrown its index's rated occupancy band
    * ([16, 128] mean members/cell, the regime the tuning curve's
    * recall floor is pinned in). `targetCells` defaults to
    * [[Similarity.autoCells]] (≈ √n: one count() + driver
    * arithmetic, the autoPlanes discipline). The PQ codebooks are
    * KEPT but every row is RE-CODED: residual codes depend on the
    * assigned centroid (x − q1(x)), so when the coarse quantizer
    * moves, each row's code_* re-quantizes against its new cell's
    * residual — reindexed codes must equal a fresh
    * [[codeRows]] pass under (new cents, old books), which
    * AnnIndexSpec pins as re-code parity. Keeping the books (trained
    * on the ORIGINAL residual distribution) is the standard
    * maintenance approximation; scheduling a full PQ re-train is a
    * separate, rarer op ([[write]] with fresh trainings). The
    * approximation is MEASURABLE: run [[bookDrift]] after a reindex —
    * a ratio ≥ Similarity.BookDriftThreshold means the kept books no
    * longer fit the current residual distribution and the next
    * maintenance window should re-train. */
  def reindex(df: DataFrame, vecCol: String, dir: String, table: String,
              iters: Int = 5, trainMod: Int = 5,
              targetCells: Option[Int] = None): IndexMeta = {
    val spark = df.sparkSession
    val old = loadMeta(spark, dir)
    val ncells = targetCells.getOrElse(Similarity.autoCells(df.count()))
    val cents = Similarity.kmeansCentroids(df, old.idCol, vecCol,
      k = ncells, iters = iters, trainMod = trainMod)
    write(df, old.idCol, vecCol, dir, table, cents, old.books,
      old.numBuckets)
  }

  /** Reindex with the book-staleness rule EXECUTED, not just
    * documented: train the new coarse quantizer, measure
    * [[Similarity.bookDrift]] of the kept books under it, and decide
    * — ratio < [[Similarity.BookDriftThreshold]] keeps the books
    * (plain [[reindex]] semantics, the cheap standard maintenance),
    * ratio ≥ threshold re-trains the PQ books too, REUSING the
    * fresh training the drift measurement already paid for
    * ([[Similarity.bookDriftDetail]] — Lloyd runs once, not twice).
    * Returns (meta, drift ratio, whether books were re-trained) so
    * maintenance jobs can log the decision. The gate's reindex key
    * keeps plain [[reindex]] for oracle replay; this is the
    * maintenance entry point a deployment schedules. */
  def reindexAuto(df: DataFrame, vecCol: String, dir: String,
                  table: String, iters: Int = 5, trainMod: Int = 5,
                  targetCells: Option[Int] = None)
      : (IndexMeta, Double, Boolean) = {
    val spark = df.sparkSession
    val old = loadMeta(spark, dir)
    val ncells = targetCells.getOrElse(Similarity.autoCells(df.count()))
    val cents = Similarity.kmeansCentroids(df, old.idCol, vecCol,
      k = ncells, iters = iters, trainMod = trainMod)
    val (drift, freshBooks) = Similarity.bookDriftDetail(df, old.idCol,
      vecCol, cents, old.books, iters = iters, trainMod = trainMod)
    val retrain = drift >= Similarity.BookDriftThreshold
    val books = if (retrain) freshBooks else old.books
    (write(df, old.idCol, vecCol, dir, table, cents, books,
      old.numBuckets), drift, retrain)
  }

  /** PQ-book staleness of the persisted index against the corpus it
    * now serves ([[Similarity.bookDrift]] on the artifact's trained
    * centroids + kept books): ≈1 → the reindex approximation holds;
    * ≥ Similarity.BookDriftThreshold → schedule a full re-train
    * ([[write]] with fresh trainings). Maintenance diagnostic —
    * sampled Lloyd run + two sampled error aggs, never a query-path
    * cost. */
  def bookDrift(df: DataFrame, vecCol: String, dir: String,
                iters: Int = 4, trainMod: Int = 4): Double = {
    val meta = loadMeta(df.sparkSession, dir)
    Similarity.bookDrift(df, meta.idCol, vecCol, meta.cents, meta.books,
      iters, trainMod)
  }

  /** Attach the persisted index in this session: re-register the
    * external bucketed table if the catalog doesn't have it (fresh
    * session), reload the trained artifacts. Returns (codes frame,
    * meta). */
  def load(spark: SparkSession, dir: String, table: String): (DataFrame, IndexMeta) = {
    val meta = loadMeta(spark, dir)
    registerIfAbsent(spark, dir, table, meta)
    (spark.table(table), meta)
  }

  /** Search the persisted index — [[Similarity.ivfPqTopK]] semantics
    * (probe prune → ADC → sharded shortlist → exact rerank), with the
    * codes READ from the bucketed table instead of computed, and the
    * probed cells pushed into the scan as a literal IN filter so
    * bucket pruning fires. The probe set's DISTINCT cells are bounded
    * by ncells (the driver already holds ncells·dim centroid doubles),
    * so the collect is safe at any corpus size or |Q|. `exact` is the
    * float-vector store only the ≤ |Q|·shortlist rerank rows touch.
    *
    * `nprobe`/`shortlist` are the index's OPERATING POINT: pick them
    * with [[Similarity.autoOperatingPoint]] over a measured tuning
    * frame (cheapest config meeting the recall floor) rather than
    * hand-tuning; a `None` from the rule means no config reaches the
    * floor and the answer is [[reindex]], not probing harder. */
  def search(queries: DataFrame, codes: DataFrame, meta: IndexMeta,
             exact: DataFrame, vecCol: String, k: Int,
             nprobe: Int, shortlist: Int): DataFrame = {
    val idCol = meta.idCol
    val probes = Similarity.probeCells(queries, idCol, vecCol,
        meta.cents, nprobe)
      .localCheckpoint(eager = true)
    val probedCells = probes.select("cell").distinct()
      .collect().map(_.getLong(0)).sorted
    val scored = codes
      .filter(col("cell").isin(probedCells.map(c => c: Any): _*))
      .withColumnRenamed(idCol, "cid")
      .join(broadcast(probes.drop("pr")), "cell")
      .join(Similarity.pqQueryLut(queries, idCol, vecCol, meta.books), "qid")
      .filter(col("qid") =!= col("cid"))
      // residual ADC: ⟨q, x̂⟩ = ⟨q, c_cell⟩ (the probe frame's qcdot)
      // + Σₘ lut_m[code_m] — same rounding/tiebreak discipline as the
      // in-session path
      .withColumn("approx_score",
        round(col("qcdot") + Similarity.adcScore(meta.m), 6))
      .select(col("qid"), col("cid"), col("approx_score"))
    Similarity.adcShortlistRerank(scored, queries, exact, idCol, vecCol,
      k, shortlist)
  }

  /** Persist a MEASURED tuning frame (the s_ivfpq_tuning output
    * shape: nprobe, shortlist, recall_at_3) beside the trained
    * artifacts, making the operating point part of the index itself:
    * a fresh session [[searchAuto]]s without re-measuring. Measure
    * on a held-out query sample against brute-force ground truth
    * (the tuning machinery the gate key runs), re-measure after
    * [[reindex]]/[[reindexAuto]] (the operating curve moves with the
    * quantizer). */
  def writeTuning(tuning: DataFrame, dir: String): Unit = {
    val need = Set("nprobe", "shortlist", "recall_at_3")
    require(need.subsetOf(tuning.columns.toSet),
      s"tuning frame needs columns $need, got ${tuning.columns.toSeq}")
    tuning.select("nprobe", "shortlist", "recall_at_3")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/meta_tuning")
  }

  /** The artifact's own operating point: [[Similarity.
    * autoOperatingPoint]] (cheapest measured config meeting `floor`)
    * over the tuning frame persisted by [[writeTuning]]. None means
    * no stored config reaches the floor — re-size the index
    * ([[reindexAuto]]) and re-measure, don't probe harder. Fails
    * loudly when the artifact carries no tuning frame at all. */
  def operatingPoint(spark: SparkSession, dir: String,
                     floor: Double): Option[(Int, Int)] = {
    val path = new java.io.File(s"$dir/meta_tuning")
    require(path.exists(),
      s"AnnIndex at $dir carries no tuning frame — measure one and " +
        s"AnnIndex.writeTuning it before searchAuto/operatingPoint")
    Similarity.autoOperatingPoint(
      spark.read.parquet(s"$dir/meta_tuning"), floor)
  }

  /** [[search]] at the artifact's OWN operating point — the stored
    * tuning frame picks (nprobe, shortlist) via the executable rule,
    * so serving code states its recall floor instead of hand-tuned
    * knobs. Fails loudly (with the re-size advice) when no stored
    * config meets the floor: serving silently below a stated floor
    * is the one thing this path must never do. */
  def searchAuto(queries: DataFrame, codes: DataFrame, meta: IndexMeta,
                 exact: DataFrame, vecCol: String, k: Int,
                 dir: String, floor: Double): DataFrame = {
    val op = operatingPoint(queries.sparkSession, dir, floor)
    require(op.isDefined,
      s"no stored operating point reaches recall floor $floor for " +
        s"AnnIndex at $dir — the index is out of its rated band: " +
        s"reindexAuto + re-measure the tuning frame, don't probe harder")
    val (nprobe, shortlist) = op.get
    search(queries, codes, meta, exact, vecCol, k, nprobe, shortlist)
  }

  // ------------------------------------------------------------------
  // storage plumbing

  private def writeCodes(codes: DataFrame, dir: String, table: String,
                         idCol: String, numBuckets: Int,
                         mode: SaveMode): Unit =
    codes.write.mode(mode).format("parquet")
      .bucketBy(numBuckets, "cell").sortBy("cell")
      .option("path", s"$dir/codes")
      .saveAsTable(table)

  private def registerIfAbsent(spark: SparkSession, dir: String,
                               table: String, meta: IndexMeta): Unit =
    if (!spark.catalog.tableExists(table)) {
      val codeCols = meta.books.indices
        .map(i => s"code_$i BIGINT").mkString(", ")
      spark.sql(
        s"""CREATE TABLE $table (${meta.idCol} ${meta.idType}, cell BIGINT, $codeCols)
           |USING PARQUET
           |CLUSTERED BY (cell) SORTED BY (cell) INTO ${meta.numBuckets} BUCKETS
           |LOCATION '$dir/codes'""".stripMargin)
    }

  /** The coding scheme this implementation writes and scores with.
    * Persisted in meta_params so an artifact written under a
    * DIFFERENT scheme (e.g. a pre-residual raw-codes index) fails
    * LOUDLY at load instead of silently scoring raw codes with
    * residual ADC arithmetic. */
  val CodesEncoding = "residual"

  /** Trained artifacts as tiny parquet tables — doubles round-trip
    * exactly, and no JSON codec dependency. */
  private def writeMeta(spark: SparkSession, dir: String,
                        meta: IndexMeta): Unit = {
    import spark.implicits._
    Seq((meta.idCol, meta.idType, meta.numBuckets, CodesEncoding))
      .toDF("id_col", "id_type", "num_buckets", "codes_encoding")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/meta_params")
    meta.cents.zipWithIndex.flatMap { case (c, cell) =>
      c.zipWithIndex.map { case (v, pos) => (cell, pos, v) }
    }.toSeq.toDF("cell", "pos", "v")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/meta_cents")
    meta.books.zipWithIndex.flatMap { case (b, sub) =>
      b.zipWithIndex.flatMap { case (cj, j) =>
        cj.zipWithIndex.map { case (v, pos) => (sub, j, pos, v) }
      }
    }.toSeq.toDF("sub", "j", "pos", "v")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/meta_books")
  }

  def loadMeta(spark: SparkSession, dir: String): IndexMeta = {
    val params = spark.read.parquet(s"$dir/meta_params")
    // encoding gate: an artifact with no marker predates residual
    // coding (raw codes) — applying residual ADC to it would return
    // silently wrong scores, so refuse both absent and mismatched
    require(params.columns.contains("codes_encoding"),
      s"AnnIndex at $dir carries no codes_encoding marker — it was " +
        s"written by a pre-residual build (raw codes); rebuild with " +
        s"AnnIndex.write before searching with this version")
    val enc = params.select("codes_encoding").head().getString(0)
    require(enc == CodesEncoding,
      s"AnnIndex at $dir is '$enc'-encoded but this build scores " +
        s"'$CodesEncoding' codes — rebuild the index or match versions")
    val p = params.select("id_col", "id_type", "num_buckets").head()
    val cents = spark.read.parquet(s"$dir/meta_cents")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3)).toArray
    val books = spark.read.parquet(s"$dir/meta_books")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.groupBy(_._2).toSeq.sortBy(_._1)
        .map(_._2.sortBy(_._3).map(_._4)).toArray).toArray
    IndexMeta(p.getString(0), p.getString(1), p.getInt(2), cents, books)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    if (f.exists()) { f.delete(); () }
  }
}
