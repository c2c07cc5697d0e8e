package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming re-expression of the reference's always-on
  * loop (SURVEY.md §2.E): gateway webRequestBatcher → processor
  * mainLoop → router delivery (kassette-server gateway.go:144,
  * processor.go:87, router.go JobsRequestWorker) become one
  * readStream → transform → writeStream pipeline; the job-queue
  * polling disappears because the stream IS the queue.
  */
object StreamingPipeline {

  case class EvtW(user_id: Long, event_type: String, ts_ms: Long,
                  value: Double, ts: Timestamp)
  case class SessionState(start_ms: Long, last_ms: Long, n: Long)
  case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** Watermarked per-destination micro-batch stats — the streaming
    * router fan-out (per event_type per window, replacing the
    * router's in-memory success/failure counters). */
  def fanoutCounts(events: DataFrame, watermark: String = "10 minutes",
                   window_ : String = "5 minutes"): DataFrame =
    events
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))

  /** Gap-based streaming sessionization via flatMapGroupsWithState —
    * the createSessions loop (processor.go:525-576) with its
    * priority-queue gap check replaced by event-time state timeout.
    * A session closes when a bigger-than-gap gap arrives in-stream or
    * when the watermark passes last_ms+gap (timeout) — exactly the
    * reference's "enough time hasn't transpired" logic, minus the
    * single-process in-memory maps: state is sharded by user across
    * executors and checkpointed. */
  def sessionize(events: DataFrame, gapMs: Long,
                 watermark: String = "10 minutes"): Dataset[SessionOut] = {
    implicit val evtEnc = Encoders.product[EvtW]
    implicit val stEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val longEnc = Encoders.scalaLong

    events
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .select("user_id", "event_type", "ts_ms", "value", "ts")
      .withWatermark("ts", watermark)
      .as[EvtW]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EvtW], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.start_ms, s.last_ms, s.n))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts_ms)
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts_ms - s.last_ms <= gapMs =>
                  cur = Some(SessionState(s.start_ms, e.ts_ms, s.n + 1))
                case Some(s) =>
                  closed += SessionOut(userId, s.start_ms, s.last_ms, s.n)
                  cur = Some(SessionState(e.ts_ms, e.ts_ms, 1))
                case None =>
                  cur = Some(SessionState(e.ts_ms, e.ts_ms, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last_ms + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Scd2 per-key state. `open = false` marks the post-flush
    * TOMBSTONE: the open version was already emitted as current, but
    * the row lingers one more timeout cycle carrying the version
    * high-water mark, so a key that resumes after a flush continues
    * at version+1 instead of restarting at 1 (which would emit
    * duplicate (user_id, version) keys downstream). */
  case class Scd2State(state: String, valid_from_ms: Long, version: Long,
                       n: Long, open: Boolean = true)
  case class EvtScd(user_id: Long, event_type: String, ts_ms: Long,
                    value: Double, ts: Timestamp, tie: Long)
  /** `valid_to_ms == -1` marks the OPEN (current) version flushed by
    * state timeout; in-stream closures always carry the real close
    * timestamp (the next version's valid_from). */
  case class Scd2Out(user_id: Long, version: Long, state: String,
                     valid_from_ms: Long, valid_to_ms: Long, n_events: Long)

  /** Streaming SCD Type-2 maintenance — the live twin of
    * `JobLedger.scd2History`: per key, each state CHANGE closes the
    * previous version in-stream (valid_to = the new valid_from) and
    * opens the next; the open version lives in one small state row
    * per key and flushes (valid_to = -1 ⇒ current) when the
    * watermark passes last-seen + `flushAfterMs`. The jobsdb
    * row-UPDATE lifecycle as an always-on dimension feed: each
    * Postgres UPDATE in the reference becomes exactly one closed
    * version emitted downstream, no history rescans. Replayed with
    * sentinel punctuation this is hash-equal to the batch builder's
    * closed versions (see StreamingSpec).
    *
    * Determinism: within a micro-batch events sort by
    * (ts_ms, tieBreakCol) — the same total order as the batch
    * builder's (ts, tieBreak). ACROSS micro-batches arrival order is
    * assumed to respect event time (same design limitation as
    * [[sessionize]]): a cross-batch out-of-order event would rewrite
    * already-emitted history, and the watermark is not used to
    * buffer. After a timeout flush the key's state degrades to a
    * version-HWM tombstone for one more `flushAfterMs` cycle, so
    * resumed keys keep version numbering monotone. */
  def scd2Stream(events: DataFrame, flushAfterMs: Long,
                 watermark: String = "10 minutes",
                 tieBreakCol: String = "ts_ms"): Dataset[Scd2Out] = {
    implicit val evtEnc = Encoders.product[EvtScd]
    implicit val stEnc = Encoders.product[Scd2State]
    implicit val outEnc = Encoders.product[Scd2Out]
    implicit val longEnc = Encoders.scalaLong

    events
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withColumn("tie", col(tieBreakCol).cast("long"))
      .select("user_id", "event_type", "ts_ms", "value", "ts", "tie")
      .withWatermark("ts", watermark)
      .as[EvtScd]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Out](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EvtScd], state: GroupState[Scd2State]) =>
          if (state.hasTimedOut) {
            val s = state.get
            if (s.open) {
              // flush the current version, keep the HWM tombstone for
              // one more cycle
              state.update(s.copy(open = false))
              state.setTimeoutTimestamp(
                state.getCurrentWatermarkMs() + flushAfterMs)
              Iterator.single(
                Scd2Out(userId, s.version, s.state, s.valid_from_ms, -1L, s.n))
            } else {
              state.remove()
              Iterator.empty
            }
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts_ms, e.tie))
            var cur = state.getOption
            val closed = Seq.newBuilder[Scd2Out]
            sorted.foreach { e =>
              cur match {
                case Some(s) if s.open && s.state == e.event_type =>
                  cur = Some(s.copy(n = s.n + 1))
                case Some(s) if s.open =>
                  closed += Scd2Out(userId, s.version, s.state,
                    s.valid_from_ms, e.ts_ms, s.n)
                  cur = Some(Scd2State(e.event_type, e.ts_ms, s.version + 1, 1))
                case Some(s) => // tombstone: resume past the flushed HWM
                  cur = Some(Scd2State(e.event_type, e.ts_ms, s.version + 1, 1))
                case None =>
                  cur = Some(Scd2State(e.event_type, e.ts_ms, 1L, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(sorted.last.ts_ms + flushAfterMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Stream-static auth enrichment — gateway writeKey auth on a live
    * stream (gateway.go getPayloadAndWriteKey): the enabled-sources
    * config is a static broadcast dim, so each micro-batch filters
    * without shuffling the stream. NOTE: the static side's plan is
    * resolved ONCE at query start — for hot config reloads use
    * [[authFilterRefreshing]], which re-resolves per micro-batch. */
  def authFilterStream(events: DataFrame, enabledSources: DataFrame,
                       keyCol: String): DataFrame =
    events.join(
      org.apache.spark.sql.functions.broadcast(enabledSources.select(keyCol)),
      Seq(keyCol), "left_semi")

  /** Hot-reloading auth gate — the backendconfig polling loop
    * (backendconfig/configdb.go: sources/destinations re-fetched on an
    * interval and hot-applied) as Spark streaming: `resolveKeys` runs
    * at the START of every micro-batch, so a key enabled or revoked
    * between batches takes effect on the very next batch — no query
    * restart. The per-batch cost is one tiny broadcast (the config
    * dim), never a stream shuffle. */
  def authFilterRefreshing(events: DataFrame, resolveKeys: () => DataFrame,
                           keyCol: String)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch {
      (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val keys = org.apache.spark.sql.functions.broadcast(
          resolveKeys().select(keyCol))
        sink(df.join(keys, Seq(keyCol), "left_semi").toDF(), batchId)
    }

  /** Stream-stream interval join: purchases matched to every view in
    * the preceding `beforeMs` on the same user. Both sides carry
    * watermarks so Spark bounds the join state — buffered rows expire
    * once the watermark passes the band, the streaming equivalent of
    * IntervalJoin.bucketed's bounded buckets. */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
                         keyCol: String, beforeMs: Long,
                         watermark: String = "10 minutes"): DataFrame = {
    val l = left.withColumn("l_ts", timestamp_millis(col("ts_ms")))
      .withWatermark("l_ts", watermark)
      .select(col(keyCol).as("l_key"), col("l_ts"),
        col("event_id").as("l_id"))
    val r = right.withColumn("r_ts", timestamp_millis(col("ts_ms")))
      .withWatermark("r_ts", watermark)
      .select(col(keyCol).as("r_key"), col("r_ts"),
        col("event_id").as("r_id"))
    l.join(r, expr(
      s"""l_key = r_key AND
         |r_ts BETWEEN l_ts - interval ${beforeMs / 1000} seconds AND l_ts
         |""".stripMargin))
  }

  /** Streaming gateway dedup — the TTL'd seen-ids store as a stream
    * op: `dropDuplicatesWithinWatermark` keeps the first event per id
    * and expires state once the watermark passes, so the state store
    * is bounded by (arrival rate × watermark), not by history — the
    * streaming twin of `Dedup.keepFirstWithinTtl`. */
  def dedupStream(events: DataFrame, idCols: Seq[String],
                  watermark: String = "10 minutes"): DataFrame =
    events
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Replay-batching rule, EXECUTABLE (the autoCells discipline
    * applied to micro-batch sizing): a file-replay's trigger COUNT
    * should be bounded, not O(files). Every micro-batch pays a fixed
    * floor — planning, offset/commit log writes, and one state-store
    * load + version-commit per shuffle partition (the HDFS-backed
    * provider clones the map per version, so per-trigger state cost
    * grows with accumulated state) — while the stateful semantics
    * being exercised (pairs across batches, keeper hand-off) only
    * need SOME batch boundaries, not one per file.
    * maxFilesPerTrigger = ⌈nFiles / targetBatches⌉ bounds any replay
    * at ≤ targetBatches triggers and degrades to 1 file/trigger
    * (every boundary exercised) on small corpora, so gate-scale runs
    * are unchanged while N-file volumes stop paying the floor N
    * times. */
  def autoFilesPerTrigger(nFiles: Long, targetBatches: Int = 16): Int = {
    require(nFiles >= 0 && targetBatches > 0,
      s"autoFilesPerTrigger: nFiles=$nFiles targetBatches=$targetBatches")
    math.max(1L, (nFiles + targetBatches - 1) / targetBatches).toInt
  }

  case class BandHit(id: Long, band: Int, band_hash: String)
  case class BucketIds(ids: List[Long])
  case class NearDupPair(id1: Long, id2: Long)

  /** Streaming MinHash-LSH near-dup detection — the always-on twin of
    * [[graft.operators.Dedup.minhashLsh]] (gate query d_minhash_lsh):
    * each arriving document is signed ROW-LOCALLY (the signature fold
    * runs inside the projection — [[graft.operators.Dedup
    * .rowLocalShingleHashes]] — no stateful aggregation, bit-identical
    * to the batch groupBy signature), banded, and checked against the
    * accumulated per-bucket membership via flatMapGroupsWithState: a
    * new doc emits a candidate pair against every existing member of
    * any band bucket it lands in, the instant it arrives.
    *
    * Pairs are emitted AT-LEAST-ONCE (two bands can collide for the
    * same pair — the batch path resolves this with distinct(); a
    * streaming consumer dedups on (id1,id2) like every at-least-once
    * seam). State per bucket is its member id list — the same memory
    * envelope the batch self-join's bucket holds, sharded across
    * executors by the band key exactly like the batch shuffle.
    *
    * Unbounded streams bound that state two ways (composable):
    *
    *  - `initialBands`: BOOTSTRAP the bucket membership from a
    *    persisted band table ([[graft.operators.Dedup.lshBands]] —
    *    the artifact [[graft.operators.Dedup.minhashLshDelta]] joins
    *    against), so a restarted stream pairs new docs against the
    *    whole prior corpus WITHOUT replaying it. Pairs internal to
    *    the snapshot are NOT re-emitted — they live in the persisted
    *    pair table, exactly the delta contract (old ∪ streamed ==
    *    full recompute; spec-pinned on the real corpus).
    *  - `stateTtlMs`: an idle-bucket TTL (ProcessingTime timeout —
    *    the timer resets whenever the bucket sees a doc). Expired
    *    buckets drop, so state tracks the ACTIVE working set instead
    *    of growing O(corpus seen). The documented trade: a new doc
    *    cannot pair with a doc whose every shared bucket has been
    *    idle past the TTL — dedup-against-recent, the horizon a
    *    production crawl actually wants; periodic compaction back
    *    into the band table (minhashLshDelta's path) restores full
    *    recall. NB processing-time timers make the engine's no-data
    *    micro-batches report "requires another batch" forever, so
    *    `processAllAvailable()`-style synchronization never settles
    *    with the default `noDataMicroBatches.enabled=true`; an
    *    always-on stream doesn't care, and replay-style harnesses
    *    disable no-data batches (timers then fire inside ordinary
    *    data batches). */
  def lshNearDupStream(docs: DataFrame, idCol: String, textCol: String,
                       shingleK: Int = 3, numPerms: Int = 16,
                       rowsPerBand: Int = 4,
                       initialBands: Option[DataFrame] = None,
                       stateTtlMs: Option[Long] = None): Dataset[NearDupPair] = {
    implicit val hitEnc = Encoders.product[BandHit]
    implicit val stEnc = Encoders.product[BucketIds]
    implicit val outEnc = Encoders.product[NearDupPair]
    implicit val keyEnc = Encoders.STRING

    val withShs = docs.select(col(idCol).cast("long").as("id"),
        graft.operators.Dedup.rowLocalShingleHashes(col(textCol), shingleK)
          .as("shs"))
      .filter(size(col("shs")) > 0)
    val sig = withShs.select(col("id"),
      graft.operators.Dedup.signatureFromHashes(col("shs"), numPerms).as("sig"))
    val bandCols = (0 until numPerms / rowsPerBand).map { j =>
      md5(concat_ws("|",
        (0 until rowsPerBand).map(r => col("sig").getItem(j * rowsPerBand + r)): _*))
    }
    val grouped = sig.select(col("id"),
        posexplode(array(bandCols: _*)).as(Seq("band", "band_hash")))
      .as[BandHit]
      .groupByKey(r => s"${r.band}|${r.band_hash}")
    val timeoutConf =
      if (stateTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val fold = (_: String, rows: Iterator[BandHit], state: GroupState[BucketIds]) =>
      if (state.hasTimedOut) {
        // idle past the TTL: this bucket's members leave the dup
        // horizon (they stay pair-able through their OTHER buckets
        // until those expire too)
        state.remove()
        Iterator.empty: Iterator[NearDupPair]
      } else {
        val seen = state.getOption.map(_.ids).getOrElse(Nil)
        // sorted for deterministic emission; re-delivered ids are
        // no-ops against membership
        val arriving = rows.map(_.id).toSeq.distinct.sorted
        val out = Seq.newBuilder[NearDupPair]
        var members = seen
        arriving.filterNot(seen.contains).foreach { id =>
          members.foreach { m =>
            out += NearDupPair(math.min(id, m), math.max(id, m))
          }
          members = id :: members
        }
        state.update(BucketIds(members))
        stateTtlMs.foreach(state.setTimeoutDuration)
        out.result().iterator
      }
    initialBands match {
      case Some(bands) =>
        implicit val snapEnc = Encoders.product[(String, List[Long])]
        val init = bands
          .groupBy(col("band"), col("band_hash"))
          .agg(sort_array(collect_list(col(idCol).cast("long"))).as("ids"))
          .select(concat_ws("|", col("band"), col("band_hash")).as("_1"),
            col("ids").as("_2"))
          .as[(String, List[Long])]
          .groupByKey(_._1).mapValues(t => BucketIds(t._2))
        grouped.flatMapGroupsWithState[BucketIds, NearDupPair](
          OutputMode.Append(), timeoutConf, init)(fold)
      case None =>
        grouped.flatMapGroupsWithState[BucketIds, NearDupPair](
          OutputMode.Append(), timeoutConf)(fold)
    }
  }

  case class CellHit(id: Long, cell_key: String)
  case class CellKeeper(keep: Long)
  case class PqDropDecision(cell_key: String, keep_id: Long, drop_id: Long)

  /** Streaming compressed-domain semantic dedup — d_pq_semdedup's
    * always-on twin (semantic dedup AT INGEST, the path a live crawl
    * needs): each arriving vector is PQ-coded ROW-LOCALLY against the
    * codebook literals (the [[graft.operators.Similarity.pqCodes]]
    * expressions inside the projection — no training, no shuffle of
    * floats), and vectors whose m codes all agree share a cell =
    * a near-dup cluster at codebook resolution. State per occupied
    * cell is ONE long (the current keeper — the minimum id seen), so
    * the state store holds exactly the occupied-cell count regardless
    * of corpus size — strictly tighter than [[lshNearDupStream]]'s
    * member lists.
    *
    * Emission contract: a drop decision per non-keeper arrival, with
    * `keep_id` = the keeper AT EMISSION (where a router would send
    * the duplicate right now). When a smaller id arrives into an
    * occupied cell the old keeper is demoted and emitted as the drop
    * (keep = the new min) — so over any prefix of the stream the
    * emitted drop_id set is exactly "every member of the cell except
    * the minimum seen so far": streamed drops == the batch
    * d_pq_semdedup drop set once the corpus has streamed (spec- and
    * gate-pinned), and the FINAL keeper per cell always appears as
    * the `keep_id` of at least one emission for multi-member cells,
    * so the batch output reconstructs from the emission log alone.
    *
    * Bounds for unbounded streams, composable like lshNearDupStream:
    *  - `initialCodes`: bootstrap keepers from a persisted codes
    *    table ([[graft.operators.AnnIndex]]'s artifact — (id, cell,
    *    code_0..code_{m-1}) rows, used with `cents` so stream coding
    *    matches the artifact's residual domain): min id per occupied
    *    cell seeds the state, so a restarted stream dedups against
    *    the whole prior corpus without replaying it;
    *    snapshot-internal drops are NOT re-emitted (they live in the
    *    batch output — the delta contract).
    *  - `stateTtlMs`: idle-cell TTL — an expired cell's keeper drops
    *    out of the horizon; dedup-against-recent, compaction back
    *    into the codes table ([[graft.operators.AnnIndex.append]])
    *    restores full coverage. */
  def pqDedupStream(docs: DataFrame, idCol: String, vecCol: String,
                    books: Array[Array[Array[Double]]],
                    initialCodes: Option[DataFrame] = None,
                    stateTtlMs: Option[Long] = None,
                    cents: Option[Array[Array[Double]]] = None): Dataset[PqDropDecision] = {
    implicit val hitEnc = Encoders.product[CellHit]
    implicit val stEnc = Encoders.product[CellKeeper]
    implicit val outEnc = Encoders.product[PqDropDecision]
    implicit val keyEnc = Encoders.STRING

    // fail-fast mode check: a residual AnnIndex artifact carries a
    // `cell` column and its codes are only meaningful WITH `cents`
    // (the snapshot key must be cell-qualified); a raw-PQ snapshot
    // has no cell. Mixing them would merge distinct (cell, codes)
    // groups or compare residual keys against raw stream keys —
    // silent wrong dedup, so refuse at construction.
    initialCodes.foreach { c =>
      require(c.columns.contains("cell") == cents.isDefined,
        s"pqDedupStream: initialCodes schema [${c.columns.mkString(", ")}] " +
          s"does not match the coding mode (cents ${if (cents.isDefined) "given — expected a residual artifact with a `cell` column" else "absent — expected a raw-PQ snapshot without a `cell` column"})")
    }

    // With `cents` the stream codes RESIDUALS against the composed
    // index's artifacts (Similarity.pqCodesResidual — books must be
    // residual-trained), and the dedup key includes the coarse cell:
    // residual codes only identify a reconstruction together with
    // their centroid. This is the mode that bootstraps from (and
    // compacts back into) an AnnIndex artifact, whose (id, cell,
    // code_*) rows carry exactly these key columns. Without `cents`
    // the stream codes raw vectors (standalone-PQ dedup, the
    // d_stream_pqdedup gate path).
    val keyOf = (cols: Seq[String]) => concat_ws("|", cols.map(col): _*)
    val codeCols = books.indices.map(i => s"code_$i")
    val keyCols = cents.map(_ => "cell" +: codeCols).getOrElse(codeCols)
    val hits = (cents match {
      case Some(c) => graft.operators.Similarity
        .pqCodesResidual(docs, idCol, vecCol, c, books)
      case None => graft.operators.Similarity
        .pqCodes(docs, idCol, vecCol, books)
    })
      .select(col(idCol).cast("long").as("id"),
        keyOf(keyCols).as("cell_key"))
      .as[CellHit]
    val timeoutConf =
      if (stateTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val fold = (key: String, rows: Iterator[CellHit],
                state: GroupState[CellKeeper]) =>
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty: Iterator[PqDropDecision]
      } else {
        // ascending order: within a micro-batch the smallest id takes
        // the cell first, so single-batch replays emit the batch
        // output verbatim (keep = final min everywhere)
        val arriving = rows.map(_.id).toSeq.distinct.sorted
        val out = Seq.newBuilder[PqDropDecision]
        var keeper = state.getOption.map(_.keep)
        arriving.foreach { id =>
          keeper match {
            case None => keeper = Some(id)
            case Some(k) if id == k => () // redelivery no-op
            case Some(k) if id > k => out += PqDropDecision(key, k, id)
            case Some(k) => // new minimum: demote the old keeper
              out += PqDropDecision(key, id, k)
              keeper = Some(id)
          }
        }
        keeper.foreach(k => state.update(CellKeeper(k)))
        stateTtlMs.foreach(state.setTimeoutDuration)
        out.result().iterator
      }
    val grouped = hits.groupByKey(_.cell_key)
    initialCodes match {
      case Some(codes) =>
        implicit val snapEnc = Encoders.product[(String, Long)]
        val init = codes
          .groupBy(keyOf(keyCols).as("cell_key"))
          .agg(min(col(idCol).cast("long")).as("keep"))
          .select(col("cell_key").as("_1"), col("keep").as("_2"))
          .as[(String, Long)]
          .groupByKey(_._1).mapValues(t => CellKeeper(t._2))
        grouped.flatMapGroupsWithState[CellKeeper, PqDropDecision](
          OutputMode.Append(), timeoutConf, init)(fold)
      case None =>
        grouped.flatMapGroupsWithState[CellKeeper, PqDropDecision](
          OutputMode.Append(), timeoutConf)(fold)
    }
  }

  /** Streaming contamination gate — d_bloom_contam's always-on twin
    * (eval-set leakage checked at INGEST, not in a nightly audit):
    * the train-fingerprint Bloom sketch builds ONCE driver-side and
    * broadcasts; each arriving doc is prefiltered ROW-LOCALLY (no
    * state, no shuffle), and only the matches + fpp sliver
    * stream-static join the exact fingerprint counts — the same
    * two-phase exactness the batch gate proves (no false negatives
    * by bloom construction, false positives killed by the exact
    * join). At fleet scale the sketch is MBs for 10⁹ fingerprints
    * while the exact side stays a broadcast of only the MATCHED
    * fingerprints' counts. */
  def contamGateStream(docs: DataFrame, fpCol: String, trainFps: DataFrame,
                       expectedKeys: Long, fpp: Double = 0.03): DataFrame = {
    val bf = graft.operators.BloomAuth.build(
      trainFps.select(fpCol), fpCol, math.max(1000L, expectedKeys), fpp)
    val counts = trainFps.groupBy(fpCol).agg(count(lit(1)).as("n_train_matches"))
    docs.filter(graft.operators.BloomAuth.mightContain(bf, col(fpCol),
        org.apache.spark.sql.types.StringType))
      .join(broadcast(counts), fpCol)
  }

  case class AttemptEvt(job_id: Long, ts_ms: Long, ok: Boolean)
  case class AttemptEvtW(job_id: Long, ts_ms: Long, ok: Boolean, ts: Timestamp)
  case class RetryState(attempts: Int, aborted: Boolean)
  case class RetryDecision(job_id: Long, attempts: Int, action: String,
                           next_attempt_ms: Long)

  /** Streaming router retry state machine (router.go
    * JobsRequestWorker: attempt counting, failed-job requeue,
    * abort past maxRetryNumber) — per-job state via
    * flatMapGroupsWithState, with exponential backoff scheduling:
    * failure n ⇒ retry at ts + base·2ⁿ⁻¹, until `maxRetry` failures
    * abort the job; success emits `done` and clears state.
    *
    * Aborted is TERMINAL (jobsdb.go AbortedState): the abort leaves a
    * tombstone, so later attempts for a poison-pill job are dropped
    * silently instead of re-emitting `abort` with a rising counter —
    * and the tombstone itself expires once the event-time watermark
    * passes abort_ts + `tombstoneTtlMs`, so state stays bounded by the
    * abort rate × TTL, not by history. The reference keeps this in
    * per-worker memory + Postgres rows; here state is sharded by job
    * across executors and checkpointed. */
  def retryBackoffStream(attempts: Dataset[AttemptEvt], maxRetry: Int,
                         baseBackoffMs: Long,
                         tombstoneTtlMs: Long = 3600000L,
                         watermark: String = "10 minutes"): Dataset[RetryDecision] = {
    implicit val evtEnc = Encoders.product[AttemptEvtW]
    implicit val stEnc = Encoders.product[RetryState]
    implicit val outEnc = Encoders.product[RetryDecision]
    implicit val longEnc = Encoders.scalaLong

    attempts.toDF()
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", watermark)
      .as[AttemptEvtW]
      .groupByKey(_.job_id)
      .flatMapGroupsWithState[RetryState, RetryDecision](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (jobId: Long, rows: Iterator[AttemptEvtW], state: GroupState[RetryState]) =>
          if (state.hasTimedOut) {
            // expired abort tombstone — drop the row, nothing to emit
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.ts_ms)
            var st = state.getOption.getOrElse(RetryState(0, aborted = false))
            var lastMs = 0L
            val out = Seq.newBuilder[RetryDecision]
            sorted.foreach { e =>
              lastMs = e.ts_ms
              if (st.aborted) {
                // terminal: an aborted job never retries or completes
              } else if (e.ok) {
                out += RetryDecision(jobId, st.attempts, "done", -1L)
                st = RetryState(0, aborted = false)
              } else {
                val n = st.attempts + 1
                if (n >= maxRetry) {
                  out += RetryDecision(jobId, n, "abort", -1L)
                  st = RetryState(n, aborted = true)
                } else {
                  out += RetryDecision(jobId, n, "retry",
                    e.ts_ms + baseBackoffMs * (1L << (n - 1)))
                  st = RetryState(n, aborted = false)
                }
              }
            }
            if (st.aborted) {
              state.update(st)
              // clamp above the eviction watermark: an abort driven by
              // a late event during backfill could place lastMs + TTL
              // below the watermark, and setTimeoutTimestamp would
              // throw and kill the query
              state.setTimeoutTimestamp(math.max(lastMs + tombstoneTtlMs,
                state.getCurrentWatermarkMs() + 1))
            } else if (st.attempts == 0) state.remove()
            else state.update(st)
            out.result().iterator
          }
      }
  }

  /** One micro-batch, delivered idempotently: the batch id keys a
    * dynamic partition overwrite, so redelivery of the same batch
    * (restart before the checkpoint committed) replaces its own
    * partition instead of appending duplicates. */
  def deliverBatch(df: DataFrame, batchId: Long, path: String): Unit =
    df.withColumn("_batch_id", lit(batchId))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch_id")
      .parquet(path)

  /** Exactly-once warehouse delivery via foreachBatch + `deliverBatch`
    * — the jobsdb executing→succeeded transactional claim
    * (jobsdb.go UpdateJobStatus) re-expressed as deterministic
    * storage layout instead of row locks: at-least-once replay ×
    * idempotent write = exactly-once output. */
  def idempotentSink(stream: DataFrame, path: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        deliverBatch(df.toDF(), batchId, path)
    }

  /** Streaming curation funnel: the SAME cumulative pass-flag
    * aggregation as operators.FilterChain.funnel, run as a
    * complete-mode global streaming aggregate — the corpus streams
    * in and the funnel counters stay current after every micro-batch
    * (a curation dashboard over an arriving crawl). State is one row
    * of longs regardless of corpus size; after the last batch the
    * counts equal the batch funnel's bit-for-bit (pinned in
    * StreamingSpec). Stack the row into per-stage funnel rows on the
    * consumer side — generators don't belong inside a complete-mode
    * streaming agg. */
  def funnelStream(docs: DataFrame,
                   stages: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    val counts = graft.operators.FilterChain.passCounts(stages)
    docs.agg(counts.head, counts.tail: _*)
  }

  case class FunnelState(fv: Long, fc: Long, fp: Long) // -1 = unset
  case class FunnelOut(user_id: Long, view_ms: Long, click_ms: Long,
                       purchase_ms: Long)

  /** Streaming ordered-funnel tracking — the live twin of
    * `p_funnel_steps`: one tiny state row per user holds the first
    * qualifying (view, click-after-view, purchase-after-click)
    * timestamps, updated in event order per micro-batch. The journey
    * emits when a `sentinelType` punctuation event for the user
    * arrives (clearing state) or when the watermark passes last-seen
    * + `flushAfterMs` — so per-user state is bounded by activity, not
    * corpus size. Unset stages emit −1. */
  def funnelJourneyStream(events: DataFrame, flushAfterMs: Long,
                          sentinelType: String = " flush",
                          watermark: String = "10 minutes"): Dataset[FunnelOut] = {
    implicit val evtEnc = Encoders.product[EvtW]
    implicit val stEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[FunnelOut]
    implicit val longEnc = Encoders.scalaLong

    events
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .select("user_id", "event_type", "ts_ms", "value", "ts")
      .withWatermark("ts", watermark)
      .as[EvtW]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EvtW], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(FunnelOut(userId, s.fv, s.fc, s.fp))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts_ms)
            var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
            var flushed = false
            val out = Seq.newBuilder[FunnelOut]
            sorted.foreach { e =>
              if (e.event_type == sentinelType) {
                out += FunnelOut(userId, st.fv, st.fc, st.fp)
                st = FunnelState(-1L, -1L, -1L)
                flushed = true
              } else if (e.event_type == "view" && st.fv < 0) {
                st = st.copy(fv = e.ts_ms)
              } else if (e.event_type == "click" && st.fv >= 0
                  && e.ts_ms > st.fv && st.fc < 0) {
                st = st.copy(fc = e.ts_ms)
              } else if (e.event_type == "purchase" && st.fc >= 0
                  && e.ts_ms > st.fc && st.fp < 0) {
                st = st.copy(fp = e.ts_ms)
              }
            }
            if (flushed && st == FunnelState(-1L, -1L, -1L)) state.remove()
            else {
              state.update(st)
              state.setTimeoutTimestamp(sorted.last.ts_ms + flushAfterMs)
            }
            out.result().iterator
          }
      }
  }

  /** Streaming status-ledger view: latest status per job via
    * update-mode struct-max agg (jobsdb UpdateJobStatus as a stream;
    * partial-agg friendly, same shape as the batch JobLedger). */
  def latestStatus(status: DataFrame): DataFrame =
    status.groupBy(col("job_id"))
      .agg(max(struct(col("ts_ms"), col("attempt"), col("state"))).as("_top"))
      .select(col("job_id"), col("_top.state").as("last_state"),
        col("_top.attempt").as("attempts"), col("_top.ts_ms").as("last_ms"))

  case class AckIn(dest: String, batch_id: Long, attempt: Long, code: Long,
                   ack_ms: Long, ts: Timestamp)
  case class AckState(n_attempts: Long, last_code: Long, last_ack_ms: Long,
                      terminal: Boolean = false)
  /** `next_retry_ms == -1` ⇒ no retry scheduled (terminal or
    * succeeded). Each emitted row is the batch's CURRENT delivery
    * state after an ack folds in. */
  case class AckOut(dest: String, batch_id: Long, n_attempts: Long,
                    last_code: Long, state: String, next_retry_ms: Long)

  /** The delivery-ack ledger LIVE — the streaming twin of
    * `Router.ackLedger` (router.go JobsRequestWorker response
    * handling as a per-batch state machine): each ack folds into one
    * small state row per in-flight batch and emits the batch's
    * current ledger state (append per transition). Same code→state
    * mapping as the batch operator: 2xx succeeded, 429/5xx
    * waiting_retry with integer-exponential backoff until `maxRetry`
    * then aborted, other 4xx aborted immediately. Terminality is
    * enforced the retryBackoffStream way: a terminal batch keeps an
    * EXPIRING event-time tombstone (removed once the watermark passes
    * last_ack + `tombstoneTtlMs`), so late/duplicate acks inside the
    * TTL are dropped instead of reopening the batch — state size
    * tracks in-flight + recently-terminal envelopes, never history.
    * In-flight (non-terminal) rows set no timeout: an envelope stays
    * claimable until its acks resolve it, as in the jobsdb executing
    * state. Acks fold in (attempt, ack_ms) order within a
    * micro-batch. */
  def ackLedgerStream(acks: DataFrame, maxRetry: Int, baseBackoffMs: Long,
                      tombstoneTtlMs: Long = 3600000L,
                      watermark: String = "10 minutes"): Dataset[AckOut] = {
    implicit val inEnc = Encoders.product[AckIn]
    implicit val stEnc = Encoders.product[AckState]
    implicit val outEnc = Encoders.product[AckOut]
    implicit val keyEnc = Encoders.tuple(Encoders.STRING, Encoders.scalaLong)

    acks
      .withColumn("ts", timestamp_millis(col("ack_ms")))
      .select("dest", "batch_id", "attempt", "code", "ack_ms", "ts")
      .withWatermark("ts", watermark)
      .as[AckIn]
      .groupByKey(a => (a.dest, a.batch_id))
      .flatMapGroupsWithState[AckState, AckOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (String, Long), rows: Iterator[AckIn], state: GroupState[AckState]) =>
          val (dest, batchId) = key
          if (state.hasTimedOut) {
            state.remove() // tombstone expired
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(a => (a.attempt, a.ack_ms))
            var cur = state.getOption
            val out = Seq.newBuilder[AckOut]
            sorted.foreach { a =>
              if (!cur.exists(_.terminal)) {
                val n = cur.map(_.n_attempts).getOrElse(0L) + 1L
                val retryable = a.code == 429L || (a.code >= 500L && a.code <= 599L)
                val (label, next) =
                  if (a.code >= 200L && a.code <= 299L) ("succeeded", -1L)
                  else if (retryable && n >= maxRetry) ("aborted", -1L)
                  else if (retryable)
                    ("waiting_retry", a.ack_ms + baseBackoffMs *
                      (1L << math.min(n - 1L, 20L).toInt))
                  else ("aborted", -1L)
                cur = Some(AckState(n, a.code, a.ack_ms,
                  terminal = label == "succeeded" || label == "aborted"))
                out += AckOut(dest, batchId, n, a.code, label, next)
              }
            }
            cur.foreach { st =>
              state.update(st)
              if (st.terminal)
                state.setTimeoutTimestamp(st.last_ack_ms + tombstoneTtlMs)
            }
            out.result().iterator
          }
      }
  }
}
