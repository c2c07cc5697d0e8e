package graft

/** Plan-shape regression guards: the scale properties SURVEY §5
  * claims must stay visible in the optimized plans. */
class PlanAuditSpec extends SparkSpec {

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  test("q6: filters and projection reach the parquet scan") {
    val plan = formatted("q6_revenue_delta")
    assert(plan.contains("PushedFilters:"))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"))
    // pruned read schema: no l_orderkey/l_partkey in the scan
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"))
  }

  test("q3: dim joins are broadcast, not shuffle") {
    val plan = formatted("q3_shipping_priority")
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("p_dedup_exact: aggregation is partial (map-side combine)") {
    val plan = formatted("p_dedup_exact")
    // two HashAggregate phases around one Exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2)
    assert("Exchange".r.findAllIn(plan).size >= 1)
  }

  test("p_job_latest_status uses struct-max agg, not rank+filter") {
    val plan = formatted("p_job_latest_status")
    assert(!plan.contains("Window"))
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
  }

  test("q8: all seven dims broadcast — lineitem never sort-merge joins") {
    val plan = formatted("q8_market_share")
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
    // part filter reaches the scan
    assert(plan.contains("PushedFilters:") && plan.contains("EqualTo(p_type,PROMO)"))
  }

  test("q11: global threshold joins as broadcast scalar, lineitem scans prune") {
    val plan = formatted("q11_part_value")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchemas.contains("l_shipdate") && !readSchemas.contains("l_quantity"))
  }

  test("d_dedup_apply: AQE broadcasts the small non-keeper side at runtime") {
    // static stats can't size the checkpointed non-keeper set — the
    // broadcast decision is AQE's, so audit the EXECUTED plan
    val df = SparkEntry.queries("d_dedup_apply")(spark, sf)
    df.collect() // finalize THIS plan (count() would execute a different one)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan.linesIterator.take(25).mkString("\n"))
  }

  test("q25: no partition-less window — every Window node is keyed") {
    // The old plan NTILE'd the whole customer table in ONE task
    // ("No Partition Defined for Window operation"). The two-phase
    // decile keeps row_number inside range partitions, so every
    // Window in the plan must carry a partition spec.
    val df = SparkEntry.queries("q25_decile")(spark, sf)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty, w.toString))
  }

  test("p_gateway_batch: both window passes and the agg share ONE hash exchange") {
    // hash(event_type) satisfies the clustering of the finer window
    // and group keys (subset rule), so the run-split window, the
    // size-split window, and the batch aggregation all ride the same
    // shuffle; only the presentation orderBy adds a range exchange.
    val plan = formatted("p_gateway_batch")
    val hashEx = "Arguments: hashpartitioning".r.findAllIn(plan).size
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx:\n" +
      plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("p_scd2: lag, run-sum, per-run agg and lead ride ONE hash exchange") {
    // hashpartitioning(user_id) satisfies the clustering of the
    // (user_id, version) aggregate AND both user_id windows (subset
    // rule) — the whole SCD2 build is one shuffle plus the
    // presentation orderBy's range exchange.
    val plan = formatted("p_scd2")
    val hashEx = "Arguments: hashpartitioning".r.findAllIn(plan).size
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx:\n" +
      plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    assert(!plan.contains("Join"))
  }

  test("p_funnel_steps: three window passes + user agg ride ONE hash exchange") {
    // the naive funnel is a 3-way self-join on user; here the chained
    // running-min windows and the per-user agg all share the
    // user_id partitioning, and the stage summary is one conditional
    // aggregation, not three filtered rescans
    val plan = formatted("p_funnel_steps")
    val hashEx = "Arguments: hashpartitioning".r.findAllIn(plan).size
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx:\n" +
      plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    assert(!plan.contains("Join"))
  }

  test("as-of joins plan exactly one shuffle into the window scan") {
    for (name <- Seq("p_asof_join", "p_asof_forward")) {
      val plan = formatted(name)
      assert(plan.contains("Window"), name)
      // one Exchange for the key partition (plus possibly the final
      // orderBy range exchange) — never a join operator
      assert(!plan.contains("Join"), name)
    }
  }

  test("t_repetition: the repetition folds plan ZERO shuffles") {
    // both metrics are row-local sort+fold HOFs — only the
    // presentation orderBy may add a range exchange
    val plan = formatted("t_repetition")
    val hashEx = "Arguments: hashpartitioning".r.findAllIn(plan).size
    assert(hashEx == 0, s"expected no hash exchange:\n" +
      plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    assert(!plan.contains("Join"))
  }

  test("t_classifier_score: barrier-free — one scan, zero hash exchanges, ONE fused kernel") {
    // r16: the fused ClassifierMargin kernel replaced the interpreted
    // HOF fold AND its collapse-barrier repartition — the production
    // scoring plan must be scan → project → presentation sort, with
    // whole-stage CSE computing the kernel once across the three
    // output expressions (margin / score / keep)
    val plan = formatted("t_classifier_score")
    assert("Arguments: hashpartitioning".r.findAllIn(plan).isEmpty,
      s"expected no hash exchange:\n" +
        plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    assert(!plan.contains("Join") && !plan.contains("Window"))
    val scans = plan.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scans == 1, s"expected 1 scan, got $scans")
    // CSE proof: the project detail lists the kernel once, the other
    // outputs reference it through the eliminated subexpression
    val kernelMentions = "classifier_margin".r.findAllIn(plan).size
    assert(kernelMentions >= 1, "fused kernel missing from the plan")
  }

  test("t_filter_chain: the whole funnel is ONE aggregation of one scan") {
    val plan = formatted("t_filter_chain")
    // one scan of documents — stages are flags, not rescans (count
    // the detail headers; FormattedMode also echoes the node in the
    // tree section)
    val scans = plan.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scans == 1, s"expected 1 scan, got $scans")
    // single global aggregate: partial+final HashAggregate pair, one
    // single-partition exchange between them, no joins/windows
    assert(!plan.contains("Join") && !plan.contains("Window"))
    assert("Arguments: hashpartitioning".r.findAllIn(plan).isEmpty)
  }

  test("q33: the partition-less window reads the BOUNDED daily aggregate") {
    // q33's moving average is the one deliberate partition-less
    // WindowExec — safe only because its input is the per-day
    // aggregate (domain bounded by calendar days, not data volume).
    // Pin that: the window's child must be the Aggregate; an edit
    // moving the window below the agg (onto raw orders) fails here.
    import org.apache.spark.sql.catalyst.plans.logical._
    val df = SparkEntry.queries("q33_moving_avg")(spark, sf)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: Window if w.partitionSpec.isEmpty => w
    }
    assert(windows.size == 1, s"expected exactly one global window, got $windows")
    def firstInteresting(p: LogicalPlan): LogicalPlan = p match {
      case u @ (_: Project | _: Sort) => firstInteresting(u.children.head)
      case other => other
    }
    assert(firstInteresting(windows.head.child).isInstanceOf[Aggregate],
      windows.head.child.toString)
  }

  test("seq_pack / sample_budget / batch_assign / ack_ledger: running-sum windows are range-sharded") {
    // the per-group running sum must never put a whole group on one
    // task: every Window node partitions by (group, __shard) — a
    // regression back to partitionBy(group) alone fails here. r8 adds
    // p_batch_assign and p_ack_ledger: Router.microBatch's
    // row_number() is now a ShardedWindow running count, so the LAST
    // single-task ordered window in an operator path is gone.
    for (name <- Seq("t_seq_pack", "d_sample_budget", "p_batch_assign",
        "p_ack_ledger")) {
      val df = SparkEntry.queries(name)(spark, sf)
      val windows = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      assert(windows.nonEmpty, name)
      windows.foreach { w =>
        assert(w.partitionSpec.size >= 2, s"$name: ${w.partitionSpec}")
        // either range-sharded (running sums) or keyed by the full
        // high-cardinality batch key (ack fold positions — cardinality
        // = number of batches, each partition a handful of acks)
        assert(w.partitionSpec.exists(e =>
          e.toString.contains("__shard") || e.toString.contains("batch_id")),
          s"$name: ${w.partitionSpec}")
      }
    }
  }

  test("d_shuffle_export: global position is range-sharded — no partition-less ordered window") {
    // the global training-order position is the textbook single-task
    // sort (`row_number() OVER (ORDER BY hash)`); pin that the plan's
    // only window partitions by (corpus, __shard) — a regression to a
    // true global window (empty partitionSpec) fails here
    val df = SparkEntry.queries("d_shuffle_export")(spark, sf)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty, "partition-less ordered window")
      assert(w.partitionSpec.exists(_.toString.contains("__shard")),
        s"${w.partitionSpec}")
    }
  }

  test("t_tfidf_top / t_zipf: vocabulary rank is two-phase — no task sorts a full source vocab") {
    // phase 1 ranks within (source, token-hash shard); the only
    // source-only window ranks the ≤ shards·k shard-local survivors
    // (a Filter on __lr sits beneath it) — a regression back to one
    // per-source rank over the full vocabulary fails here
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window}
    for (name <- Seq("t_tfidf_top", "t_zipf")) {
      val df = SparkEntry.queries(name)(spark, sf)
      val windows = df.queryExecution.optimizedPlan.collect {
        case w: Window => w
      }
      assert(windows.size == 2, s"$name: expected 2 windows, got $windows")
      val (local, global) = windows.partition(_.partitionSpec.size >= 2)
      // the shard expr is aliased into a child Project (_w0), so look
      // for the pmod(hash(tok)) shard in the local window's subtree
      assert(local.size == 1 && local.head.toString.contains("pmod(hash("),
        s"$name: ${local.map(_.partitionSpec)}")
      assert(global.size == 1)
      val bounded = global.head.child.collect {
        case f: Filter if f.condition.toString.contains("__lr") => f
      }.nonEmpty
      assert(bounded, s"$name: source-only window not over the " +
        s"bounded survivor set:\n${global.head.child}")
    }
  }

  test("s_pq_topk: ADC shortlist is two-phase — no task sorts the whole scored corpus per query") {
    // the ADC scored frame is |Q| × corpus; a plain per-qid rank
    // window would sort the ENTIRE corpus on one task per query.
    // Pin: every qid-only window ranks a set already bounded by a
    // shard-local (__lr) or shortlist (srnk) filter beneath it, and
    // at least one window is (qid, shard)-sharded phase 1.
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window}
    val df = SparkEntry.queries("s_pq_topk")(spark, sf)
    val windows = df.queryExecution.optimizedPlan.collect { case w: Window => w }
    assert(windows.nonEmpty)
    assert(windows.exists(_.partitionSpec.size >= 2),
      s"no sharded phase-1 window: ${windows.map(_.partitionSpec)}")
    windows.filter(_.partitionSpec.size < 2).foreach { w =>
      assert(w.partitionSpec.nonEmpty, "partition-less ordered window")
      val bounded = w.child.collect {
        case f: Filter if f.condition.toString.contains("__lr") ||
          f.condition.toString.contains("srnk") => f
      }.nonEmpty
      assert(bounded, s"qid-only window over an unbounded set:\n${w.child}")
    }
  }

  test("s_ivfpq_topk: probe prune precedes scoring, shortlist is sharded") {
    // the composed index must keep both scale properties: the probe
    // set joins as a BROADCAST (|Q|·nprobe rows — the prune must not
    // shuffle the codes), and no qid-only window ranks an unbounded
    // set (the pqTopK pin, inherited through the shared tail)
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window}
    val df = SparkEntry.queries("s_ivfpq_topk")(spark, sf)
    val plan = df.queryExecution.sparkPlan
    val bhj = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(bhj.nonEmpty, s"no broadcast join in the probe path:\n$plan")
    // the PROBE join specifically must broadcast (keyed on cell) — the
    // query-LUT broadcast alone must not satisfy this pin, or a
    // regression that shuffles the codes on the probe key would pass
    val probeBhj = bhj.filter(j =>
      (j.leftKeys ++ j.rightKeys).exists(_.references.exists(_.name == "cell")))
    assert(probeBhj.nonEmpty,
      s"probe join (on cell) is not a broadcast join:\n${bhj.mkString("\n")}")
    val windows = df.queryExecution.optimizedPlan.collect { case w: Window => w }
    assert(windows.exists(_.partitionSpec.size >= 2),
      s"no sharded phase-1 window: ${windows.map(_.partitionSpec)}")
    windows.filter(_.partitionSpec.size < 2).foreach { w =>
      assert(w.partitionSpec.nonEmpty, "partition-less ordered window")
      // bounded if a shard-local/shortlist filter sits beneath it, or
      // if the partition's rows come from exploding the LITERAL
      // centroid-score array (the probe ranking: exactly n_cells rows
      // per qid by construction)
      val bounded = w.child.collect {
        case f: Filter if f.condition.toString.contains("__lr") ||
          f.condition.toString.contains("srnk") ||
          f.condition.toString.contains("prnk") => f
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      }.nonEmpty
      assert(bounded, s"qid-only window over an unbounded set:\n${w.child}")
    }
  }

  test("s_ivfpq_tuning: config-bounded rank windows, no cartesian grid join") {
    // the 24-config grid must multiply the ADC stream via a BROADCAST
    // theta join (pr <= nprobe), and every rank window must carry the
    // config keys in its partition — a qid-only window here would sort
    // the whole gridded stream per query
    import org.apache.spark.sql.catalyst.plans.logical.Window
    val df = SparkEntry.queries("s_ivfpq_tuning")(spark, sf)
    val cart = df.queryExecution.sparkPlan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(cart.isEmpty, "grid join degraded to a cartesian shuffle")
    val windows = df.queryExecution.optimizedPlan.collect { case w: Window => w }
    assert(windows.nonEmpty)
    windows.filter(_.partitionSpec.size < 3).foreach { w =>
      // sub-config windows allowed: the probe ranking (literal explode
      // — n_cells rows per partition) and the |Q|-sampled brute-force
      // exact baseline (broadcast-hinted query side — the calibration
      // metric, not a prod path)
      val fromGenerate = w.child.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      }.nonEmpty
      val exactBaseline = w.child.toString.contains("strategy=broadcast")
      assert(fromGenerate || exactBaseline,
        s"unbounded window ${w.partitionSpec}:\n${w.child}")
    }
  }

  test("s_ivfpq_indexed: codes come from the bucketed scan, probe join broadcasts on cell") {
    // the persisted-index gate must actually RIDE the artifact: the
    // codes side is a bucketed file scan (bucket metadata present —
    // strict < pruning at gate params isn't guaranteed since 10
    // queries × nprobe=4 can legitimately cover all 8 cells; the
    // one-probe strict-pruning case is pinned in AnnIndexSpec), the
    // probed cells reach the scan as a pushed IN filter, and the
    // probe set joins as a broadcast keyed on cell — a regression
    // that recomputes codes in-session would lose the bucketed scan
    // and fail here
    val df = SparkEntry.queries("s_ivfpq_indexed")(spark, sf)
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("SelectedBucketsCount"),
      s"codes are not read from the bucketed table:\n$planStr")
    assert(planStr.contains("cell IN") || planStr.contains("cell#"),
      "probe IN filter missing from the scan")
    val bhj = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    val probeBhj = bhj.filter(j =>
      (j.leftKeys ++ j.rightKeys).exists(_.references.exists(_.name == "cell")))
    assert(probeBhj.nonEmpty,
      s"probe join (on cell) is not a broadcast join:\n${bhj.mkString("\n")}")
  }

  test("t_doc_chunk / d_dedup_priority: chunking plans no hash exchange, priority keeper has no rank window") {
    // chunking is a row-local explode — the only exchange the plan may
    // contain is the gate's final orderBy (range partitioning)
    val chunk = formatted("t_doc_chunk")
    assert(!chunk.contains("hashpartitioning"), "chunking must not shuffle")
    // the keeper policy is a struct-min partial agg — a regression to
    // rank-then-filter (per-group sort) fails here
    val prio = formatted("d_dedup_priority")
    assert(!prio.contains("Window"), "keeper choice must not rank")
  }

  test("p_ack_ledger: ack agg and envelope join stay hash-partitioned, no sort-merge") {
    // the envelope set is checkpointed once (both join branches read
    // it — r9's regression was recomputing the batcher lineage per
    // branch), so the audited plan starts at the checkpoint scan: the
    // ack freeze-fold agg (struct min/max → object-hash) and the
    // envelope↔ack join key on (event_type, batch_id) — nothing may
    // degrade to a SortMergeJoin, and the join must be the hinted
    // shuffled-hash form
    val plan = formatted("p_ack_ledger")
    assert(!plan.contains("SortMergeJoin"), "expected hash joins only")
    assert(plan.contains("ShuffledHashJoin") || plan.contains("BroadcastHashJoin"))
    // the freeze-fold is a struct min/max (declarative → SortAggregate)
    // riding the window's batch-key sort — partial+final with NO extra
    // exchange between window and agg; total exchange NODES = ack side
    // + envelope side + the gate's final orderBy (formatted mode lists
    // each node twice: tree line + detail section)
    assert("(SortAggregate|ObjectHashAggregate|HashAggregate)".r
      .findAllIn(plan).size >= 2, plan)
    assert("Exchange".r.findAllIn(plan).size <= 6, plan)
  }

  test("t_ngram_diversity: the distinct shuffle carries 8-byte hashes, not bigram strings") {
    val plan = formatted("t_ngram_diversity")
    val exchanges = plan.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("shingle")), exchanges.mkString("\n"))
  }

  test("d_substr_dup: gram occurrences shuffle as 64-bit hashes, not strings") {
    val plan = formatted("d_substr_dup")
    // every hash exchange in the plan keys on doc_id or the xxhash64
    // gram key — the gram STRING never appears in an exchange
    val exchanges = plan.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("gram")), exchanges.mkString("\n"))
  }

  test("d_epoch_expand: rates broadcast, expansion row-local — corpus text never shuffles") {
    // the per-source rates frame joins back BROADCAST (source
    // cardinality), the epoch explode is row-local, and the only hash
    // exchanges carry (source[, epoch]) group keys — a regression to
    // a sort-merge join on source or a text-bearing shuffle fails
    val plan = formatted("d_epoch_expand")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "rates join must broadcast")
    assert(!plan.contains("SortMergeJoin"), "no sort-merge join on source")
    val exchanges = plan.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(!exchanges.exists(_.contains("text")),
      s"text rides a shuffle:\n${exchanges.mkString("\n")}")
    assert(!plan.contains("Window"), "no window in the expansion path")
  }

  test("r9 curation profiles: corpus never shuffles, share window reads the aggregated frame") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window}
    // d_source_dup_rate / t_lang_mix / s_knn_degree: every hash
    // exchange carries ids / group keys — document text and embedding
    // vectors never ride a shuffle
    for (name <- Seq("d_source_dup_rate", "t_lang_mix", "s_knn_degree")) {
      val plan = formatted(name)
      val exchanges = plan.linesIterator.filter(_.contains("hashpartitioning")).toSeq
      assert(!exchanges.exists(e => e.contains("text") || e.contains("embedding")),
        s"$name:\n${exchanges.mkString("\n")}")
      assert(!plan.contains("CartesianProduct"), name)
    }
    // t_lang_mix's per-source share window must run ABOVE the
    // (source, pred_lang) aggregate — ≤ sources × langs rows — a
    // regression to a corpus-wide window fails here
    val mix = SparkEntry.queries("t_lang_mix")(spark, sf)
    val ws = mix.queryExecution.optimizedPlan.collect { case w: Window => w }
    assert(ws.size == 1, s"t_lang_mix: $ws")
    assert(ws.head.child.collect { case a: Aggregate => a }.nonEmpty,
      "share window must read the aggregated frame, not the corpus")
    // t_pack_stats inherits seq_pack's range-sharded running sum (no
    // single-task per-source sort) and finishes with a partial agg
    val pack = SparkEntry.queries("t_pack_stats")(spark, sf)
    val pws = pack.queryExecution.optimizedPlan.collect { case w: Window => w }
    assert(pws.nonEmpty && pws.forall(w => w.partitionSpec.size >= 2 &&
      w.partitionSpec.exists(_.toString.contains("__shard"))),
      s"t_pack_stats: ${pws.map(_.partitionSpec)}")
    assert("HashAggregate".r.findAllIn(formatted("t_pack_stats")).size >= 2)
  }

  test("d_simhash_neardup: bucket join keys on (block, value), text never shuffles") {
    // the hamming-ball join must stay a block-bucket equi-join of
    // 8-byte fingerprints — a regression to a cartesian (the naive
    // all-pairs form) or a text-bearing exchange fails
    val plan = formatted("d_simhash_neardup")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), "all-pairs join shape")
    val exchanges = plan.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("text")),
      s"text rides a shuffle:\n${exchanges.mkString("\n")}")
  }

  test("m_*_real: media payloads never ride an exchange; decode stays row-local") {
    // the real-codec gate rows are row-local mapPartitions pipelines —
    // the ONLY exchange allowed is the terminal orderBy's range
    // partition over the small decoded columns; a hash shuffle, or any
    // exchange carrying the payload (the widest column in a multimodal
    // corpus), means media bytes started moving between executors
    for (k <- Seq("m_image_real", "m_audio_real", "m_video_real")) {
      val plan = formatted(k)
      val ex = plan.linesIterator
        .filter(l => l.contains("hashpartitioning") ||
          l.contains("rangepartitioning")).toSeq
      assert(!ex.exists(_.contains("payload")),
        s"$k shuffles payloads:\n${ex.mkString("\n")}")
      assert(!plan.contains("CartesianProduct"), s"$k went all-pairs")
    }
    // image/audio are pure generate→decode chains: exactly the sort's
    // range exchange, no hash shuffle at all
    for (k <- Seq("m_image_real", "m_audio_real"))
      assert(!formatted(k).contains("hashpartitioning"),
        s"$k grew a hash shuffle")
  }
}
