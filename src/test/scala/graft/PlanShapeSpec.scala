package graft

/** Locks in the 100 TB-shaped plan invariants from the round-3 performance
  * work — these are the shapes the operators must KEEP, independent of
  * data: a regression here is a scale bug even if results stay correct.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.count() // finalize the adaptive plan
    df.queryExecution.executedPlan.toString
  }

  test("ANN rankers use the bounded top-k aggregate, not a window sort") {
    for (q <- Seq("ann_topk_bruteforce", "ann_lsh_bucketed")) {
      val plan = executedPlan(q)
      assert(!plan.contains("Window"), s"$q must not rank via a window sort")
      assert(plan.contains("topk_by_score"), s"$q must rank via TopKByScore")
    }
    // IVF keeps exactly one window: the nprobe centroid selection, whose
    // partitions are bounded by nLists (a parameter), never the corpus
    val ivf = executedPlan("ann_ivf_probe")
    assert("Window \\[row_number".r.findAllIn(ivf).length == 1)
    assert(ivf.contains("topk_by_score"))
  }

  test("MinHash LSH computes the signature aggregate exactly once (single lineage)") {
    val plan = executedPlan("dd_minhash_lsh")
    // one partial + one final min-aggregate for the 32 signature columns;
    // a bucket self-join would duplicate the whole signature pipeline
    val partials = "partial_min\\(\\(\\(h".r.findAllIn(plan.replaceAll("#\\d+", "")).length
    assert(partials == 1,
      s"expected the signature partial-aggregate once, found $partials")
  }

  test("similarity operators never fall back to a cartesian product") {
    for (q <- Seq("dd_ngram_jaccard", "dd_minhash_lsh", "dd_simhash",
        "dd_embed_cosine_blocked", "dd_semantic_dedup")) {
      val plan = executedPlan(q)
      assert(!plan.contains("CartesianProduct"), s"$q must stay bucketed/keyed")
    }
  }

  test("no unconditional broadcast of linearly-scaling TPC-H tables") {
    // q3/q5 join customer/supplier: the PLAN may broadcast at this tiny SF
    // (AQE's choice) but the LOGICAL plan must carry no broadcast hint on
    // those tables — hints survive into the optimized plan as
    // ResolvedHint/JOIN strategy hints
    for (q <- Seq("q3_top_revenue", "q5_local_supplier_volume",
        "join_broadcast_dim", "sql_q10_returned_items")) {
      val df = SparkEntry.queries(q)(spark, dir)
      val logical = df.queryExecution.analyzed.toString
      val hinted = "UnresolvedHint|ResolvedHint".r.findAllIn(logical).length
      // q5 legitimately hints constant-size region+nation (2 hints max)
      assert(hinted <= 2, s"$q carries $hinted broadcast hints")
    }
  }

  test("q6: every predicate reaches the parquet scan, columns pruned, no shuffle") {
    val plan = executedPlan("q6_forecast_revenue")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    assert("GreaterThanOrEqual\\(l_shipda".r.findAllIn(plan).nonEmpty)
    // projection pruning: the scan reads only the 4 referenced columns
    assert(plan.contains(
      "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate:"))
    assert(!plan.contains("Exchange hashpartitioning"))
  }

  test("f3 fixture write is parallel (no single-task coalesce)") {
    val df = SparkEntry.queries("f3_corrupt_gate")(spark, dir)
    df.count()
    // the query's own read path must not funnel through one partition
    assert(!df.queryExecution.executedPlan.toString.contains("Coalesce 1"))
  }

  test("global shuffle ranks within hash buckets — no corpus-wide window") {
    val df = SparkEntry.queries("sp_global_shuffle")(spark, dir)
    df.count()
    // the within-bucket rank window must partition BY the bucket; the
    // 256-row offset prefix sum declares its bounded single partition
    // with partitionBy(lit(0)) — tree-walk because toString hides empty
    // partition specs (the old regex could never see one)
    val loners = partitionlessWindows(df)
    assert(loners.isEmpty, s"unpartitioned corpus window: $loners")
  }

  test("z-order rank normalization is fully distributed — bucketed rank windows only") {
    val df = SparkEntry.queries("opt_zorder_cluster")(spark, dir)
    df.count()
    val loners = partitionlessWindows(df)
    assert(loners.isEmpty, s"partition-less window in z-order plan: $loners")
    import org.apache.spark.sql.execution.window.WindowExec
    val wins = allPlanNodes(df.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    // three rank passes (nx, ny, z-bucket), each a row_number window
    // PARTITIONED by its histogram bucket — ~n/256 rows per task — plus
    // the constant-bounded offset windows; none may sort the corpus
    val rankWins = wins.filter(_.windowExpression.mkString.contains("row_number"))
    assert(rankWins.size == 3, s"expected 3 bucketed rank windows, got ${rankWins.size}")
    assert(rankWins.forall(_.partitionSpec.nonEmpty))
  }

  test("chunk dedup picks winners via partial min(struct) aggregation, not a window") {
    val plan = executedPlan("dd_chunk_dedup")
    assert(plan.replaceAll("#\\d+", "").contains("partial_min(struct(doc"),
      "winner choice must map-side combine")
    assert(!plan.contains("Window"), "no corpus-wide window sort in chunk dedup")
  }

  test("keep-best-per-key is a single aggregation — no window, no join") {
    val plan = executedPlan("dd_keep_best_source")
    assert(!plan.contains("Window"))
    assert(!plan.contains("Join"))
    assert(plan.replaceAll("#\\d+", "").contains("partial_min(struct"))
  }

  test("kNN self-join carries no broadcast hints on corpus-sized sides") {
    val df = SparkEntry.queries("ann_knn_join")(spark, dir)
    val logical = df.queryExecution.analyzed.toString
    assert("UnresolvedHint|ResolvedHint".r.findAllIn(logical).isEmpty,
      "both join sides grow with the corpus — AQE must decide")
    df.count()
    assert(df.queryExecution.executedPlan.toString.contains("topk_by_score"))
  }

  test("vocab top-k compiles to TakeOrderedAndProject (bounded, no global sort)") {
    for (q <- Seq("tx_vocab_topk", "tx_bpe_pairs")) {
      val plan = executedPlan(q)
      assert(plan.contains("TakeOrderedAndProject"), s"$q must bound the take")
    }
  }

  test("substring-dup stats stay keyed: no cartesian, no corpus broadcast hint") {
    val df = SparkEntry.queries("dd_substring_dup")(spark, dir)
    assert("UnresolvedHint|ResolvedHint".r
      .findAllIn(df.queryExecution.analyzed.toString).isEmpty,
      "window count table grows with the corpus — AQE must decide the join")
    df.count()
    assert(!df.queryExecution.executedPlan.toString.contains("CartesianProduct"))
  }

  test("bigram LM broadcasts ONLY the 1-row vocabulary scalar") {
    val df = SparkEntry.queries("tx_lm_bigram_score")(spark, dir)
    val logical = df.queryExecution.analyzed.toString
    // exactly one hint: the V scalar; the unigram/bigram count tables
    // grow with the corpus and must stay AQE-decided
    assert("UnresolvedHint|ResolvedHint".r.findAllIn(logical).length == 1,
      "only the vocabulary-size scalar may carry a broadcast hint")
    df.count()
    assert(!df.queryExecution.executedPlan.toString.contains("CartesianProduct"))
  }

  test("substring removal picks winners via partial min(struct), stays keyed") {
    val plan = executedPlan("dd_substring_dedup")
    // the ONLY windows allowed are the per-doc lead() stitches (partitioned
    // by doc); winner-per-span must be the map-side-combined min(struct),
    // never a corpus-wide occurrence sort
    assert(plan.replaceAll("#\\d+", "").contains("partial_min(struct(doc"),
      "winner choice must map-side combine")
    val windows = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(windows.forall(_.nonEmpty), s"unpartitioned window found: $windows")
    assert(!plan.contains("CartesianProduct"))
  }

  test("dedup audits are pure keyed aggregations — no window, no join") {
    for (q <- Seq("dd_cluster_histogram", "dd_dup_rate_by_source")) {
      val plan = executedPlan(q)
      assert(!plan.contains("Window"), s"$q must not window-sort")
      assert(!plan.contains("Join"), s"$q must not join")
    }
  }

  test("token chunking is a pure projection + generator — zero shuffles") {
    val df = SparkEntry.queries("tx_chunk_split")(spark, dir)
    // inspect the pre-sort plan: the query's trailing orderBy exists only
    // for the oracle's deterministic dump; chunking itself must not
    // exchange (drop the Sort's range partitioning from consideration)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "chunking must stay partition-local")
    assert(!plan.contains("Window") && !plan.contains("Join"))
  }

  test("BPE encode folds the merge table into one projection — no join/window") {
    // constructing the query runs training (driver-bounded collect); the
    // RETURNED plan is the encode side and must be a pure generator +
    // projection chain — the whole merge sequence lives in one expression
    val df = SparkEntry.queries("tx_bpe_encode")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "encode must not join the merge table")
    assert(!plan.contains("Window"))
    assert(!plan.contains("Exchange hashpartitioning"),
      "encode must stay partition-local (trailing sort is dump-only)")
  }

  test("near-dup keep-best picks winners via partial min(struct), no window") {
    val df = SparkEntry.queries("dd_neardup_keep_best")(spark, dir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.replaceAll("#\\d+", "").contains("partial_min"),
      "canonical selection must map-side combine, not window-sort members")
    assert(!plan.contains("Window"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("exact-k sampling prefilters before the rank window") {
    val df = SparkEntry.queries("sp_exact_k_per_class")(spark, dir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    // the rank window exists but must consume the HASH-PREFILTERED stream:
    // the unit-hash keep-rate filter appears below the window, bounding the
    // sorted volume to O(strata·k) instead of the corpus
    val winIdx = plan.indexOf("Window")
    assert(winIdx >= 0, "rank window expected")
    assert(plan.indexOf("1315423911", winIdx) >= 0,
      "the unit-hash prefilter must sit below the rank window")
    // per-stratum windows only — never an unpartitioned (global) sort
    val windows = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(windows.nonEmpty && windows.forall(_.nonEmpty),
      s"unpartitioned window found: $windows")
  }

  test("class balance is a zero-join projection-filter over the corpus") {
    val df = SparkEntry.queries("sp_class_balance")(spark, dir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      "per-class rates must inline as literals, not join back")
    assert(!plan.contains("Window"))
  }

  test("OOV rate probes with a broadcast vocab — never a shuffled join") {
    val plan = executedPlan("tx_oov_rate")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "vocab probe must broadcast")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "the corpus token stream must not shuffle for the probe")
  }

  test("ids→pieces decode stays a projection chain — no join, no window") {
    val plan = executedPlan("tx_ids_decode_roundtrip")
    assert(!plan.contains("Join"), "the id→piece map must inline, not join")
    assert(!plan.contains("Window"))
  }

  test("int8 quantization corpus pass is a zero-join projection (ranges as literals)") {
    val plan = executedPlan("emb_quantize_int8")
    assert(!plan.contains("Join"),
      "per-dim ranges must come back as literal arrays, not join back")
    assert(!plan.contains("Window"))
  }

  test("PQ encode is a zero-join projection; ADC ranks via the bounded top-k aggregate") {
    val codes = executedPlan("emb_pq_codes")
    assert(!codes.contains("Join") && !codes.contains("Window"),
      "codebooks must ride in as literal expressions")
    val adc = executedPlan("ann_pq_adc")
    assert(!adc.contains("CartesianProduct"))
    assert(adc.contains("topk_by_score"), "ADC must rank via TopKByScore")
    assert(!adc.contains("Window"), "ADC must not rank via a window sort")
    assert(!adc.contains("SortMergeJoin") && !adc.contains("ShuffledHashJoin"),
      "the encoded corpus must not shuffle — the query LUT side broadcasts")
  }

  test("IVF-PQ keeps one bounded probe window, ranks via top-k aggregate, stays keyed") {
    val plan = executedPlan("ann_ivfpq_adc")
    assert(!plan.contains("CartesianProduct"))
    // exactly one window: nprobe selection over nLists rows per query
    assert("Window \\[row_number".r.findAllIn(plan).length == 1)
    assert(plan.contains("topk_by_score"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "the coded corpus joins broadcast probes on the list key only")
  }

  test("residual IVF-PQ stays keyed: no cartesian, one probe window, top-k ranker") {
    val plan = executedPlan("ann_ivfpq_residual")
    assert(!plan.contains("CartesianProduct"))
    // the residual build adds keyed id-joins (corpus-sized, shuffle-joinable
    // at scale — fine); the only window is still the bounded nprobe pick
    assert("Window \\[row_number".r.findAllIn(plan).length == 1)
    assert(plan.contains("topk_by_score"))
  }

  test("line dedup picks winners via partial min(struct), stays keyed") {
    val plan = executedPlan("dd_line_dedup")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("Window"), "winner-per-line must not use a window")
    assert(plan.contains("partial_min"),
      "winner selection must be a map-side-combined min(struct) aggregate")
  }
}
