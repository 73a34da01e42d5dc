package graft

import org.apache.spark.sql.functions._

/** Plan locks for the round-12 operators — the shapes that make them
  * 100 TB-safe, asserted independent of data (the PlanShapeSpec charter).
  */
class Round12PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def executed(name: String) = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.count() // finalize the adaptive plan
    df
  }

  test("skip-gram family: doc-partitioned windows only, no cartesian") {
    for (q <- Seq("tx_skipgram_pairs", "tx_glove_cooc")) {
      val df = executed(q)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$q cartesian-free")
      assert(partitionlessWindows(df).isEmpty,
        s"$q window must be doc-partitioned")
    }
  }

  test("negative draws: slot lookup is a broadcast binary search, not a join") {
    val df = executed("tx_negative_draws")
    val plan = df.queryExecution.executedPlan.toString
    // the slot table rides in a broadcast variable inside mapPartitions —
    // the draw itself is never a plan join. The pair-generation subtree
    // legitimately carries ONE nested-loop broadcast: the 1-row
    // subsampling total (the scalar-attach pattern); anything beyond
    // that would mean the slot lookup regressed to a range join.
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("MapPartitions"),
      "draws must run in the broadcast binary-search mapPartitions stage")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnlj <= 1, s"only the 1-row scalar attach may nested-loop, found $bnlj")
  }

  test("nn-descent: keyed joins only, bounded top-k, no corpus sort") {
    val df = executed("ann_nndescent")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "no all-pairs anywhere")
    assert(plan.contains("topk_by_score"), "neighbor selection is bounded top-k")
  }

  test("subword n-grams: vocabulary-grain — one distinct before the explode") {
    val df = executed("tx_subword_ngrams")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(partitionlessWindows(df).isEmpty)
  }

  test("log-quantile sketch: partial aggregation reaches the map side") {
    val df = executed("agg_log_quantiles")
    val plan = df.queryExecution.executedPlan.toString
    // TypedImperativeAggregate partials run map-side (ObjectHashAggregate
    // with partial_log_histogram) so the shuffle carries bucket maps,
    // never raw rows
    assert(plan.contains("partial_log_histogram") ||
      plan.replaceAll("#\\d+", "").contains("partial_loghistogram"),
      "log_histogram must partial-aggregate before the exchange")
    assert(partitionlessWindows(df).isEmpty,
      "quantile walk windows are event_type-partitioned")
  }

  test("byte-level BPE encode: one composed projection, no join/shuffle on the token stream") {
    val df = executed("tx_bbpe_encode")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin"),
      "merge application must stay a projection over the exploded tokens")
  }

  test("late-wave rows: cartesian-free, windows all partitioned") {
    for (q <- Seq("dd_cdc_chunks", "tx_mlm_masks", "tx_script_detect",
        "dd_incremental_neardup", "tx_bpe_dropout", "tx_distinct_ngrams")) {
      val df = executed(q)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$q cartesian-free")
      assert(partitionlessWindows(df).isEmpty,
        s"$q must keep every window partitioned")
    }
  }

  test("near-dup batch replica: single-lineage signature aggregate") {
    val df = executed("dd_stream_neardup_batch")
    val plan = df.queryExecution.executedPlan.toString
    val partials = "partial_min\\(\\(\\(h".r
      .findAllIn(plan.replaceAll("#\\d+", "")).length
    assert(partials == 1,
      s"signature partial-aggregate must appear once, found $partials")
    assert(!plan.contains("CartesianProduct"))
  }
}
