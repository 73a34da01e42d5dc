package graft

import org.apache.spark.sql.functions._

/** Smoke + semantic checks for every declared query at sf0.001. The deep
  * value-level check is the driver's DuckDB oracle (tools/localverify.py
  * replicates it); here we assert structural invariants cheaply.
  */
class QueriesSpec extends SparkSpec {

  test("every declared query runs and (almost) every one returns rows") {
    val emptyOk = Set.empty[String] // queries allowed to be empty at sf0.001
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n >= 0, s"$name failed")
      if (!emptyOk(name)) assert(n > 0, s"$name returned zero rows")
      // corpus-wide plan invariants — every query, not just the ones with
      // targeted PlanShapeSpec locks: a cartesian product or a leaked
      // cached relation anywhere in the surface is a scale bug even while
      // results stay correct (1-row broadcast crossJoins compile to
      // BroadcastNestedLoopJoin, which stays allowed)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product")
      assert(!plan.contains("InMemoryTableScan"),
        s"$name reads a cached relation — persist() leaked into the operator")
      // no query may funnel its data through a partition-less window (the
      // single-task sort that killed opt_zorder_cluster's first ntile
      // formulation); tree-walk, not toString — the string form hides
      // empty partition specs
      val loners = partitionlessWindows(df)
      assert(loners.isEmpty, s"$name plans a partition-less window: $loners")
    }
  }

  test("oracleSql keys are a subset of queries") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1 aggregates are consistent with a direct recomputation") {
    val li = Tables.t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
    val expectedRows = li.select("l_returnflag", "l_linestatus").distinct().count()
    val got = SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
    assert(got.count() == expectedRows)
    val total = got.agg(sum("count_order")).head.getLong(0)
    assert(total == li.count())
  }

  test("first-wins dedup keeps exactly one row per key") {
    val got = SparkEntry.queries("a3_dedup_first_wins")(spark, sfDir)
    assert(got.groupBy("user_id", "event_type").count().filter(col("count") > 1).isEmpty)
  }

  test("session explode emits begin+end per session plus every hit") {
    val got = SparkEntry.queries("x1_session_explode")(spark, sfDir).cache()
    val begins = got.filter(col("event") === "session begins").count()
    val ends = got.filter(col("event") === "session ends").count()
    val hits = got.filter(col("event") =!= "session begins" && col("event") =!= "session ends").count()
    assert(begins == ends && begins > 0)
    val nEvents = Tables.t(spark, sfDir, "events").count()
    assert(hits == nEvents, s"hits $hits != events $nEvents")
    got.unpersist()
  }
}
