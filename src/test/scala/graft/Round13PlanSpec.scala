package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Plan locks for the round-13 graph-walk ANN serve tier — the shapes
  * that make it 100 TB-safe, asserted independent of data (the
  * PlanShapeSpec charter).
  */
class Round13PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("graphSearch: whole walk is keyed joins + bounded top-k, no cartesian") {
    val emb = Tables.t(spark, dir, "embeddings")
    val graph = Ann.serveGraph(
      Ann.nnDescent(emb, "vec_id", "embedding", k = 4, iters = 2))
      .localCheckpoint() // the persisted standing index — not under test
    val df = Ann.graphSearch(graph, emb, emb.filter(col("vec_id") < 4),
      "vec_id", "embedding", entryIds = Seq(0L), beamWidth = 16, hops = 2,
      topK = 5, cutLineage = false, // expose every hop to the plan
      expandHops = 2) // the serve tiers' deeper per-round expansion
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "no all-pairs anywhere in the walk")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "frontier expansion and scoring must be keyed equi-joins")
    assert(plan.contains("topk_by_score"),
      "beam selection must be the bounded map-side-combined top-k aggregate")
    assert(partitionlessWindows(df).isEmpty,
      "no single-partition window funnels")
  }

  test("graphSearch: final serve stage over a persisted graph is cartesian-free") {
    val df = SparkEntry.queries("ann_graph_search")(spark, dir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("topk_by_score"))
  }
}
