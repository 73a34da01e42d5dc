package graft

import org.apache.spark.sql.functions._
import graft.operators.LinkGraph

/** Round-11 sixth-session specs: k-core synchronous peeling. */
class Round11eOpsSpec extends SparkSpec {

  test("kCore: path peels from both ends, cycle is the 2-core") {
    import spark.implicits._
    // Cycle {1,2,3} with a tail 3–10–11–12: the tail peels one hop per
    // round (12, then 11, then 10); the cycle survives with degree 2.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (3L, 10L), (10L, 11L), (11L, 12L)).toDF("src", "dst")
    val r = LinkGraph.kCore(edges, "src", "dst", k = 2, rounds = 4)
      .orderBy("node").collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(r.forall(_.getLong(1) === 2L), "fixed point: every degree >= k")
  }

  test("kCore: under-provisioned rounds stop mid-cascade (synchronous contract)") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (3L, 10L), (10L, 11L), (11L, 12L)).toDF("src", "dst")
    // one round only removes the current degree-1 frontier (node 12)
    val r = LinkGraph.kCore(edges, "src", "dst", k = 2, rounds = 1)
      .orderBy("node").collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 10L, 11L))
  }

  test("kCore: k=1 keeps every non-isolated node; duplicates/self-loops collapse") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (5L, 5L), (3L, 4L))
      .toDF("src", "dst")
    val r = LinkGraph.kCore(edges, "src", "dst", k = 1, rounds = 2)
      .orderBy("node").collect()
    // self-loop-only node 5 vanishes with its loop edge
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(r.forall(_.getLong(1) === 1L))
  }

  test("kCore: k above max degree empties the graph") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    assert(LinkGraph.kCore(edges, "src", "dst", k = 3, rounds = 2).count() === 0L)
  }
}
