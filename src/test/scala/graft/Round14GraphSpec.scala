package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Round-14 specs for the hierarchical (HNSW-style layered) graph serve:
  * deterministic level draw, cumulative layer membership, descent recall
  * vs the flat walk at fewer sequential rounds, and the merged-round-1
  * walk's loud all-miss guard.
  */
class Round14GraphSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("layerLevel: deterministic geometric draw, ~p^-l mass per level") {
    import spark.implicits._
    val ids = (0L until 4096L).toDF("vid")
    val counts = ids
      .select(Ann.layerLevel(col("vid"), p = 4, maxLevel = 2).as("level"))
      .groupBy("level").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // P(level >= 1) = 1/4, P(level >= 2) = 1/16 — LCG-uniform, so the
    // realized mass should sit within a loose band of the expectation
    val l1 = counts.getOrElse(1, 0L) + counts.getOrElse(2, 0L)
    val l2 = counts.getOrElse(2, 0L)
    assert(math.abs(l1 - 1024L) < 200, s"level>=1 mass off: $l1")
    assert(math.abs(l2 - 256L) < 100, s"level>=2 mass off: $l2")
    // deterministic: same ids -> same levels, twice
    val a = ids.select(col("vid"), Ann.layerLevel(col("vid")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = ids.select(col("vid"), Ann.layerLevel(col("vid")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a === b)
  }

  test("layeredBuild: cumulative membership, upper layers only over members") {
    val emb = Tables.t(spark, dir, "embeddings")
    val layers = Ann.layeredBuild(emb, "vec_id", "embedding",
      k = 4, iters = 2, p = 4, maxLevel = 2).localCheckpoint()
    val memberOk = layers.filter(col("layer") >= 1)
      .select(col("layer"), explode(array(col("src"), col("dst"))).as("vid"))
      .filter(Ann.layerLevel(col("vid"), 4, 2) < col("layer"))
      .count()
    assert(memberOk === 0L, "layer-l edges must touch only level>=l nodes")
    // every upper-layer node is also a base-layer node (cumulative levels)
    val upperIds = layers.filter(col("layer") === 1).select(col("src"))
      .distinct()
    val missing = upperIds.join(
      layers.filter(col("layer") === 0).select(col("src")).distinct(),
      Seq("src"), "left_anti").count()
    assert(missing === 0L, "upper-layer nodes must exist in the base layer")
  }

  test("layeredSearch: recall >= flat walk at FEWER sequential rounds") {
    val emb = Tables.t(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val exact = Ann.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .localCheckpoint()
    // flat serve shape: random-init descent graph, 3 x 1-hop rounds
    val flatGraph = Ann.serveGraph(Ann.nnDescent(emb, "vec_id", "embedding",
      k = 8, iters = 3, randomInit = true)).localCheckpoint()
    val flat = Ann.graphSearch(flatGraph, emb, q, "vec_id", "embedding",
      entryIds = Seq(0L), beamWidth = 16, hops = 3, topK = 5)
    val flatRecall = Ann.recallEval(exact, flat, 5)
      .agg(avg("recall")).head.getDouble(0)
    // layered: 1 upper round + 1 base round = 2 sequential rounds
    val layers = Ann.layeredBuild(emb, "vec_id", "embedding",
      k = 8, iters = 3, p = 4, maxLevel = 1, randomInit = true)
      .localCheckpoint()
    val entry = Ann.layeredEntry(layers, maxLevel = 1)
    val layered = Ann.layeredSearch(layers, emb, q, "vec_id", "embedding",
      maxLevel = 1, entryId = entry, beamUpper = 12, beamBase = 32,
      hopsBase = 1, topK = 5, expandHops = 2)
    val layeredRecall = Ann.recallEval(exact, layered, 5)
      .agg(avg("recall")).head.getDouble(0)
    assert(layeredRecall >= flatRecall - 1e-9,
      s"layered descent (2 rounds) recall $layeredRecall < flat " +
        s"(3 rounds) $flatRecall")
    assert(layeredRecall >= 0.9, s"layered recall@5 too low: $layeredRecall")
  }

  test("layeredSearch: whole descent is keyed joins + bounded top-k, no cartesian") {
    val emb = Tables.t(spark, dir, "embeddings")
    val layers = Ann.layeredBuild(emb, "vec_id", "embedding",
      k = 4, iters = 2, p = 4, maxLevel = 1)
      .localCheckpoint() // the persisted standing index — not under test
    val df = Ann.layeredSearch(layers, emb, emb.filter(col("vec_id") < 4),
      "vec_id", "embedding", maxLevel = 1,
      entryId = Ann.layeredEntry(layers, 1),
      beamUpper = 8, beamBase = 16, hopsBase = 1, topK = 5,
      expandHops = 2, expandUpper = 2,
      cutLineage = false) // expose every round of every layer to the plan
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "no all-pairs anywhere in the descent")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "frontier expansion and scoring must be keyed equi-joins")
    assert(plan.contains("topk_by_score"),
      "beam selection must be the bounded map-side-combined top-k aggregate")
    assert(partitionlessWindows(df).isEmpty,
      "no single-partition window funnels in the serve path")
  }

  test("graphSearch: all-miss entry set (absent from corpus AND graph) throws") {
    val emb = Tables.t(spark, dir, "embeddings")
    val graph = Ann.serveGraph(Ann.nnDescent(emb, "vec_id", "embedding",
      k = 4, iters = 1)).localCheckpoint()
    val q = emb.filter(col("vec_id") < 2)
    val e = intercept[IllegalArgumentException] {
      Ann.graphSearch(graph, emb, q, "vec_id", "embedding",
        entryIds = Seq(999999L), beamWidth = 8, hops = 1, topK = 5)
    }
    assert(e.getMessage.contains("missing"))
  }
}
