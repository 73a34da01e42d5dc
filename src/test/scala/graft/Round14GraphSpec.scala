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

  test("layeredBuild: BUILD plan has no partition-less window (r15 fix)") {
    val emb = Tables.t(spark, dir, "embeddings")
    // un-checkpointed so the whole build — densification included — is
    // visible to the plan; the old row_number().over(Window.orderBy(vid))
    // showed up here as a single-partition Window exchange
    val layers = Ann.layeredBuild(emb, "vec_id", "embedding",
      k = 4, iters = 2, p = 4, maxLevel = 2)
    layers.count()
    assert(partitionlessWindows(layers).isEmpty,
      "densification must be the distributed bucket-histogram rank, " +
        "not a global window")
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

  test("graphInsert: NSW rule — searched top-k, linked bidirectionally") {
    val emb = Tables.t(spark, dir, "embeddings")
    val n = emb.count()
    val corpus = emb.filter(col("vec_id") < n - 8)
    val batch = emb.filter(col("vec_id") >= n - 8)
    val graph = Ann.serveGraph(Ann.nnDescent(corpus, "vec_id", "embedding",
      k = 8, iters = 3, randomInit = true)).localCheckpoint()
    val found = Ann.graphSearch(graph, corpus, batch, "vec_id", "embedding",
        entryIds = Seq(0L), beamWidth = 16, hops = 2, topK = 4,
        expandHops = 2)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = found ++ found.map(_.swap)
    val got = Ann.graphInsertEdges(graph, corpus, batch, "vec_id",
        "embedding", kLink = 4, entryIds = Seq(0L), beamWidth = 16,
        hops = 2, expandHops = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
    // and graphInsert = old edges ∪ new edges, old edges untouched
    val updated = Ann.graphInsert(graph, corpus, batch, "vec_id",
        "embedding", kLink = 4, entryIds = Seq(0L), beamWidth = 16,
        hops = 2, expandHops = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val old = graph.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(updated === (old ++ expected))
  }

  test("graphInsert: chunked walk (maxWalkBatch < batch) ≡ monolithic, edge-for-edge") {
    // the self-bounding contract: chunk membership never affects which
    // graph a vector searches (every chunk walks the same pre-batch
    // adjacency), so the linked edge set is identical — only the walk's
    // peak frontier volume changes. maxWalkBatch=3 forces ⌈8/3⌉ chunks.
    val emb = Tables.t(spark, dir, "embeddings")
    val n = emb.count()
    val corpus = emb.filter(col("vec_id") < n - 8)
    val batch = emb.filter(col("vec_id") >= n - 8)
    val graph = Ann.serveGraph(Ann.nnDescent(corpus, "vec_id", "embedding",
      k = 8, iters = 3, randomInit = true)).localCheckpoint()
    def edges(bound: Int): Set[(Long, Long)] =
      Ann.graphInsertEdges(graph, corpus, batch, "vec_id", "embedding",
          kLink = 4, entryIds = Seq(0L), beamWidth = 16, hops = 2,
          expandHops = 2, maxWalkBatch = bound)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mono = edges(Int.MaxValue)
    assert(edges(3) === mono)
    assert(edges(1) === mono) // one walk per vector, still identical
  }

  test("graphIngest: stream ≡ sequential graphInsert fold, edge-for-edge") {
    import graft.streaming.StreamingAnn
    val emb = Tables.t(spark, dir, "embeddings")
    val n = emb.count()
    val corpus0 = emb.filter(col("vec_id") < n - 20).localCheckpoint()
    val splitA = emb.filter(col("vec_id") >= n - 20 && col("vec_id") < n - 10)
    val splitB = emb.filter(col("vec_id") >= n - 10)
    val graph0 = Ann.serveGraph(Ann.nnDescent(corpus0, "vec_id", "embedding",
      k = 8, iters = 3, randomInit = true)).localCheckpoint()
    // batch fold over the same two splits, in arrival order: split B can
    // link to split A's nodes — the incremental semantics under test
    val g1 = Ann.graphInsert(graph0, corpus0, splitA, "vec_id", "embedding",
      kLink = 4, entryIds = Seq(0L), beamWidth = 16, hops = 2,
      expandHops = 2).localCheckpoint()
    val c1 = corpus0.unionByName(splitA).localCheckpoint()
    val folded = Ann.graphInsert(g1, c1, splitB, "vec_id", "embedding",
        kLink = 4, entryIds = Seq(0L), beamWidth = 16, hops = 2,
        expandHops = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // streaming: the same splits as two staged NDJSON drops, mtime-ordered,
    // one file per micro-batch
    val root = java.nio.file.Files.createTempDirectory("graft_graph_ingest")
    val (adjDir, corpDir, staging, ckpt) = (s"$root/adj", s"$root/corp",
      s"$root/staging", s"$root/ckpt")
    graph0.write.parquet(adjDir)
    // the standing corpus is double-typed (the appends' schema) — a
    // float-typed initial file would make the mixed dir unreadable
    corpus0.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .write.parquet(corpDir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(staging))
    def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long) = {
      val lines = df
        .select(to_json(struct(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"),
          lit(1700000000L).as("ingest_ts"))))
        .collect().map(_.getString(0)).mkString("\n")
      val p = java.nio.file.Paths.get(staging, name)
      java.nio.file.Files.writeString(p, lines)
      p.toFile.setLastModified(mtime)
    }
    stage(splitA, "batch_a.json", 1700000000000L)
    stage(splitB, "batch_b.json", 1700000060000L)
    val q = StreamingAnn.graphIngestToParquet(spark, staging, adjDir,
      corpDir, ckpt, kLink = 4, entryIds = Seq(0L), beamWidth = 16,
      hops = 2, expandHops = 2, maxFilesPerTrigger = Some(1))
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(adjDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === folded,
      s"stream adjacency (${streamed.size} edges) must equal the " +
        s"sequential fold (${folded.size})")
    // and the streamed corpus is the full vector set
    assert(spark.read.parquet(corpDir).count() === n)
  }

  test("graphInsert: serve recall on incrementally-built graph ≈ full rebuild") {
    val emb = Tables.t(spark, dir, "embeddings")
    val n = emb.count()
    val corpus0 = emb.filter(col("vec_id") < (n * 9) / 10).localCheckpoint()
    val batch = emb.filter(col("vec_id") >= (n * 9) / 10)
    val gInc = Ann.graphInsert(
      Ann.serveGraph(Ann.nnDescent(corpus0, "vec_id", "embedding",
        k = 12, iters = 5, randomInit = true)),
      corpus0, batch, "vec_id", "embedding", kLink = 12,
      entryIds = Ann.spreadEntries(corpus0.count()), beamWidth = 32,
      hops = 2, expandHops = 2).localCheckpoint()
    val gFull = Ann.serveGraph(Ann.nnDescent(emb, "vec_id", "embedding",
      k = 12, iters = 5, randomInit = true)).localCheckpoint()
    val queries = emb.filter(col("vec_id") % 47 === 0)
    val exact = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .localCheckpoint()
    def recall(g: org.apache.spark.sql.DataFrame): Double =
      Ann.recallEval(exact,
        Ann.graphSearch(g, emb, queries, "vec_id", "embedding",
          entryIds = Ann.spreadEntries(n), beamWidth = 64, hops = 4,
          topK = 5), 5)
        .agg(avg("recall")).head.getDouble(0)
    val (rInc, rFull) = (recall(gInc), recall(gFull))
    assert(rInc >= rFull - 0.05,
      s"incremental graph recall $rInc too far below rebuild $rFull")
    assert(rInc >= 0.9, s"incremental graph recall too low: $rInc")
  }

  test("layeredInsert: hierarchy invariants hold and serve recall survives") {
    val emb = Tables.t(spark, dir, "embeddings")
    val n = emb.count()
    val corpus0 = emb.filter(col("vec_id") < (n * 9) / 10).localCheckpoint()
    val batch = emb.filter(col("vec_id") >= (n * 9) / 10)
    val layers0 = Ann.layeredBuild(corpus0, "vec_id", "embedding",
      k = 12, iters = 5, p = 4, maxLevel = 1, randomInit = true)
      .localCheckpoint()
    val layers1 = Ann.layeredInsert(layers0, corpus0, batch, "vec_id",
      "embedding", maxLevel = 1, p = 4, kLink = 12, beamWidth = 32,
      hops = 2, expandHops = 2).localCheckpoint()
    // every inserted node appears in the base layer; level>=1 inserts
    // also appear in layer 1; level-0 inserts do NOT
    val newBase = layers1.filter(col("layer") === 0)
      .join(layers0.filter(col("layer") === 0),
        Seq("layer", "src", "dst"), "left_anti")
    val inserted = batch.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val baseTouched = newBase
      .select(explode(array(col("src"), col("dst"))).as("vid"))
      .filter(col("vid") >= (n * 9) / 10)
      .distinct().collect().map(_.getLong(0)).toSet
    assert(baseTouched === inserted, "every insert must link into layer 0")
    val upTouched = layers1.filter(col("layer") === 1)
      .join(layers0.filter(col("layer") === 1),
        Seq("layer", "src", "dst"), "left_anti")
      .select(explode(array(col("src"), col("dst"))).as("vid"))
      .filter(col("vid") >= (n * 9) / 10)
      .distinct().collect().map(_.getLong(0)).toSet
    val upExpected = batch
      .filter(Ann.layerLevel(col("vec_id"), 4, 1) >= 1)
      .collect().map(_.getLong(0)).toSet
    assert(upTouched === upExpected,
      "level>=1 inserts (and only those) must link into layer 1")
    // descent recall on the maintained hierarchy stays serve-grade
    val queries = emb.filter(col("vec_id") % 47 === 0)
    val exact = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
    val r = Ann.recallEval(exact,
        Ann.layeredSearch(layers1, emb, queries, "vec_id", "embedding",
          maxLevel = 1, entryId = Ann.layeredEntry(layers1, 1),
          beamUpper = 32, beamBase = 48, hopsBase = 1, topK = 5,
          expandHops = 2, expandUpper = 2), 5)
      .agg(avg("recall")).head.getDouble(0)
    assert(r >= 0.9, s"maintained-hierarchy descent recall too low: $r")
  }

  test("layeredIngest: stream ≡ sequential layeredInsert fold, edge-for-edge") {
    import graft.streaming.StreamingAnn
    val emb = Tables.t(spark, dir, "embeddings")
    val n = emb.count()
    val corpus0 = emb.filter(col("vec_id") < n - 20).localCheckpoint()
    val splitA = emb.filter(col("vec_id") >= n - 20 && col("vec_id") < n - 10)
    val splitB = emb.filter(col("vec_id") >= n - 10)
    val layers0 = Ann.layeredBuild(corpus0, "vec_id", "embedding",
      k = 8, iters = 3, p = 4, maxLevel = 1, randomInit = true)
      .localCheckpoint()
    val l1 = Ann.layeredInsert(layers0, corpus0, splitA, "vec_id",
      "embedding", maxLevel = 1, p = 4, kLink = 4, beamWidth = 16,
      hops = 2, expandHops = 2).localCheckpoint()
    val c1 = corpus0.unionByName(splitA).localCheckpoint()
    val folded = Ann.layeredInsert(l1, c1, splitB, "vec_id", "embedding",
        maxLevel = 1, p = 4, kLink = 4, beamWidth = 16, hops = 2,
        expandHops = 2)
      .collect().map(r => (r.getAs[Int]("layer"), r.getAs[Long]("src"),
        r.getAs[Long]("dst"))).toSet
    val root = java.nio.file.Files.createTempDirectory("graft_lay_ingest")
    val (layDir, corpDir, staging, ckpt) = (s"$root/layers", s"$root/corp",
      s"$root/staging", s"$root/ckpt")
    layers0.write.partitionBy("layer").parquet(layDir)
    corpus0.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .write.parquet(corpDir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(staging))
    def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long) = {
      val lines = df
        .select(to_json(struct(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"),
          lit(1700000000L).as("ingest_ts"))))
        .collect().map(_.getString(0)).mkString("\n")
      val p = java.nio.file.Paths.get(staging, name)
      java.nio.file.Files.writeString(p, lines)
      p.toFile.setLastModified(mtime)
    }
    stage(splitA, "batch_a.json", 1700000000000L)
    stage(splitB, "batch_b.json", 1700000060000L)
    val q = StreamingAnn.layeredIngestToParquet(spark, staging, layDir,
      corpDir, ckpt, maxLevel = 1, p = 4, kLink = 4, beamWidth = 16,
      hops = 2, expandHops = 2, maxFilesPerTrigger = Some(1))
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(layDir)
      .collect().map(r => (r.getAs[Int]("layer"), r.getAs[Long]("src"),
        r.getAs[Long]("dst"))).toSet
    assert(streamed === folded,
      s"streamed layered adjacency (${streamed.size}) must equal the " +
        s"sequential fold (${folded.size})")
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
