package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Round-15 specs for layered-tier parity of the serving trio (VERDICT
  * r14 #5): filtered descent (predicate semi-join on the base beam) and
  * layered deletion with per-layer bridge repair, including the
  * post-churn recall contract (repaired ≥ tombstone-only).
  */
class Round15GraphSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("layeredSearchWhere: predicate honored, ranks contiguous, recall vs restricted exact") {
    val emb = Tables.t(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val allowed = emb.filter(col("vec_id") % 3 === 0)
    val layers = Ann.layeredBuild(emb, "vec_id", "embedding",
      k = 8, iters = 3, p = 4, maxLevel = 1, randomInit = true)
      .localCheckpoint()
    val got = Ann.layeredSearchWhere(layers, emb, q, "vec_id", "embedding",
        maxLevel = 1, entryId = Ann.layeredEntry(layers, 1),
        allowed = allowed, beamUpper = 12, beamBase = 48, hopsBase = 1,
        topK = 5, expandHops = 2, expandUpper = 2)
      .localCheckpoint()
    // every hit satisfies the predicate
    assert(got.filter(col("neighbor_id") % 3 =!= 0).count() === 0L)
    // ranks are 1..k contiguous per query (the post-filter re-rank)
    val badRanks = got.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"))
      .filter(col("n") =!= col("mx")).count()
    assert(badRanks === 0L, "ranks must be re-ranked contiguously")
    // recall vs exact-over-allowed (restricted ground truth)
    val exact = Ann.bruteForceTopK(
      emb.join(allowed.select("vec_id"), Seq("vec_id"), "left_semi")
        .unionByName(q).distinct(),
      q, "vec_id", "embedding", 5)
    // bruteForceTopK over allowed∪queries can return query self-matches
    // for queries in the allowed set — the layered walk excludes self,
    // so restrict ground truth the same way
    val exactNoSelf = exact.filter(col("query_id") =!= col("neighbor_id"))
      .filter(col("neighbor_id") % 3 === 0)
    val recall = exactNoSelf.select(col("query_id"), col("neighbor_id"))
      .join(got.select(col("query_id"), col("neighbor_id"),
        lit(1L).as("hit")), Seq("query_id", "neighbor_id"), "left")
      .agg(avg(coalesce(col("hit"), lit(0L)))).head.getDouble(0)
    assert(recall >= 0.8, s"filtered layered recall too low: $recall")
  }

  test("rngPrune: matches the reference Alg-4 greedy, degree <= m, recall holds") {
    val emb = Tables.t(spark, dir, "embeddings")
    val adj = Ann.serveGraph(Ann.nnDescent(emb, "vec_id", "embedding",
      k = 8, iters = 3, randomInit = true)).localCheckpoint()
    val m = 3
    val got = Ann.rngPrune(adj, emb, "vec_id", "embedding", m)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: the per-candidate greedy scan (Malkov & Yashunin Alg. 4)
    // run driver-side on the collected small corpus
    val vec = emb.select(col("vec_id").cast("long"), col("embedding")
        .cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val bySrc = adj.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
    // .toSeq first: flatMap on a Map of (src, dst) pairs would collapse
    // to one edge per src (Map semantics), silently shrinking the reference
    val expected = bySrc.toSeq.flatMap { case (src, es) =>
      val cands = es.map(_._2).distinct
        .map(d => (d, cos(vec(src), vec(d))))
        .sortBy { case (d, c) => (-c, d) }
      val r = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      for ((d, c) <- cands if r.size < m)
        if (r.forall { case (s, _) => c > cos(vec(d), vec(s)) }) r += ((d, c))
      r.map { case (d, _) => (src, d) }
    }.toSet
    assert(got === expected, "relational unroll must equal the greedy scan")
    // out-degree bound
    val overM = got.groupBy(_._1).count(_._2.size > m)
    assert(overM === 0, s"out-degree must be <= $m")
    // serve recall on the pruned+symmetrized graph stays high — the
    // diversity claim: fewer edges, held navigability
    val pruned = Ann.rngPrune(adj, emb, "vec_id", "embedding", 6)
    val sym = pruned.unionByName(
        pruned.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    val q = emb.filter(col("vec_id") < 10)
    val exact = Ann.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
    val recall = Ann.recallEval(exact,
        Ann.graphSearch(sym, emb, q, "vec_id", "embedding",
          entryIds = Ann.spreadEntries(emb.count()), beamWidth = 32,
          hops = 3, topK = 5, expandHops = 2), 5)
      .agg(avg("recall")).head.getDouble(0)
    assert(recall >= 0.9, s"pruned-graph recall too low: $recall")
  }

  test("graphSearchAdc: DiskANN composition — code-scored walk, exact rerank, recall holds") {
    val emb = Tables.t(spark, dir, "embeddings")
    val n = emb.count()
    val adj = Ann.serveGraph(Ann.nnDescent(emb, "vec_id", "embedding",
      k = 8, iters = 3, randomInit = true)).localCheckpoint()
    val books = Ann.pqCodebooks(emb, "vec_id", "embedding", m = 8, k = 16)
    val enc = Ann.pqEncode(emb, "vec_id", "embedding", books)
      .localCheckpoint()
    val q = emb.filter(col("vec_id") < 10)
    val got = Ann.graphSearchAdc(adj, enc, books, k = 16, emb, q,
        "vec_id", "embedding", entryIds = Ann.spreadEntries(n),
        beamWidth = 64, hops = 3, topK = 5, expandHops = 2)
      .localCheckpoint()
    // the rerank stage emits EXACT cosines: every (query, neighbor) cos
    // must equal the full-precision cosine recomputed from raw vectors
    val vecs = emb.select(col("vec_id").cast("long"), col("embedding")
        .cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cosRef(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    got.collect().foreach { r =>
      val (qid, nid, c) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      val exact = cosRef(vecs(qid), vecs(nid))
      assert(math.abs(c - math.rint(exact * 10000) / 10000) < 1e-9,
        s"rerank cos must be exact: q=$qid n=$nid got=$c want=$exact")
    }
    // navigation quality: the code-scored walk still finds the true
    // neighbors (codes guide, exactness comes from the refine stage)
    val exact5 = Ann.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
    val recall = Ann.recallEval(exact5, got, 5)
      .agg(avg("recall")).head.getDouble(0)
    // coarse m=8/k=16 codes on isotropic 64-dim vectors guide noisily;
    // beam width is the dial (32 -> 0.66, 64 -> measured below) — on
    // quantization-friendly (clustered / MRL) embeddings the same codes
    // navigate far tighter
    assert(recall >= 0.8, s"ADC-walk recall too low: $recall")
  }

  test("plan locks: rngPrune and graphSearchAdc stay keyed-join + bounded top-k") {
    val emb = Tables.t(spark, dir, "embeddings")
    val adj = Ann.serveGraph(Ann.nnDescent(emb, "vec_id", "embedding",
      k = 4, iters = 2)).localCheckpoint()
    // rngPrune: every selection round is keyed joins + a partitioned
    // window over src — no cartesian, no partition-less window
    val pruned = Ann.rngPrune(adj, emb, "vec_id", "embedding", 3)
    pruned.count()
    assert(partitionlessWindows(pruned).isEmpty,
      "rngPrune ranking must partition by src")
    // the ADC walk, lineage uncut so every round is visible to the plan:
    // keyed equi-joins only, broadcast LUT, bounded top-beam aggregate
    val books = Ann.pqCodebooks(emb, "vec_id", "embedding", m = 4, k = 8)
    val walked = Ann.graphSearchAdc(adj,
      Ann.pqEncode(emb, "vec_id", "embedding", books), books, k = 8,
      emb, emb.filter(col("vec_id") < 4), "vec_id", "embedding",
      entryIds = Seq(0L), beamWidth = 16, hops = 2, topK = 5,
      cutLineage = false, expandHops = 2)
    walked.count()
    val plan = walked.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "no all-pairs anywhere in the ADC walk")
    assert(plan.contains("topk_by_score"),
      "beam selection must be the bounded top-k aggregate")
    assert(partitionlessWindows(walked).isEmpty,
      "no single-partition window in the ADC walk")
  }

  test("matryoshkaTopK: full-corpus shortlist ≡ exact; 16-dim prefix recall holds") {
    val emb = Tables.t(spark, dir, "embeddings")
    val n = emb.count().toInt
    val q = emb.filter(col("vec_id") < 10)
    val exact = Ann.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .localCheckpoint()
    // shortlist = whole corpus -> stage 2 re-ranks everything exactly:
    // result must equal the exact ranker row-for-row
    val full = Ann.matryoshkaTopK(emb, q, "vec_id", "embedding",
      prefixDims = 16, shortlist = n - 1, topK = 5)
    val mismatch = exact
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .exceptAll(full.select(col("query_id"), col("rank"),
        col("neighbor_id").cast("long")))
      .count()
    assert(mismatch === 0L, "full-corpus shortlist must equal exact")
    // the shortlist is the recall dial. NOTE the fixture ceiling: these
    // synthetic embeddings are isotropic (not matryoshka-trained), so a
    // 16-dim prefix carries only ~1/4 of the signal — recall@shortlist=20
    // measures ~0.38 here, where MRL-trained vectors front-load
    // information precisely so this number approaches 1. The operator
    // contract pinned is therefore the DIAL (monotone in shortlist) and
    // the exact-at-full-corpus identity above, not an absolute recall.
    def recallAt(shortlist: Int): Double =
      Ann.recallEval(exact,
        Ann.matryoshkaTopK(emb, q, "vec_id", "embedding",
          prefixDims = 16, shortlist = shortlist, topK = 5), 5)
        .agg(avg("recall")).head.getDouble(0)
    val (r20, r100) = (recallAt(20), recallAt(100))
    assert(r20 >= 0.2, s"matryoshka recall@20 implausibly low: $r20")
    assert(r100 >= r20,
      s"shortlist dial must not lose recall: @100 $r100 < @20 $r20")
    assert(r100 >= 0.6, s"matryoshka recall@100 too low: $r100")
  }

  test("layeredDelete: tombstones gone from every layer, post-churn recall >= tombstone-only") {
    val emb = Tables.t(spark, dir, "embeddings")
    val deleted = emb.filter(col("vec_id") % 7 === 0)
    val survivors = emb.filter(col("vec_id") % 7 =!= 0).localCheckpoint()
    val layers0 = Ann.layeredBuild(emb, "vec_id", "embedding",
      k = 8, iters = 3, p = 4, maxLevel = 1, randomInit = true)
      .localCheckpoint()
    val repaired = Ann.layeredDelete(layers0, emb, deleted,
      "vec_id", "embedding", maxLevel = 1, kLink = 8).localCheckpoint()
    // no tombstoned id anywhere, in any layer
    val leaked = repaired
      .select(explode(array(col("src"), col("dst"))).as("vid"))
      .filter(col("vid") % 7 === 0).count()
    assert(leaked === 0L, "deleted ids must leave every layer")
    // layer column intact (both layers still present)
    assert(repaired.select("layer").distinct().count() === 2L)
    // tombstone-only baseline: edges removed, NO bridge repair
    val tombOnly = layers0
      .join(deleted.select(col("vec_id").as("src")), Seq("src"), "left_anti")
      .join(deleted.select(col("vec_id").as("dst")), Seq("dst"), "left_anti")
      .select("layer", "src", "dst").localCheckpoint()
    val q = survivors.filter(col("vec_id") % 13 === 1)
    val exact = Ann.bruteForceTopK(survivors, q, "vec_id", "embedding", 5)
      .localCheckpoint()
    def recall(ls: org.apache.spark.sql.DataFrame): Double =
      Ann.recallEval(exact,
        Ann.layeredSearch(ls, survivors, q, "vec_id", "embedding",
          maxLevel = 1, entryId = Ann.layeredEntry(ls, 1),
          beamUpper = 16, beamBase = 32, hopsBase = 2, topK = 5,
          expandHops = 2, expandUpper = 2), 5)
        .agg(avg("recall")).head.getDouble(0)
    val (rRep, rTomb) = (recall(repaired), recall(tombOnly))
    assert(rRep >= rTomb - 1e-9,
      s"bridge repair must not lose recall: repaired $rRep < tombstone-only $rTomb")
    assert(rRep >= 0.9, s"post-churn layered recall too low: $rRep")
  }
}
