package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Round-14 serving-surface specs: filtered graph serve, deletion with
  * bridge repair, and the two-stage ADC exact re-rank.
  */
class Round14ServeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("graphSearchWhere: results within the allowed set, match filtered exact at generous beam") {
    val emb = Tables.t(spark, dir, "embeddings")
    val n = emb.count()
    val q = emb.filter(col("vec_id") < 6)
    val allowed = emb.filter(col("vec_id") % 3 === 0)
    val graph = Ann.serveGraph(Ann.nnDescent(emb, "vec_id", "embedding",
      k = 12, iters = 5, randomInit = true)).localCheckpoint()
    val got = Ann.graphSearchWhere(graph, emb, q, "vec_id", "embedding",
      entryIds = Ann.spreadEntries(n), allowed = allowed,
      beamWidth = 96, hops = 4, topK = 5)
    // every returned neighbor satisfies the predicate
    assert(got.filter(col("neighbor_id") % 3 =!= 0).count() === 0L)
    // at a generous over-fetch, the filtered walk ≈ exact-over-allowed:
    // recall against the filtered brute force must be high
    val exact = Ann.bruteForceTopK(allowed, q, "vec_id", "embedding", 5)
    val recall = Ann.recallEval(exact, got, 5)
      .agg(avg("recall")).head.getDouble(0)
    assert(recall >= 0.9, s"filtered serve recall too low: $recall")
  }

  test("graphDelete: bridges repair churn — recall beats tombstone-only and stays serve-grade") {
    val emb = Tables.t(spark, dir, "embeddings")
    val n = emb.count()
    val survivors = emb.filter(col("vec_id") % 7 =!= 0).localCheckpoint()
    val deleted = emb.filter(col("vec_id") % 7 === 0)
    val graph = Ann.serveGraph(Ann.nnDescent(emb, "vec_id", "embedding",
      k = 12, iters = 5, randomInit = true)).localCheckpoint()
    val bridged = Ann.graphDelete(graph, emb, deleted, "vec_id",
      "embedding", kLink = 12).localCheckpoint()
    // tombstone-only: edges dropped, no repair
    val tombstone = graph
      .join(deleted.select(col("vec_id").as("src")), Seq("src"), "left_anti")
      .join(deleted.select(col("vec_id").as("dst")), Seq("dst"), "left_anti")
      .localCheckpoint()
    // no deleted id survives anywhere in the repaired adjacency
    assert(bridged.filter(col("src") % 7 === 0 || col("dst") % 7 === 0)
      .count() === 0L)
    val queries = survivors.filter(col("vec_id") % 31 === 1)
    val exact = Ann.bruteForceTopK(survivors, queries, "vec_id",
      "embedding", 5).localCheckpoint()
    def recall(g: org.apache.spark.sql.DataFrame): Double =
      Ann.recallEval(exact,
        Ann.graphSearch(g, survivors, queries, "vec_id", "embedding",
          entryIds = Seq(1L), beamWidth = 48, hops = 4, topK = 5), 5)
        .agg(avg("recall")).head.getDouble(0)
    val (rBridged, rTomb) = (recall(bridged), recall(tombstone))
    assert(rBridged >= rTomb - 1e-9,
      s"bridged recall $rBridged must not trail tombstone-only $rTomb")
    assert(rBridged >= 0.9, s"post-churn recall too low: $rBridged")
  }

  test("rrfFuse: exact integer contributions, agreement dominates") {
    import spark.implicits._
    import graft.operators.Retrieval
    // leg A ranks doc 7 first, doc 8 second; leg B ranks 8 first, 7 third:
    // fused(7) = 1e6/61 + 1e6/63 = 16393 + 15873; fused(8) = 1e6/62 + 1e6/61
    val a = Seq((0L, 1, 7L), (0L, 2, 8L), (0L, 3, 9L))
      .toDF("query_id", "rank", "id")
    val b = Seq((0L, 1, 8L), (0L, 2, 9L), (0L, 3, 7L))
      .toDF("query_id", "rank", "id")
    val got = Retrieval.rrfFuse(Seq(a, b), kConst = 60, topK = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    val exp7 = 1000000L / 61 + 1000000L / 63
    val exp8 = 1000000L / 62 + 1000000L / 61
    val exp9 = 1000000L / 63 + 1000000L / 62
    assert(got.toSeq === Seq((8L, exp8), (7L, exp7), (9L, exp9)))
  }

  test("maxSimRerank: late interaction beats any single slot on a constructed case") {
    import spark.implicits._
    import graft.operators.Retrieval
    def unit(i: Int): Array[Double] =
      Array.tabulate(4)(d => if (d == i) 1.0 else 0.0)
    // query has two aspects (axes 0 and 1). doc 10 covers BOTH (one slot
    // each); doc 11 nails axis 0 twice but never axis 1. Slot-0-only
    // ranking ties them; MaxSim must prefer the covering doc 10.
    val qv = Seq((0L, 0, unit(0)), (0L, 1, unit(1)))
      .toDF("query_id", "slot", "vec")
    val dv = Seq(
      (10L, 0, unit(0)), (10L, 1, unit(1)),
      (11L, 0, unit(0)), (11L, 1, unit(0)))
      .toDF("doc_id", "slot", "vec")
    val cand = Seq((0L, 10L), (0L, 11L)).toDF("query_id", "doc_id")
    val got = Retrieval.maxSimRerank(cand, qv, dv, topK = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    // doc 10: qslot0 max cos 1, qslot1 max cos 1 → 20000 micro
    // doc 11: qslot0 max 1, qslot1 max 0 → 10000 micro
    assert(got.toSeq === Seq((10L, 20000L), (11L, 10000L)))
  }

  test("nnDescentAuto: stops at convergence, result == fixed-round run of that depth") {
    import spark.implicits._
    // a corpus small enough that the two-hop closure saturates fast: the
    // descent MUST stop before maxIters
    val vecs = (0 until 40).map { i =>
      (i.toLong, (0 until 8).map(d =>
        math.sin(i * 1.7 + d * 0.37) + math.cos((i + 2) * d * 0.11)).toArray)
    }.toDF("vec_id", "embedding").localCheckpoint()
    val tele = Ann.nnDescentConvergence(vecs, "vec_id", "embedding",
        k = 6, iters = 6)
      .orderBy("round").collect().map(r => r.getInt(0) -> r.getLong(1))
    // convergence is real on this corpus: late rounds change (almost)
    // nothing
    assert(tele.last._2 <= math.ceil(0.01 * 6 * 40).toLong,
      s"corpus did not converge: ${tele.mkString(",")}")
    // auto with a generous delta stops strictly before maxIters, and its
    // result is IDENTICAL to the fixed-round run of the same depth
    val threshold = math.ceil(0.01 * 6 * 40).toLong
    val stopRound = tele.find(_._2 < threshold).map(_._1)
      .getOrElse(fail(s"no round under threshold: ${tele.mkString(",")}"))
    assert(stopRound < 6, "early stop must fire before maxIters")
    val auto = Ann.nnDescentAuto(vecs, "vec_id", "embedding",
        k = 6, maxIters = 6, delta = 0.01)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val fixed = Ann.nnDescent(vecs, "vec_id", "embedding",
        k = 6, iters = stopRound)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(auto === fixed,
      s"auto (stopped at $stopRound) must equal the fixed-$stopRound run")
  }

  test("pqAdcRerank: recall >= raw ADC; full-corpus shortlist == exact ranking") {
    val emb = Tables.t(spark, dir, "embeddings")
    val n = emb.count()
    val q = emb.filter(col("vec_id") < 8)
    val books = Ann.pqCodebooks(emb, "vec_id", "embedding", m = 4, k = 8)
    val enc = Ann.pqEncode(emb, "vec_id", "embedding", books)
      .localCheckpoint()
    val exact = Ann.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .localCheckpoint()
    val adcRecall = Ann.recallEval(exact,
        Ann.pqAdcTopK(enc, books, k = 8, q, "vec_id", "embedding", 5), 5)
      .agg(avg("recall")).head.getDouble(0)
    val rrRecall = Ann.recallEval(exact,
        Ann.pqAdcRerank(enc, books, k = 8, emb, q, "vec_id", "embedding",
          shortlist = 40, topK = 5), 5)
      .agg(avg("recall")).head.getDouble(0)
    assert(rrRecall >= adcRecall - 1e-9,
      s"reranked recall $rrRecall must not trail raw ADC $adcRecall")
    // shortlist = whole corpus → the re-rank IS the exact ranking
    val full = Ann.pqAdcRerank(enc, books, k = 8, emb, q, "vec_id",
        "embedding", shortlist = n.toInt, topK = 5)
      .orderBy("query_id", "rank").collect()
    val ex = exact.orderBy("query_id", "rank").collect()
    assert(full.length === ex.length)
    full.zip(ex).foreach { case (g, e) =>
      assert(g.getLong(0) === e.getLong(0) && g.getInt(1) === e.getInt(1) &&
        g.getLong(2) === e.getLong(2),
        s"query ${g.getLong(0)} rank ${g.getInt(1)}: ${g.getLong(2)} vs ${e.getLong(2)}")
    }
  }
}
