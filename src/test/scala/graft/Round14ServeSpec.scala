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
