package graft

import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, Sampling}

/** Round-11 fourth-session specs: BM25 ranking, sequential Poisson
  * weighted sampling, sketch-union algebra, lexical-statistics curves.
  */
class Round11cOpsSpec extends SparkSpec {

  private def docs = Tables.t(spark, sfDir, "documents")

  test("bm25TopK: served form equals one-shot form; ranks are 1..k") {
    import spark.implicits._
    val q = Seq((0, "table"), (0, "hash"), (1, "vector")).toDF("query_id", "term")
    val idx = Retrieval.lexIndexBuild(docs, "doc_id", "text")
    val served = Retrieval.bm25TopK(idx, q, k = 5).collect().toSet
    val oneShot = Retrieval.bm25TopK(docs, "doc_id", "text", q, k = 5)
      .collect().toSet
    assert(served === oneShot)
    val byQ = served.groupBy(_.getInt(0))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).toSeq.sorted === (1 to rows.size))
    }
  }

  test("bm25TopK: length normalization demotes long docs vs raw TF-IDF") {
    import spark.implicits._
    // two docs, same tf for the query term, one doc 10x longer: BM25 must
    // score the short doc strictly higher; integer TF-IDF scores them equal
    val d = Seq(
      (0L, "alpha beta " * 5),
      (1L, ("alpha beta " * 5) + ("filler " * 90))).toDF("doc_id", "text")
    val q = Seq((0, "alpha")).toDF("query_id", "term")
    val bm = Retrieval.bm25TopK(d, "doc_id", "text", q, k = 2)
      .orderBy("rank").collect()
    assert(bm(0).getLong(2) === 0L, "short doc must rank first under BM25")
    assert(bm(0).getLong(3) > bm(1).getLong(3))
    val ti = Retrieval.tfIdfTopK(d, "doc_id", "text", q, k = 2)
      .orderBy("rank").collect()
    assert(ti(0).getLong(3) === ti(1).getLong(3),
      "raw TF-IDF is length-blind on equal tf — the property BM25 fixes")
  }

  test("weightedSample: exact k, deterministic, weight-monotone inclusion") {
    val k = 20
    val s1 = Sampling.weightedSample(docs.select("doc_id", "n_chars"),
      "doc_id", col("n_chars"), k).collect()
    val s2 = Sampling.weightedSample(
      docs.select("doc_id", "n_chars").repartition(7),
      "doc_id", col("n_chars"), k).collect()
    assert(s1.length === k)
    assert(s1.map(_.getLong(0)).toSet === s2.map(_.getLong(0)).toSet,
      "selection must be partitioning-invariant")
    // weight-proportional: the sampled mean n_chars must exceed the corpus
    // mean (size-biased sampling), deterministically for this fixture
    val sampMean = s1.map(_.getLong(1)).sum.toDouble / k
    val corpMean = docs.agg(avg("n_chars")).head().getDouble(0)
    assert(sampMean > corpMean)
  }

  test("weightedSample: zero/negative weights are excluded") {
    import spark.implicits._
    val d = Seq((1L, 10L), (2L, 0L), (3L, -5L), (4L, 10L))
      .toDF("id", "w")
    val out = Sampling.weightedSample(d, "id", col("w"), 10).collect()
    assert(out.map(_.getLong(0)).toSet === Set(1L, 4L))
  }

  test("sketch unions: per-source merge equals direct on both sketches") {
    val hll = graft.queries.AnalysisOps.specs("agg_hll_union")
      .fn(spark, sfDir).collect()
    assert(hll.length === 64)
    assert(hll.forall(_.getBoolean(3)), "HLL elementwise-max merge must be lossless")
    val cms = graft.queries.AnalysisOps.specs("agg_cms_union")
      .fn(spark, sfDir).collect()
    assert(cms.length === 192)
    assert(cms.forall(_.getBoolean(3)), "CMS elementwise-sum merge must be lossless")
  }

  test("heaps law: vocab and token counts are monotone in the prefix") {
    val rows = graft.queries.AnalysisOps.specs("tx_heaps_law")
      .fn(spark, sfDir).orderBy(desc("den")).collect()
    val toks = rows.map(_.getLong(2))
    val vocab = rows.map(_.getLong(3))
    assert(toks.sliding(2).forall(p => p(0) <= p(1)))
    assert(vocab.sliding(2).forall(p => p(0) <= p(1)))
    // sublinear growth: vocab grows slower than tokens (Heaps' law shape)
    assert(vocab.last.toDouble / vocab.head < toks.last.toDouble / toks.head)
  }

  test("zipf slope: negative and in the natural-text band") {
    val r = graft.queries.AnalysisOps.specs("tx_zipf_slope")
      .fn(spark, sfDir).head()
    val slope = r.getDouble(3)
    assert(slope < -0.1 && slope > -3.0, s"got $slope")
  }
}
