package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, DataQuality, LinkGraph, TextAnalysis, TimeSeries}

/** Round-11 fifth-session specs: column profiling, MAD outliers, LOCF
  * gap fill, SCD-2 run-length versions, PMI collocations, degree-ordered
  * triangle counting, cosine range search.
  */
class Round11dOpsSpec extends SparkSpec {

  test("triangleCount: K4 plus a disjoint edge — exact counts") {
    import spark.implicits._
    // K4 on {1,2,3,4} has C(4,3)=4 triangles; edge (8,9) adds none.
    // Duplicate + reversed edges must collapse.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L), (3L, 1L), // reversed duplicates
      (8L, 9L)).toDF("src", "dst")
    val r = LinkGraph.triangleCount(edges, "src", "dst").collect()(0)
    assert(r.getLong(0) === 6L, "n_vertices")
    assert(r.getLong(1) === 7L, "n_edges")
    assert(r.getLong(2) === 4L, "n_triangles")
  }

  test("triangleCount: triangle-free bipartite graph counts zero") {
    import spark.implicits._
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L))
      .toDF("src", "dst")
    val r = LinkGraph.triangleCount(edges, "src", "dst").collect()(0)
    assert(r.getLong(2) === 0L)
  }

  test("gapFillLocf: interior gaps carry last observation forward") {
    import spark.implicits._
    // key 7: observations in buckets 0, 3 (two rows in bucket 0 — the
    // later (t=5) one wins); buckets 1, 2 are gaps filled with 20.0.
    val df = Seq(
      (7L, 1L, 1L, 10.0), (7L, 5L, 2L, 20.0), // bucket 0
      (7L, 35L, 3L, 40.0) // bucket 3
    ).toDF("k", "t", "id", "v")
    val g = TimeSeries.gapFillLocf(df, "k", "t", "id", "v", 10L)
      .orderBy("bucket").collect()
    assert(g.map(_.getLong(1)).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(g(0).getDouble(3) === 20.0, "last-in-bucket pick is (t,tie)-max")
    assert(g(1).isNullAt(2) && g(1).getDouble(3) === 20.0)
    assert(g(2).isNullAt(2) && g(2).getDouble(3) === 20.0)
    assert(g(3).getDouble(3) === 40.0)
  }

  test("runLengthVersions: collapses consecutive repeats only") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"), (1L, 30L, 3L, "b"),
      (1L, 40L, 4L, "a"), // a again after b — a NEW version
      (2L, 10L, 5L, "x")
    ).toDF("k", "t", "id", "s")
    val v = TimeSeries.runLengthVersions(df, "k", "t", "id", "s")
      .orderBy("key", "t").collect()
    assert(v.map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSeq ===
      Seq((1L, 10L, "a"), (1L, 30L, "b"), (1L, 40L, "a"), (2L, 10L, "x")))
  }

  test("profile: exact nulls/distincts; non-numeric min/max are null") {
    import spark.implicits._
    val df = Seq(
      (Some(1), Some("x")), (Some(1), None), (None, Some("y")))
      .toDF("n", "s")
    val p = DataQuality.profile(df, Seq("n", "s")).orderBy("col_name")
      .collect()
    val n = p(0)
    assert(n.getString(0) === "n" && n.getLong(1) === 1L &&
      n.getLong(2) === 1L && n.getDouble(3) === 1.0 && n.getDouble(4) === 1.0)
    val s = p(1)
    assert(s.getString(0) === "s" && s.getLong(1) === 1L &&
      s.getLong(2) === 2L && s.isNullAt(3) && s.isNullAt(4))
  }

  test("madOutliers: known median/MAD; only the far point flags") {
    import spark.implicits._
    // values 1..9 plus 100: n=10, lower median = 5th smallest = 5.0;
    // devs |v-5| = 4,3,2,1,0,1,2,3,4,95 → sorted 0,1,1,2,2,3,3,4,4,95;
    // lower median (rank 5) = 2.0; outliers dev > 6 → only 100.
    val df = ((1 to 9).map(_.toDouble) :+ 100.0).zipWithIndex
      .map { case (v, i) => ("g", v, i.toLong) }.toDF("grp", "v", "id")
    val r = DataQuality.madOutliers(df, "grp", "v", "id").collect()(0)
    assert(r.getDouble(1) === 5.0, "median")
    assert(r.getDouble(2) === 2.0, "mad")
    assert(r.getLong(3) === 10L && r.getLong(4) === 1L)
  }

  test("pmiCollocations: fused pair outranks independent pair") {
    import spark.implicits._
    // "aa bb" always adjacent (perfect association); "cc"/"dd" frequent
    // but never adjacent to each other.
    val docs = (0 until 30).map(i => (i.toLong, "aa bb cc xx dd yy"))
      .toDF("id", "text")
    val top = TextAnalysis.pmiCollocations(docs, "id", "text", minCount = 5, k = 50)
      .collect()
    val byPair = top.map(r => ((r.getString(0), r.getString(1)), r.getLong(3))).toMap
    assert(byPair.contains(("aa", "bb")))
    assert(!byPair.contains(("cc", "dd")), "non-adjacent pair never a bigram")
    // perfect association: lift = N/c = 180/30 = 6 → 6e6 ppm exactly
    assert(byPair(("aa", "bb")) === 6000000L)
  }

  test("hits: star graph fixed point — center is the hub, leaves split auth") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val r = LinkGraph.hits(edges, "src", "dst", iters = 2)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) === ((1000000L, 0L)), "center: full hub mass, no authority")
    assert(r(2L) === ((0L, 333333L)), "leaf: no hub mass, third of authority")
    assert(r(3L) === r(2L) && r(4L) === r(2L))
  }

  test("hits: guards reject overflow-risk scale and bad iters") {
    import spark.implicits._
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](LinkGraph.hits(e, "src", "dst", scale = 4000000000L))
    intercept[IllegalArgumentException](LinkGraph.hits(e, "src", "dst", iters = 0))
  }

  test("orphanCount / dupKeyCount: find the planted violations") {
    import spark.implicits._
    val child = Seq((1L, "a"), (2L, "b"), (9L, "c"), (9L, "d")).toDF("fk", "x")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val oc = DataQuality.orphanCount(child, Seq("fk"), parent, Seq("pk")).collect()(0)
    assert(oc.getLong(0) === 4L && oc.getLong(1) === 2L)
    val dk = DataQuality.dupKeyCount(child, Seq("fk")).collect()(0)
    assert(dk.getLong(0) === 4L && dk.getLong(1) === 1L)
    val dk2 = DataQuality.dupKeyCount(child, Seq("fk", "x")).collect()(0)
    assert(dk2.getLong(1) === 0L, "composite key is unique")
  }

  test("ivfRange: hits are ivfTopK candidates above the threshold") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    val rs = Ann.ivfRange(emb, q, "vec_id", "embedding",
      minCos = 0.20, nLists = 8, nprobe = 3).collect()
    assert(rs.nonEmpty)
    assert(rs.forall(_.getDouble(2) >= 0.20 - 1e-4))
    // same quantizer config → same probed lists; every range hit must be
    // in the exhaustive-k ranking of the same candidate stream
    val topk = Ann.ivfTopK(emb, q, "vec_id", "embedding",
      k = 500, nLists = 8, nprobe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    rs.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(topk.contains(key) && topk(key) === r.getDouble(2))
    }
  }

  test("trendSlope: exact slope on a perfect line; singletons dropped") {
    import spark.implicits._
    val df = Seq((1L, 0L, 0L), (1L, 1L, 3L), (1L, 2L, 6L), (1L, 3L, 9L),
      (2L, 5L, 7L)).toDF("k", "x", "y")
    val r = TimeSeries.trendSlope(df, "k", "x", "y").collect()
    assert(r.length === 1, "single-point key must be dropped")
    assert(r(0).getLong(0) === 1L && r(0).getLong(2) === 3000000L)
  }

  test("chiSquare2x2: perfect association and degenerate margins") {
    import spark.implicits._
    // a=10, d=10, b=c=0: chi-square = N = 20 → 20e6 ppm exactly
    val perfect = (Seq.fill(10)((0, 1)) ++ Seq.fill(10)((1, 0))).toDF("g", "f")
    val p = DataQuality.chiSquare2x2(perfect, "g", "f").collect()(0)
    assert(p.getLong(0) === 10L && p.getLong(3) === 10L)
    assert(p.getLong(4) === 20000000L)
    // everyone converts → a zero margin → 0, not a division error
    val degen = Seq((0, 1), (1, 1)).toDF("g", "f")
    assert(DataQuality.chiSquare2x2(degen, "g", "f").collect()(0).getLong(4) === 0L)
  }

  test("labelPropagation: disjoint triangles converge to their min ids") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("src", "dst")
    val r = LinkGraph.labelPropagation(edges, "src", "dst", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(r(_) === 1L))
    assert(Seq(10L, 11L, 12L).forall(r(_) === 10L))
  }

  test("rakeKeywords: degree/frequency scoring on a known corpus") {
    import spark.implicits._
    // 'of' splits phrases; "red apple" repeats, "banana" is a singleton.
    val docs = Seq((0L, "red apple of banana"), (1L, "red apple"))
      .toDF("id", "text")
    val r = TextAnalysis.rakeKeywords(docs, "id", "text").collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    // red/apple: freq 2, deg 2+2=4 → 2e6 each → phrase 4e6, 2 occurrences
    assert(r("red apple") === ((2L, 4000000L)))
    // banana: freq 1, deg 1 → 1e6
    assert(r("banana") === ((1L, 1000000L)))
  }

  test("rangeSearch: agrees with bruteForceTopK above the threshold") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    val rs = Ann.rangeSearch(emb, q, "vec_id", "embedding", minCos = 0.25)
      .collect()
    assert(rs.nonEmpty)
    assert(rs.forall(_.getDouble(2) >= 0.25 - 1e-4))
    // every range hit must appear in a large-enough exact top-k, with the
    // same rounded cosine
    val topk = Ann.bruteForceTopK(emb, q, "vec_id", "embedding", 50)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    rs.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(topk.contains(key), s"range hit $key missing from top-50")
      assert(topk(key) === r.getDouble(2))
    }
  }
}
