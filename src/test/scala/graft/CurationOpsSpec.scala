package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Round-4 curation operators: C4-style chunk dedup, keep-best-per-key,
  * Gopher quality gate, deterministic global shuffle, decontamination,
  * and the k-NN self-join.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- C4-style chunk dedup ----------------------------------------------

  test("chunkDedup removes later occurrences of a duplicated chunk and reassembles") {
    // doc 1 and doc 2 share an identical 3-token chunk at chunk 0; doc 3
    // repeats its own first chunk (within-doc dup)
    val docs = Seq(
      (1L, "aa bb cc x1 y1 z1"),
      (2L, "aa bb cc x2 y2 z2"),
      (3L, "dd ee ff dd ee ff")
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, "doc_id", "text", 3)
      .orderBy("doc")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 2L, 2L, "aa bb cc x1 y1 z1")), s"winner intact: ${out(0)}")
    assert(out(1) == ((2L, 2L, 1L, "x2 y2 z2")), s"dup chunk removed: ${out(1)}")
    assert(out(2) == ((3L, 2L, 1L, "dd ee ff")), s"within-doc dup removed: ${out(2)}")
  }

  test("chunkDedup accounts for a doc whose every chunk loses") {
    val docs = Seq((1L, "aa bb cc"), (2L, "aa bb cc")).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, "doc_id", "text", 3)
      .orderBy("doc").as[(Long, Long, Long, String)].collect()
    assert(out(1) == ((2L, 1L, 0L, "")), s"loser doc must survive with n_kept=0: ${out(1)}")
  }

  test("chunkDedup is idempotent: re-running on cleaned output changes nothing") {
    val docs = Tables.t(spark, sfDir, "documents").limit(200)
    val once = Dedup.chunkDedup(docs, "doc_id", "text", 10)
      .select(col("doc").as("doc_id"), col("cleaned").as("text"))
      .filter(col("text") =!= "")
    val twice = Dedup.chunkDedup(once, "doc_id", "text", 10)
    // every chunk in the cleaned corpus is already globally unique, so the
    // second pass must keep everything
    val lost = twice.filter(col("n_kept") < col("n_chunks")).count()
    assert(lost == 0, s"$lost docs lost chunks on the second pass")
  }

  test("normalize collapses case, punctuation, and whitespace to a canonical key") {
    val rows = Seq(
      "  Hello,   WORLD!!  ",
      "hello world",
      "HELLO ... world"
    ).toDF("text").select(TextAnalysis.normalize(col("text")).as("n"))
      .as[String].collect()
    assert(rows.toSet == Set("hello world"), s"got ${rows.toSeq}")
  }

  // ---- keep-best-per-key --------------------------------------------------

  test("keepBestPerKey keeps the highest-ranked row with deterministic ties") {
    val df = Seq(
      ("s1", 1L, 10L), ("s1", 2L, 30L), ("s1", 3L, 30L), // tie on 30 → doc 2
      ("s2", 4L, 5L)
    ).toDF("source", "doc_id", "n_chars")
    val best = Dedup.keepBestPerKey(df, Seq("source"),
      Seq(-col("n_chars"), col("doc_id")), Seq("doc_id", "n_chars"))
      .orderBy("source").as[(String, Long, Long)].collect()
    assert(best.toSeq == Seq(("s1", 2L, 30L), ("s2", 4L, 5L)))
  }

  // ---- Gopher quality gate ------------------------------------------------

  test("gopherPass applies word-count, word-length, and alpha-fraction rules") {
    val longNatural = ("the quick brown fox jumps over a lazy dog and " * 6).trim
    val tooShort = "the cat sat"
    val numeric = (1 to 60).mkString(" ") // no alpha words, no stopwords
    val df = Seq((1L, longNatural), (2L, tooShort), (3L, numeric))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.gopherPass(col("text")).as("p"))
      .as[(Long, Boolean)].collect().toMap
    assert(df(1L), "natural 60-word doc must pass")
    assert(!df(2L), "3-word doc must fail the min-word-count rule")
    assert(!df(3L), "all-numeric doc must fail alpha/stopword rules")
  }

  // ---- deterministic global shuffle ---------------------------------------

  test("globalShuffle is a dense seed-stable permutation, independent of partitioning") {
    val df = spark.range(1000).toDF("id")
    val pos = Sampling.globalShuffle(df, "id", 7L)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(pos.values.toSeq.sorted == (0L until 1000L), "positions must be dense 0..n-1")
    // repartitioning must not change a single position
    val pos2 = Sampling.globalShuffle(df.repartition(13), "id", 7L)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(pos == pos2, "permutation must be partitioning-independent")
    // a different seed must give a genuinely different permutation
    val posOther = Sampling.globalShuffle(df, "id", 8L)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(pos.count { case (k, v) => posOther(k) == v } < 50,
      "different seeds must decorrelate the order")
  }

  // ---- decontamination ----------------------------------------------------

  test("decontaminate drops overlapping docs, keeps clean and short docs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "corpus"),
      (2L, "one two three four five six seven", "corpus"),
      (3L, "tiny doc", "corpus"), // < n tokens: no evidence, must be kept
      (100L, "alpha beta gamma delta epsilon", "bench")
    ).toDF("doc_id", "text", "side")
    val kept = Contamination.decontaminate(docs, col("side") === "bench",
      "doc_id", "text", n = 5, maxFrac = 0.0)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L), s"got $kept")
  }

  // ---- vocabulary / BPE front end -----------------------------------------

  test("topTokens counts correctly and compiles to a bounded TakeOrdered plan") {
    val docs = Seq((1L, "aa bb aa cc"), (2L, "aa bb")).toDF("doc_id", "text")
    val top = Vocab.topTokens(docs, "text", 2)
    assert(top.as[(String, Long)].collect().toSeq == Seq(("aa", 3L), ("bb", 2L)))
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a bounded per-partition take, not a global sort:\n${plan.take(400)}")
  }

  test("topPairs counts adjacent pairs across all occurrences") {
    val docs = Seq((1L, "aa bb aa bb"), (2L, "aa bb")).toDF("doc_id", "text")
    val got = Vocab.topPairs(docs, "doc_id", "text", 3).as[(String, Long)].collect().toSeq
    assert(got == Seq(("aa bb", 3L), ("bb aa", 1L)))
  }

  // ---- importance sampling / domain mixing --------------------------------

  test("importanceSample keeps monotonically more rows at higher weights") {
    val df = spark.range(2000).toDF("id")
    def kept(w: Double): Set[Long] =
      Sampling.importanceSample(df, "id", lit(w)).as[Long].collect().toSet
    val (k2, k5, k8) = (kept(0.2), kept(0.5), kept(0.8))
    assert(k2.subsetOf(k5) && k5.subsetOf(k8), "kept sets must be nested in weight")
    assert(math.abs(k5.size - 1000) < 150, s"~half expected at 0.5, got ${k5.size}")
  }

  test("domainMix hits the target mixture and keeps the binding domain whole") {
    val df = (Seq.fill(800)("a") ++ Seq.fill(100)("b") ++ Seq.fill(100)("c"))
      .zipWithIndex.map { case (d, i) => (i.toLong, d) }.toDF("id", "dom")
    // target 50/50 over a and b: b (100 rows vs target 0.5) binds → kept
    // whole; a down-samples to ~100; c is dropped (no target)
    val kept = Sampling.domainMix(df, "id", "dom", Map("a" -> 0.5, "b" -> 0.5))
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(kept("b") == 100L, s"binding domain must be kept whole: $kept")
    assert(!kept.contains("c"), "untargeted domain must be dropped")
    assert(math.abs(kept("a") - 100L) < 40, s"a must downsample to ~100: $kept")
  }

  test("qualityLogit rewards stopword-bearing prose and punishes punctuation") {
    val rows = Seq(
      (1L, "the cat is on the mat and it is warm " * 5),
      (2L, "!!! ??? ... ;;; ::: !!! ??? ... ;;; :::")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.qualityLogit(col("text")).as("l"))
      .as[(Long, Double)].collect().toMap
    assert(rows(1L) > rows(2L), s"prose must outscore punctuation salad: $rows")
  }

  // ---- k-NN self-join -----------------------------------------------------

  test("knnJoin returns per-vector bucket-local exact top-k") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val knn = Ann.knnJoin(emb, "vec_id", "embedding", numPlanes = 6, k = 2)
    val rows = knn.select("query_id", "rank", "neighbor_id", "cos")
      .as[(Long, Int, Long, Double)].collect()
    assert(rows.nonEmpty)
    // rank is 1..k and cos is non-increasing within a query
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length), s"ranks of $q")
      assert(sorted.sliding(2).forall(w => w.length < 2 || w(0)._4 >= w(1)._4),
        s"cos must be non-increasing for $q")
    }
    // spot-check one query against brute force restricted to its bucket
    val buckets = Ann.hyperplaneBuckets(emb, "vec_id", "embedding", 6)
      .as[(Long, String)].collect().toMap
    val q = rows.head._1
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expect = vecs.keys.filter(o => o != q && buckets(o) == buckets(q))
      .map(o => (o, cos(vecs(q), vecs(o))))
      .toSeq.sortBy { case (id, c) => (-c, id) }.take(2).map(_._1)
    val got = rows.filter(_._1 == q).sortBy(_._2).map(_._3).toSeq
    assert(got == expect, s"query $q: got $got expected $expect")
  }
}
