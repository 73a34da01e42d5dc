package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Round-5 operators: SemDeDup scale contract (cluster sizing + pair-volume
  * guard).
  */
class Round5OpsSpec extends SparkSpec {

  // ---- SemDeDup scale contract -------------------------------------------

  test("semanticDedupNLists: √n default, n/target when a target is given") {
    assert(Dedup.semanticDedupNLists(10000) == 100)
    assert(Dedup.semanticDedupNLists(1000000) == 1000)
    assert(Dedup.semanticDedupNLists(10000, Some(100L)) == 100)
    assert(Dedup.semanticDedupNLists(1000000, Some(200L)) == 5000)
    // degenerate corpora: at least 1 cluster, never more clusters than rows
    assert(Dedup.semanticDedupNLists(0) == 1)
    assert(Dedup.semanticDedupNLists(3, Some(1L)) == 3)
    assert(Dedup.semanticDedupNLists(5, Some(1000L)) == 1)
    intercept[IllegalArgumentException](Dedup.semanticDedupNLists(10, Some(0L)))
  }

  test("semanticDedup refuses an under-clustered call (pair-volume guard)") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    // nLists=1 puts the whole corpus in one cluster: Σ(cluster²) = n² —
    // exactly the all-pairs-in-disguise shape the guard exists to reject
    val e = intercept[IllegalArgumentException] {
      Dedup.semanticDedup(emb, "vec_id", "embedding",
        nLists = 1, threshold = 0.4, maxPairComparisons = 100L)
    }
    assert(e.getMessage.contains("pair volume"))
    assert(e.getMessage.contains("semanticDedupNLists"))
  }

  // ---- real ImageIO codec ------------------------------------------------

  test("decodeMeta really decodes PNG and JPEG payloads (ImageIO round-trip)") {
    import spark.implicits._
    val specs = Seq(
      Multimodal.ImageSpec(1L, 5, 9, "png", 40),
      Multimodal.ImageSpec(2L, 12, 3, "jpeg", 200),
      Multimodal.ImageSpec(3L, 1, 1, "png", 0)).toDS()
    val bin = Multimodal.synthesizeImages(spark, specs)
    val metas = Multimodal.decodeMeta(spark, bin).collect().sortBy(_.doc_id)
    assert(metas.map(m => (m.doc_id, m.format, m.width, m.height)).toSeq ==
      Seq((1L, "png", 5, 9), (2L, "jpeg", 12, 3), (3L, "png", 1, 1)))
    assert(metas.forall(m => m.status == "ok" && m.err.isEmpty))
    // the real path hashed the actual container bytes
    val payload1 = bin.filter(col("doc_id") === 1)
      .head().getAs[Array[Byte]]("payload")
    assert(metas.head.n_bytes == payload1.length)
    // PNG pixels survive the round-trip exactly (lossless): decode and
    // check the gray fill
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload1))
    assert((img.getRGB(2, 4) & 0xffffff) == 40 * 0x010101)
  }

  test("decodeMeta falls back to the deterministic stub for non-image payloads") {
    import spark.implicits._
    val bin = Seq((7L, "just some text, no image magic"))
      .toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload").cast("binary"))
    val m = Multimodal.decodeMeta(spark, bin).head()
    // stub shape: dims derived from byte arithmetic, not a decoded raster
    assert(m.n_bytes == 30 && m.width == 64 + 30 && m.height == 64 + ('j' * 7 % 512))
    assert(m.status == "stub" && m.err.isEmpty)
  }

  test("a sniffed-but-corrupt image quarantines; the batch still completes") {
    import spark.implicits._
    val whole = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val truncated = whole.take(24) // PNG magic + partial IHDR
    val specs = Seq(Multimodal.ImageSpec(8L, 4, 4, "png", 10)).toDS()
    val good = Multimodal.synthesizeImages(spark, specs)
    val bin = good.union(Seq(Tuple1(9L)).toDF("doc_id")
      .select(col("doc_id"), lit(truncated).as("payload")))
    // one corrupt payload in the batch must NOT abort the job — it becomes
    // an accountable quarantine row alongside the good row's real decode
    val metas = Multimodal.decodeMeta(spark, bin).collect().sortBy(_.doc_id)
    assert(metas.map(_.status).toSeq == Seq("ok", "corrupt"))
    val bad = metas.last
    assert(bad.doc_id == 9L && bad.format == "png" &&
      bad.width == 0 && bad.height == 0 &&
      bad.n_bytes == 24 && bad.err.nonEmpty)
    // and the audit aggregates the quarantine per (status, format)
    val audit = Multimodal.decodeAudit(Multimodal.decodeMeta(spark, bin).toDF())
      .orderBy("status").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(audit.toSeq == Seq(("corrupt", "png", 1L, 24L), ("ok", "png", 1L, 0L)))
  }

  test("semanticDedupAuto sizes the quantizer from the corpus and runs") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val n = emb.count()
    val survivors = Dedup.semanticDedupAuto(emb, "vec_id", "embedding",
      threshold = 0.4)
    val rows = survivors.count()
    assert(rows > 0 && rows <= n)
    // centroid ids must span the √n-sized codebook, not a pinned constant
    val k = Dedup.semanticDedupNLists(n)
    val maxCentroid = survivors.agg(max(col("centroid"))).head().getInt(0)
    assert(maxCentroid < k)
  }

  // ---- cross-doc exact-substring duplication ------------------------------

  test("substringDupStats marks shared w-token windows, by position") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),       // windows: "a b c", "b c d", "c d e", "d e f"
      (2L, "x y z a b c"),       // shares "a b c" with doc 1
      (3L, "p q r s"),           // no overlap
      (4L, "a b c a b c")        // "a b c" twice by position + "b c a", "c a b"
    ).toDF("doc_id", "text")
    val got = Dedup.substringDupStats(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((4L, 1L, 0.25)))   // only "a b c" is cross-doc
    assert(got(2L) == ((4L, 1L, 0.25)))
    assert(got(3L) == ((2L, 0L, 0.0)))
    assert(got(4L) == ((4L, 2L, 0.5)))    // both positions of "a b c" count
  }

  test("substringDupStats: docs shorter than w emit no windows") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val got = Dedup.substringDupStats(docs, "doc_id", "text", 3).collect()
    assert(got.map(_.getLong(0)).toSet == Set(2L))
  }

  test("substringDedup cuts all-but-first occurrences and reassembles docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),   // holds the first occurrence of "a b c"
      (2L, "x a b c y"),   // loses its "a b c" span
      (3L, "p q r")        // untouched
    ).toDF("doc_id", "text")
    val got = Dedup.substringDedup(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((5L, 5L, "a b c d e")))  // winner keeps everything
    assert(got(2L) == ((5L, 2L, "x y")))        // covered span removed
    assert(got(3L) == ((3L, 3L, "p q r")))
  }

  test("substringDedup: a doc losing every token survives with n_kept = 0") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val got = Dedup.substringDedup(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((3L, 3L, "a b c")))
    assert(got(2L) == ((3L, 0L, "")))
  }

  test("substringDedup crossDocOnly=false also cuts within-doc repeats") {
    import spark.implicits._
    val docs = Seq((1L, "a b c x a b c")).toDF("doc_id", "text")
    // cross-doc scope: the repeat lives in ONE doc, nothing is cut
    val cross = Dedup.substringDedup(docs, "doc_id", "text", 3)
      .head()
    assert(cross.getLong(2) == 7L && cross.getString(3) == "a b c x a b c")
    // any-repeat scope: the second "a b c" occurrence (positions 5-7) goes
    val any = Dedup.substringDedup(docs, "doc_id", "text", 3, crossDocOnly = false)
      .head()
    assert(any.getLong(2) == 4L && any.getString(3) == "a b c x")
  }

  // ---- RAG-style token chunking ---------------------------------------------

  test("chunkByTokens: stride overlap, trailing partial kept, nothing dropped") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 11).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.chunkByTokens(docs, "doc_id", "text", window = 4, stride = 3)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3))).sortBy(_._1)
    // chunks at offsets 0,3,6,9: ceil((11-4)/3)+1 = 3+1 = 4 chunks
    assert(got.length == 4)
    assert(got(0) == ((0, "t1 t2 t3 t4", 4)))
    assert(got(1) == ((1, "t4 t5 t6 t7", 4)))
    assert(got(2) == ((2, "t7 t8 t9 t10", 4)))
    assert(got(3) == ((3, "t10 t11", 2)))  // trailing partial survives
  }

  test("chunkByTokens: doc shorter than a window is one whole chunk") {
    import spark.implicits._
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkByTokens(docs, "doc_id", "text", 64, 48).collect()
    assert(got.length == 1 && got(0).getString(2) == "a b" && got(0).getInt(3) == 2)
  }

  // ---- vocabulary coverage ----------------------------------------------------

  test("vocabCoverage: a vocab holding every type covers everything; counts reconcile") {
    import spark.implicits._
    val docs = Seq((1L, "a b a c"), (2L, "a d")).toDF("doc_id", "text")
    // 4 types, k=10 >= all types -> full coverage, oov 0
    val full = graft.operators.Vocab.vocabCoverage(docs, "text", 10).head()
    assert(full.getLong(1) == 6L && full.getLong(2) == 6L && full.getDouble(3) == 0.0)
    // k=1 keeps only "a" (freq 3): covered 3 of 6 occurrences
    val top1 = graft.operators.Vocab.vocabCoverage(docs, "text", 1).head()
    assert(top1.getLong(2) == 3L && top1.getDouble(3) == 0.5)
  }

  test("wordpieceEncode: greedy longest match, ## continuations, [UNK] fallback") {
    import spark.implicits._
    val vocab = Seq("un", "##aff", "##able", "##ed", "aff", "hello", "##o", "hell")
    val docs = Seq((1L, "unaffable hello unz")).toDF("doc_id", "text")
    val got = graft.operators.Vocab
      .wordpieceEncode(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getString(2) -> r.getSeq[String](3).toList).toMap
    assert(got("unaffable") == List("un", "##aff", "##able"))
    assert(got("hello") == List("hello"))          // longest match beats hell+##o
    assert(got("unz") == List("[UNK]"))            // no piece for 'z' → whole-token UNK
  }

  test("wordpieceEncode round-trips: concatenated pieces rebuild every known token") {
    val docs = Tables.t(spark, sfDir, "documents").limit(50)
    val vocab = graft.operators.Vocab.topTokens(docs, "text", 40)
      .collect().map(_.getString(0)).toSeq ++
      Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m",
        "n", "o", "p", "q", "r", "s", "t", "u", "v", "w", "x", "y", "z")
        .flatMap(c => Seq(c, s"##$c"))
    val out = graft.operators.Vocab.wordpieceEncode(docs, "doc_id", "text", vocab)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val pieces = r.getSeq[String](3)
      if (pieces != Seq("[UNK]")) {
        val rebuilt = pieces.map(_.stripPrefix("##")).mkString
        assert(rebuilt == r.getString(2), s"${r.getString(2)} -> $pieces")
      }
    }
  }

  // ---- class balancing --------------------------------------------------------

  test("balanceClasses: expected per-class sizes converge to the minority class") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val before = emb.groupBy("label").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val minN = before.values.min
    val after = Sampling.balanceClasses(emb, "vec_id", "label")
      .groupBy("label").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // the minority class is kept whole (rate 1.0 exactly)
    val minority = before.minBy(_._2)._1
    assert(after(minority) == minN)
    // every class lands within ±50% of the target in expectation — loose
    // bound, deterministic because the hash is
    after.foreach { case (l, n) =>
      assert(n <= minN * 3 / 2 && n >= minN / 2, s"label $l: $n vs target $minN")
    }
  }

  // ---- dedup audit ---------------------------------------------------------

  test("dupClusterHistogram: sizes, cluster counts, and doc mass reconcile") {
    import spark.implicits._
    val df = Seq("k1", "k1", "k1", "k2", "k2", "k3").toDF("k")
    val h = Dedup.dupClusterHistogram(df, Seq("k"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(h == Map(1L -> ((1L, 1L)), 2L -> ((1L, 2L)), 3L -> ((1L, 3L))))
    // Σ n_docs must equal the input row count — nothing dropped or counted twice
    assert(h.values.map(_._2).sum == 6L)
  }

  // ---- corpus-trained bigram LM ---------------------------------------------

  test("bigramLmScore: hand-checked add-one-smoothed logprobs") {
    import spark.implicits._
    // corpus: "a b" ×2, "a c" ×1 → V=3, c(a)=3, c(ab)=2, c(ac)=1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList.sorted
    val lpAb = BigDecimal(math.log(3.0 / 6.0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lpAc = BigDecimal(math.log(2.0 / 6.0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_._1) == List(1L, 2L, 3L))
    assert(got.forall(_._2 == 1L))
    assert(math.abs(got(0)._3 - lpAb) < 1e-9 && math.abs(got(2)._3 - lpAc) < 1e-9)
  }

  test("bigramLmScore ranks a garbled doc below fluent ones") {
    import spark.implicits._
    val fluent = (1 to 20).map(i => (i.toLong, "the quick brown fox jumps over the lazy dog"))
    val garbled = Seq((100L, "zxq wvu tsr qpo nml kji")) // unseen-everywhere bigrams
    val docs = (fluent ++ garbled).toDF("doc_id", "text")
    val scores = TextAnalysis.bigramLmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(100L) < scores(1L))
  }

  // ---- CCNet-style quality-band sampling -------------------------------------

  test("qualityBandSample: banding boundaries and per-band rate semantics") {
    import spark.implicits._
    val scored = Seq(
      (1L, -3.0),   // head (>= -3.39)
      (2L, -3.39),  // head (boundary inclusive)
      (3L, -3.40),  // middle
      (4L, -3.42),  // middle (boundary inclusive)
      (5L, -9.0)    // tail
    ).toDF("doc", "score")
    val all = Sampling.qualityBandSample(scored, "doc", "score",
      headCut = -3.39, tailCut = -3.42,
      rates = Map("head" -> 1.0, "middle" -> 1.0, "tail" -> 1.0))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(all == Map(1L -> "head", 2L -> "head", 3L -> "middle",
      4L -> "middle", 5L -> "tail"))
    // rate 0 on a band removes exactly that band; rate 1 bands survive whole
    val noTail = Sampling.qualityBandSample(scored, "doc", "score",
      -3.39, -3.42, Map("head" -> 1.0, "middle" -> 1.0, "tail" -> 0.0))
      .collect().map(_.getLong(0)).toSet
    assert(noTail == Set(1L, 2L, 3L, 4L))
  }

  test("qualityBandSample kept set is monotone in the band rate") {
    val docs = Tables.t(spark, sfDir, "documents")
    val scored = TextAnalysis.bigramLmScore(docs, "doc_id", "text")
    def kept(mid: Double): Set[Long] =
      Sampling.qualityBandSample(scored, "doc", "avg_logprob",
        -3.39, -3.42, Map("head" -> 1.0, "middle" -> mid, "tail" -> 0.1))
        .collect().map(_.getLong(0)).toSet
    val k25 = kept(0.25); val k75 = kept(0.75)
    assert(k25.subsetOf(k75), "raising a band rate must only ADD documents")
  }

  // ---- shard manifest ---------------------------------------------------------

  test("shardManifest: every row lands in exactly one shard, totals reconcile") {
    val docs = Tables.t(spark, sfDir, "documents")
    val m = Sampling.shardManifest(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), 16).collect()
    assert(m.map(_.getInt(0)).toSet.subsetOf((0 until 16).toSet))
    assert(m.map(_.getLong(1)).sum == docs.count())
    val idSum = docs.agg(sum("doc_id")).head().getLong(0)
    assert(m.map(_.getLong(3)).sum == idSum, "id checksums must partition the corpus")
  }

  test("shardOf is stable across partitionings") {
    val docs = Tables.t(spark, sfDir, "documents")
    def assign(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), Sampling.shardOf(col("doc_id"), 16).as("s"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assign(docs) == assign(docs.repartition(7)))
  }

  // ---- ANN recall ------------------------------------------------------------

  test("recallEval: IVF nprobe=3 recall vs brute force is in (0, 1]") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val exact = Ann.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
    val approx = Ann.ivfTopK(emb, q, "vec_id", "embedding", 5, 8, 3)
    val r = Ann.recallEval(exact, approx, 5).collect()
    assert(r.length == 10) // every query scored, even at zero hits
    assert(r.forall(x => x.getDouble(2) >= 0.0 && x.getDouble(2) <= 1.0))
    // probing 3/8 lists must find SOMETHING across 10 queries
    assert(r.map(_.getLong(1)).sum > 0)
  }

  test("lshNumPlanes keeps expected bucket occupancy constant as n grows") {
    // occupancy = n / 2^planes stays within [target/2, target] for any n
    for (n <- Seq(1000L, 100000L, 10000000L, 1000000000L)) {
      val p = Ann.lshNumPlanes(n, 64L)
      val occupancy = n.toDouble / math.pow(2, p)
      assert(occupancy <= 64.0 && occupancy > 16.0, s"n=$n planes=$p occ=$occupancy")
    }
    assert(Ann.lshNumPlanes(1L) == 1)   // degenerate corpora stay sane
    assert(Ann.lshNumPlanes(Long.MaxValue) == 30)
  }

  test("knnJoinAuto runs with corpus-sized planes and bounded output") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val n = emb.count()
    val out = Ann.knnJoinAuto(emb, "vec_id", "embedding", k = 3)
    assert(out.count() <= n * 3)
    assert(out.groupBy("query_id").count().agg(max("count")).head().getLong(0) <= 3)
  }

  test("recallEval scores an empty approximate set as 0, not absent") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 3)
    val exact = Ann.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
    val r = Ann.recallEval(exact, exact.filter(lit(false)), 5).collect()
    assert(r.length == 3 && r.forall(_.getLong(1) == 0L))
    assert(r.forall(_.getDouble(2) == 0.0))
  }
}
