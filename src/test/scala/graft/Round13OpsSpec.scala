package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Dedup
import graft.functions.RollingHash

/** Round-13 first-session specs: ADVICE r12 regressions — the gear-hash
  * Long overflow at window=8 and the prebuilt near-dup index's
  * build/probe parameter contract.
  */
class Round13OpsSpec extends SparkSpec {

  test("gearExpr: window=8 matches exact BigInt arithmetic (no Long overflow)") {
    import spark.implicits._
    val M = RollingHash.Mod
    // h values pinned near Mod so h*31^7 exceeds Long.MaxValue — the
    // regression this guards: the unreduced coefficient wrapped silently
    val hs = Seq(M - 1, M - 2, 987654321L, M - 17, 5L, M - 1, 31L, M - 3,
      123456789L, M - 999)
    val df = hs.zipWithIndex
      .map { case (h, p) => (1L, p.toLong, h) }.toDF("doc", "p", "h")
    val byPos = Window.partitionBy("doc").orderBy("p")
    val got = df.withColumn("g", Dedup.gearExpr(8, byPos))
      .orderBy("p").select("g").as[Long].collect()
    val expected = hs.indices.map { p =>
      (0 until 8).map { k =>
        val h = if (p - k >= 0) BigInt(hs(p - k)) else BigInt(0)
        h * BigInt(31).pow(k)
      }.sum.mod(BigInt(M)).toLong
    }
    assert(got.toSeq === expected, "gear at window=8 must be exact mod-p")
    // and windows 1-7 stay bit-identical to the pre-fix unreduced formula
    (1 to 7).foreach { w =>
      val reduced = df.withColumn("g", Dedup.gearExpr(w, byPos))
        .orderBy("p").select("g").as[Long].collect().toSeq
      val unreduced = df.withColumn("g",
          (0 until w).map { k =>
            val term = if (k == 0) col("h") else lag(col("h"), k, 0L).over(byPos)
            term * math.pow(31, k).toLong
          }.reduce(_ + _) % lit(M))
        .orderBy("p").select("g").as[Long].collect().toSeq
      assert(reduced === unreduced, s"window=$w must be unchanged by the fix")
    }
  }

  test("cdcChunkDedup: window=8 runs and keeps the shift-robustness property") {
    import spark.implicits._
    val base = (1 to 400).map(i => s"tok$i").mkString(" ")
    val shifted = "inserted " + base
    val docs = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val out = Dedup.cdcChunkDedup(docs, "doc_id", "text",
        window = 8, maskBits = 3)
      .orderBy("doc").collect()
    assert(out.length === 2)
    val (n2, k2) = (out(1).getLong(1), out(1).getLong(2))
    // doc 2 is doc 1 with one token prepended: content-defined boundaries
    // re-sync after the edit, so most of doc 2's chunks dedup away
    assert(n2 > 4, s"expected many chunks, got $n2")
    assert(k2 < n2 / 2, s"shift-robust dedup should drop most chunks: kept $k2 of $n2")
  }

  test("graphSearch: beam covering the whole connected graph ≡ brute force") {
    import spark.implicits._
    import graft.operators.Ann
    // 24 deterministic 8-dim vectors; graph = ring lattice (i -> i±1, i±2)
    // is strongly connected with diameter 6, so beam=n and hops=12 visit
    // every node: the beam search must return EXACTLY the brute-force
    // top-k — the identity the ann_graph_search oracle row leans on.
    val n = 24
    val vecs = (0 until n).map { i =>
      (i.toLong, (0 until 8).map(d =>
        math.sin(i * 2.394 + d * 0.71) + math.cos(i * d * 0.13)).toArray)
    }.toDF("vec_id", "embedding")
    val ring = (0 until n).flatMap { i =>
      Seq(1, 2, n - 1, n - 2).map(j => (i.toLong, ((i + j) % n).toLong))
    }.toDF("src", "dst")
    val queries = vecs.filter(col("vec_id") < 5)
    val got = Ann.graphSearch(ring, vecs, queries, "vec_id", "embedding",
        entryIds = Seq(0L), beamWidth = n, hops = 12, topK = 5)
      .orderBy("query_id", "rank").collect()
    val exact = Ann.bruteForceTopK(vecs, queries, "vec_id", "embedding", 5)
      .orderBy("query_id", "rank").collect()
    assert(got.length === exact.length)
    got.zip(exact).foreach { case (g, e) =>
      assert(g.getLong(0) === e.getLong(0))
      assert(g.getInt(1) === e.getInt(1))
      assert(g.getLong(2) === e.getLong(2), s"query ${g.getLong(0)} rank ${g.getInt(1)}")
      assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-9)
    }
  }

  test("graphSearch: narrow beam on an nnDescent graph reaches high recall") {
    import graft.operators.Ann
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    // deployment shape: random-init NN-descent (ring init never converges
    // past ring-distance k·2^iters), symmetrized links, multi-entry walk
    val graph = Ann.serveGraph(Ann.nnDescent(emb, "vec_id", "embedding",
      k = 12, iters = 5, randomInit = true))
    val queries = emb.filter(col("vec_id") < 10)
    val approx = Ann.graphSearch(graph, emb, queries, "vec_id", "embedding",
      entryIds = Ann.spreadEntries(emb.count()), beamWidth = 64, hops = 4,
      topK = 5)
    val exact = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
    val recall = Ann.recallEval(exact, approx, 5)
      .agg(avg("recall")).head.getDouble(0)
    assert(recall >= 0.9, s"graph-walk recall@5 too low: $recall")
  }

  test("gpt2PreTokens: contraction/space/tab/trailing behavior and exact partition") {
    import spark.implicits._
    import graft.operators.Vocab
    val cases = Seq(
      "It's fine" -> Seq("It", "'s", " fine"),
      "don't stop" -> Seq("don", "'t", " stop"),
      "a   b" -> Seq("a", "  ", " b"),     // interior run: all-but-last + attached
      "x\tb" -> Seq("x", "\t", "b"),        // tab never attaches
      // mixed runs: the lookahead cuts the run ONE char before \S; a
      // non-space last char stands alone, never merged into the prefix
      "x \tb" -> Seq("x", " ", "\t", "b"),
      "a \t b" -> Seq("a", " \t", " b"),
      "x\t\tb" -> Seq("x", "\t", "\t", "b"),
      "hi!" -> Seq("hi", "!"),
      "ab12cd" -> Seq("ab", "12", "cd"),
      "tail  " -> Seq("tail", "  "),        // trailing run stays whole
      "Hello,world" -> Seq("Hello", ",", "world"),
      " lead" -> Seq(" lead"))
    val got = cases.map(_._1).toDF("text")
      .select(Vocab.gpt2PreTokens(col("text"))).as[Seq[String]].collect()
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g === want, s"pretok of '$in'")
      assert(g.mkString === in, s"exact partition of '$in'")
    }
  }

  test("bbpeTrainPretok: merge table differs from whitespace-split bbpe on contractions") {
    import spark.implicits._
    import graft.operators.Vocab
    // whitespace tokens keep "it's" whole, so (t,')-adjacent merges can
    // cross the apostrophe; the pre-tokenizer splits it / 's first
    val docs = Seq.fill(30)("it's it's don't").zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
    def table(df: org.apache.spark.sql.DataFrame) = df.orderBy("merge_rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val ws = table(Vocab.bbpeTrain(docs, "text", 8))
    val pt = table(Vocab.bbpeTrainPretok(docs, "text", 8))
    assert(ws !== pt, "pre-tokenization must change the learned merges")
    // the whitespace path learns a merge whose merged symbol spans the
    // apostrophe (byte of ' = 0x27 inside a merged piece with letters);
    // the pretok path must never produce one, since ' starts its own unit
    val apos = Vocab.byteMapString("'").head
    def crossesApos(t: Seq[(String, String)]) = t.exists { case (l, r) =>
      val m = l + r
      m.length > 1 && m.indexOf(apos.toInt) > 0
    }
    assert(crossesApos(ws), "fixture must make ws-path merge across '")
    assert(!crossesApos(pt), "pretok path merged across the apostrophe")
  }

  test("mp3Audit: status fan-out distinct, CBR arithmetic exact, ID3+VBR walks") {
    import spark.implicits._
    import graft.operators.Multimodal
    // doc 7: CBR, sr_idx 1 (48000 Hz), 12 frames, bitrate idx 1+7%14=8
    // (112 kbps) -> duration 12*1152*1000/48000 = 288 ms
    val specs = Seq(
      Multimodal.Mp3Spec(7L, 1, 12, 0),   // ok CBR
      Multimodal.Mp3Spec(8L, 0, 6, 1),    // ok ID3v2 + VBR
      Multimodal.Mp3Spec(9L, 2, 5, 3),    // truncated mid-frame
      Multimodal.Mp3Spec(10L, 0, 5, 4)    // forbidden bitrate index 15
    ).toDS()
    val bin = Multimodal.synthesizeMp3(spark, specs)
      .unionByName(Seq((11L, "not audio".getBytes)).toDF("doc_id", "payload"))
    val out = Multimodal.mp3Audit(spark, bin).collect()
      .map(m => m.doc_id -> m).toMap
    assert(out(7L).status === "ok" && out(7L).n_frames === 12 &&
      out(7L).sample_rate === 48000 && out(7L).bitrate_kbps === 112 &&
      out(7L).duration_ms === 288L)
    assert(out(8L).status === "ok" && out(8L).n_frames === 6 &&
      out(8L).sample_rate === 44100)
    // VBR mean: frames j=0..5 use idx 1+(8+j)%14 = 9,10,11,12,13,14
    // -> kbps 128,160,192,224,256,320; mean = 1280/6 = 213
    assert(out(8L).bitrate_kbps === 213)
    assert(out(9L).status === "corrupt" && out(9L).err === Some("truncated"))
    assert(out(10L).status === "corrupt" && out(10L).err === Some("bad_header"))
    assert(out(11L).status === "unsupported")
    assert(out.values.map(_.status).toSet === Set("ok", "corrupt", "unsupported"))
  }

  test("ivfPqCodeProjection ≡ ivfPqAppend rows (absolute and residual coding)") {
    import graft.operators.Ann
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
    for (residual <- Seq(false, true)) {
      val index = Ann.ivfPqBuild(corpus, "vec_id", "embedding",
        nLists = 8, m = 8, k = 16, byResidual = residual)
      // join-based formulation: the appended rows are the delta vs corpus
      val appended = Ann.ivfPqAppend(index, batch, "vec_id", "embedding")
        .encoded.join(index.encoded.select("id"), Seq("id"), "left_anti")
      val projected = Ann.ivfPqCodeProjection(index, batch,
        "vec_id", "embedding")
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select(col("id"), col("codes").cast("array<int>"), col("centroid"))
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2)))
        .sortBy(_._1).toSeq
      assert(rows(projected) === rows(appended),
        s"residual=$residual: projection must be bit-identical to append")
      // stream-safety in plan terms: no join, no aggregation anywhere
      val plan = projected.queryExecution.optimizedPlan.toString
      assert(!plan.contains("Join") && !plan.contains("Aggregate"),
        s"projection must stay join/agg-free, got:\n$plan")
    }
  }

  test("aacAudit: explicit frame-length walk, profile/channel decode, fan-out") {
    import spark.implicits._
    import graft.operators.Multimodal
    // doc 5: sr_idx 4 (44100), profile 1 (lc), 2 channels, 10 frames
    // -> duration 10*1024*1000/44100 = 232 ms
    val specs = Seq(
      Multimodal.AacSpec(5L, 4, 1, 2, 10, 0),
      Multimodal.AacSpec(6L, 0, 3, 1, 3, 3),   // truncated
      Multimodal.AacSpec(7L, 2, 0, 6, 4, 4)    // reserved sr idx 15
    ).toDS()
    val bin = Multimodal.synthesizeAac(spark, specs)
      .unionByName(Seq((8L, "plain text".getBytes)).toDF("doc_id", "payload"))
    val out = Multimodal.aacAudit(spark, bin).collect()
      .map(m => m.doc_id -> m).toMap
    assert(out(5L).status === "ok" && out(5L).n_frames === 10 &&
      out(5L).sample_rate === 44100 && out(5L).profile === "lc" &&
      out(5L).channels === 2 && out(5L).duration_ms === 232L)
    assert(out(6L).status === "corrupt" && out(6L).err === Some("truncated"))
    assert(out(7L).status === "corrupt" && out(7L).err === Some("bad_header"))
    assert(out(8L).status === "unsupported")
  }

  test("dsirLogWeights: target-language docs are up-weighted; resample prefers them") {
    import graft.operators.Sampling
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val target = docs.filter(col("lang") === "en")
    val w = Sampling.dsirLogWeights(docs, target, "doc_id", "text", 512)
      .join(docs.select(col("doc_id").as("doc"), col("lang")), "doc")
    val byLang = w.groupBy(col("lang") === "en")
      .agg(avg(col("logw_micro")).as("m")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byLang(true) > byLang(false) + 1e6,
      s"English docs must score >=1 nat higher on average: $byLang")
    // resample: the selected set should be mostly the target language
    val sel = Sampling.dsirResample(docs, target, "doc_id", "text",
        k = 50, buckets = 512)
      .join(docs.select(col("doc_id").as("doc"), col("lang")), "doc")
    val enFrac = sel.filter(col("lang") === "en").count() / 50.0
    val baseFrac = docs.filter(col("lang") === "en").count().toDouble /
      docs.count()
    assert(enFrac > baseFrac + 0.2,
      s"resample must concentrate the target: $enFrac vs base $baseFrac")
    // plan lock: ratio table broadcasts; no cartesian beyond the 1-row
    // scalar attach; top-k is the bounded aggregate
    val rs = Sampling.dsirResample(docs, target, "doc_id", "text", 50, 512)
    rs.count()
    val plan = rs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("topk_by_long_score"),
      "global top-k must be bounded AND integer-keyed")
  }

  test("incrementalNearDupServeChecked: parameter mismatch fails loudly") {
    import spark.implicits._
    val corpus = Seq((100L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val batch = Seq((1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different content about spark catalyst planning"))
      .toDF("doc_id", "text")
    val bands = Dedup.nearDupBandTable(corpus, "doc_id", "text", 3, 32, 4)
    val sh = Dedup.shingleIndex(corpus, "doc_id", "text", 3)
    val meta = Dedup.nearDupIndexMeta(spark, 3, 32, 4)
    // matching params: the exact-dup batch row is gated out
    val kept = Dedup.incrementalNearDupServeChecked(batch, bands, sh, meta,
      "doc_id", "text", 3, 32, 4, 0.8).select("doc_id").as[Long].collect()
    assert(kept.toSeq === Seq(2L))
    // mismatched numHashes: must throw, not silently pass everything
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalNearDupServeChecked(batch, bands, sh, meta,
        "doc_id", "text", 3, 8, 4, 0.8)
    }
    assert(e.getMessage.contains("built with"))
  }
}
