package graft

import org.apache.spark.sql.functions._
import graft.operators.DataQuality

/** Round-12 first-session specs: ADVICE r11 regressions — sparse-calendar
  * day-over-day carry and the orphanCount NULL-FK contract.
  */
class Round12OpsSpec extends SparkSpec {

  test("ts_dod_change: carry is transitive across wholly-empty 31-day buckets") {
    import spark.implicits._
    // days 0,1 land in bucket 0; day 70 lands in bucket 2; bucket 1 (days
    // 31-61) is WHOLLY EMPTY. A global lag still pairs day 70 with day 1 —
    // the month-bucketed emulation must carry across the empty bucket.
    val tmp = java.nio.file.Files.createTempDirectory("dod").toString
    Seq(
      (1L, 0L * 86400 + 10, 1L, "a", 10.0, "{}"),
      (2L, 1L * 86400 + 10, 1L, "a", 20.0, "{}"),
      (3L, 70L * 86400 + 10, 1L, "a", 50.0, "{}"))
      .toDF("event_id", "epoch", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("epoch"))).drop("epoch")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = SparkEntry.queries("ts_dod_change")(spark, tmp)
      .orderBy("day").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(0L, 1L, 70L))
    assert(out(0).isNullAt(2), "first day has no prior")
    assert(out(1).getLong(2) === 1000000L, "10->20 = +100% = 1e6 ppm")
    // day 70: prev must be day 1's 2000 cents (carried across empty
    // bucket 1), NOT null: (5000-2000)*1e6 div 2000 = 1_500_000
    assert(!out(2).isNullAt(2), "carry must cross the empty bucket")
    assert(out(2).getLong(2) === 1500000L)
  }

  test("byteMapString/byteUnmapString: identity on multi-byte UTF-8") {
    import graft.operators.Vocab
    val fixtures = Seq("hello", "héllo", "你好世界", "мир", "😀🚀",
      "mixed héllo你好😀 end", "", "ß déjà", "á") // combining accent
    fixtures.foreach { s =>
      val m = Vocab.byteMapString(s)
      // every mapped char is a byte symbol; length = UTF-8 byte count
      assert(m.codePoints().toArray.forall(cp =>
        cp >= Vocab.ByteCpBase && cp < Vocab.ByteCpBase + 256))
      assert(m.codePoints().count() ===
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong)
      assert(Vocab.byteUnmapString(m) === s, s"roundtrip of '$s'")
    }
    // mapped alphabet is whitespace-free and case-free (the invariants
    // the trainer's internal re-tokenization relies on)
    val all = (0 until 256).map(b =>
      new String(Character.toChars(Vocab.ByteCpBase + b))).mkString
    assert(all.toLowerCase === all)
    assert(!all.exists(_.isWhitespace))
  }

  test("bbpeTrain: first merge on multi-byte text is a WITHIN-char byte pair") {
    import spark.implicits._
    import graft.operators.Vocab
    // 'é' is 2 UTF-8 bytes; char-level BPE would first merge (é,é) —
    // byte-level must first merge é's two bytes.
    val docs = Seq("éé éé éé", "éé x").toDF("text")
    val m = Vocab.bbpeTrain(docs, "text", 1).collect()(0)
    assert(Vocab.byteUnmapString(m.getString(3)) === "é",
      "first merged symbol must decode to the single char é")
  }

  test("bbpeEncode: pieces concatenate to mapped; unmap recovers the token") {
    import spark.implicits._
    import graft.operators.Vocab
    val docs = Seq((1L, "héllo 你好 😀😀 héllo"), (2L, "наïve 😀")).toDF("doc_id", "text")
    val merges = Vocab.bbpeTrain(docs, "text", 6)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val out = Vocab.bbpeEncode(docs, "doc_id", "text", merges).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val pieces = r.getSeq[String](4)
      assert(pieces.mkString === r.getString(3), "concat(pieces) == mapped")
      assert(Vocab.byteUnmapString(pieces.mkString) === r.getString(2),
        "unmap(concat(pieces)) == token")
    }
  }

  test("bbpeEncode: ranked tier (>64 merges) equals the inline tier") {
    import spark.implicits._
    import graft.operators.Vocab
    val docs = Seq((1L, "héllo héllo 你好 😀 abab abab"), (2L, "ß abab")).toDF("doc_id", "text")
    val real = Vocab.bbpeTrain(docs, "text", 10)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // pad past MaxInlineMerges with merges over symbols outside the byte
    // alphabet — they can never fire, so semantics are unchanged but the
    // dispatch provably takes the broadcast-ranked mapPartitions tier
    val pad = (0 until Vocab.MaxInlineMerges + 10).map(i => (s"Ω$i", s"Ψ$i"))
    val inline = Vocab.bbpeEncode(docs, "doc_id", "text", real)
      .orderBy("doc", "token_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(3),
        r.getSeq[String](4).mkString(" ")))
    val ranked = Vocab.bbpeEncode(docs, "doc_id", "text", real ++ pad)
      .orderBy("doc", "token_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(3),
        r.getSeq[String](4).mkString(" ")))
    assert(ranked.toSeq === inline.toSeq)
  }

  test("skipgramPairs: partitioning-invariant and window-correct") {
    import spark.implicits._
    import graft.operators.SkipGram
    // rare words (every count is 1-2 of a tiny corpus) → keep prob 1 →
    // deterministic full stream; window 2 pairs are checkable by hand
    val docs = Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      SkipGram.skipgramPairs(df, "doc_id", "text", window = 2)
        .orderBy("center", "context")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val base = run(docs)
    assert(run(docs.repartition(7)) === base, "partitioning must not change pairs")
    assert(run(docs.repartition(1)) === base)
    // doc 1: a->(b,c) b->(a,c,d) c->(a,b,d) d->(b,c); doc 2: x<->y
    val m = base.map { case (c, x, n) => (c, x) -> n }.toMap
    assert(m(("a", "b")) === 1L && m(("a", "c")) === 1L && !m.contains(("a", "d")))
    assert(m(("b", "d")) === 1L && m(("x", "y")) === 1L && m(("y", "x")) === 1L)
    assert(base.map(_._3).sum === (2 + 3 + 3 + 2 + 1 + 1).toLong)
  }

  test("negativeTable: slots proportional to cnt^0.75, integer-exact") {
    import spark.implicits._
    import graft.operators.SkipGram
    // one doc repeating words: aa ×16, bb ×8 (both ≥ min_count 5; 'cc' ×1 filtered)
    val text = (Seq.fill(16)("aa") ++ Seq.fill(8)("bb") ++ Seq("cc")).mkString(" ")
    val out = SkipGram.negativeTable(Seq(text).toDF("text"), "text", minCount = 5L)
      .orderBy("token").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("aa", "bb"))
    val wa = math.floor(math.sqrt(math.sqrt(16.0 * 16 * 16)) * 1000).toLong
    val wb = math.floor(math.sqrt(math.sqrt(8.0 * 8 * 8)) * 1000).toLong
    assert(out(0).getLong(2) === wa * 1000000L / (wa + wb))
    assert(out(1).getLong(2) === wb * 1000000L / (wa + wb))
  }

  test("resizeExec JPEG tier: real decode, geometry exact, quarantine fan-out") {
    import spark.implicits._
    import graft.operators.Multimodal
    val specs = Seq(
      Multimodal.PatternImageFmtSpec(1L, 40, 30, 77, "jpg"),
      Multimodal.PatternImageFmtSpec(2L, 20, 16, 10, "jpg"), // smaller than target
      Multimodal.PatternImageFmtSpec(3L, 40, 30, 77, "jpg"), // → truncated
      Multimodal.PatternImageFmtSpec(4L, 40, 30, 77, "jpg")  // → replaced by text
    ).toDS()
    val bin = Multimodal.synthesizePatternImagesFmt(spark, specs)
      .select(col("doc_id"),
        when(col("doc_id") === 3, col("payload").substr(1, 24))
          .when(col("doc_id") === 4, lit("not an image").cast("binary"))
          .otherwise(col("payload")).as("payload"))
    val out = Multimodal.resizeExec(spark, bin, 32, 24)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(1L).status === "ok" && out(1L).in_w === 40 && out(1L).in_h === 30)
    assert(out(1L).out_w === 32 && out(1L).out_h === 24, "40x30 fits to 32x24")
    assert(out(2L).status === "ok" && out(2L).out_w === 20 && out(2L).out_h === 16,
      "no upscale past 1.0")
    assert(out(3L).status === "corrupt" && out(3L).err === Some("decode_failed"),
      "truncated JPEG quarantines, not task failure")
    assert(out(4L).status === "unsupported")
  }

  test("streaming near-dup ≡ batch replica on a common in-order corpus") {
    import spark.implicits._
    import graft.streaming.StreamingCuration
    val t0 = 1700000000L
    val bases = Seq(
      "the quick brown fox jumps over a lazy dog while the bright sun sets " +
        "behind tall green hills and children play near the quiet river bank",
      "deep space telescopes measure distant galaxy clusters through gravity " +
        "lensing surveys that map invisible dark matter structure every night",
      "market analysts tracked quarterly revenue growth across industrial " +
        "sectors while commodity prices shifted under new trade agreements",
      "volcanic soil in the valley produces remarkable coffee beans that " +
        "roasters around the world compete to buy during harvest season")
    val docs: Seq[(Long, String)] =
      bases.zipWithIndex.map { case (b, i) => (i.toLong, b) } ++
        // lightly-edited re-drops (may or may not band-collide — the proof
        // holds either way because BOTH sides apply the same rule)
        bases.zipWithIndex.map { case (b, i) =>
          (10L + i, b.replace("the", "a").replace("while", "as"))
        } ++
        bases.zipWithIndex.map { case (b, i) => (20L + i, b) } ++ // exact re-drops
        Seq((30L, "short doc"), (31L, "tiny"), (32L, ""))
    def line(id: Long, text: String): String =
      s"""{"doc_id":$id,"text":"$text","lang":"en","source":"s1","ingest_ts":${t0 + id}}"""

    val staging = java.nio.file.Files.createTempDirectory("neardup-eq").toString
    val (first, second) = docs.sortBy(_._1).splitAt(docs.size / 2)
    java.nio.file.Files.write(java.nio.file.Paths.get(staging, "b1.json"),
      first.map((line _).tupled).mkString("\n").getBytes)
    val q = StreamingCuration.nearDupDocumentStream(spark, staging,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("neardup_eq")
      .outputMode("append").start()
    q.processAllAvailable()
    java.nio.file.Files.write(java.nio.file.Paths.get(staging, "b2.json"),
      second.map((line _).tupled).mkString("\n").getBytes)
    q.processAllAvailable()
    java.nio.file.Files.write(java.nio.file.Paths.get(staging, "b3.json"),
      line(9999L, "late watermark flusher row").getBytes)
    q.processAllAvailable()
    q.processAllAvailable()
    val streamKept = spark.table("neardup_eq").select("doc_id")
      .as[Long].collect().toSet - 9999L
    q.stop()

    val batchKept = StreamingCuration.nearDupBatchReplica(
        docs.toDF("doc_id", "text").withColumn("__et", col("doc_id")), "__et")
      .as[Long].collect().toSet
    assert(streamKept === batchKept,
      s"stream=${streamKept.toSeq.sorted} batch=${batchKept.toSeq.sorted}")
    // sanity: exact re-drops (20..23) must be dropped by both
    assert((20L to 23L).forall(!batchKept.contains(_)))
    // short docs collide with nothing
    assert(Seq(30L, 31L, 32L).forall(batchKept.contains))
  }

  test("connectedComponents: hub-and-chains skew graph, forced loop path") {
    import graft.operators.IdentityResolution
    // power-law-shaped adversarial fixture: hub 0 with degree 40 (≈√n for
    // n=2000), each spoke heading a 50-node chain — ONE giant component.
    // smallGraphMaxEdges=0 forces the distributed min-label loop (the
    // 100 TB path) instead of the driver union-find fast path.
    val spokes = 40
    val chainLen = 50
    val n = spokes.toLong * chainLen
    val hub = spark.range(spokes)
      .select(lit(0L).as("src"), (col("id") * chainLen + 1).as("dst"))
    val chains = spark.range(1L, n)
      .filter(col("id") % chainLen =!= 0)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    var rounds = 0
    val labels = IdentityResolution.connectedComponents(
      hub.unionByName(chains), maxIter = 25, smallGraphMaxEdges = 0L,
      onRound = i => rounds = i)
    assert(labels.count() === n + 1)
    assert(labels.filter(col("component") =!= 0L).count() === 0L,
      "every node must join the hub's giant component")
    // pointer jumping: O(log chainLen) rounds, nowhere near O(chainLen)
    assert(rounds <= 12, s"expected ≈log2(50)+slack rounds, got $rounds")
  }

  test("gloveCooccurrence: 1/d ppm weights, exact integer sums") {
    import spark.implicits._
    import graft.operators.SkipGram
    val docs = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val m = SkipGram.gloveCooccurrence(docs, "doc_id", "text", window = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // a@0 with b@1 (d=1) and a@3 with b@1 (d=2): cnt 2, w = 1e6 + 5e5
    assert(m(("a", "b")) === (2L, 1500000L))
    // a@0..c@2 (d=2) + a@3..c@2 (d=1)
    assert(m(("a", "c")) === (2L, 1500000L))
    // a@0..a@3 (d=3) both directions
    assert(m(("a", "a")) === (2L, 666666L))
    assert(m(("b", "c")) === (1L, 1000000L))
  }

  test("subwordNgrams: boundary-marked grams, multiset counts, stable buckets") {
    import spark.implicits._
    import graft.operators.SkipGram
    val docs = Seq("ab aaaa").toDF("text")
    val rows = SkipGram.subwordNgrams(docs, "text", minN = 3, maxN = 6,
      buckets = 2000).collect()
    val byTok = rows.groupBy(_.getString(0))
    // '<ab>' → 3-grams <ab, ab> + 4-gram <ab>
    assert(byTok("ab").map(_.getString(1)).sorted.toSeq === Seq("<ab", "<ab>", "ab>"))
    // '<aaaa>': 'aaa' occurs twice → one row with cnt 2
    val aaa = byTok("aaaa").find(_.getString(1) == "aaa").get
    assert(aaa.getLong(3) === 2L)
    // buckets in range and deterministic for a given gram
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 2000))
    val b1 = rows.filter(_.getString(1) == "<ab").map(_.getLong(2)).distinct
    assert(b1.length === 1)
  }

  test("nnDescent: recall improves over ring init and is partition-invariant") {
    import spark.implicits._
    import graft.operators.Ann
    // deterministic pseudo-random vectors (id order uncorrelated with
    // vector space, so the ring init starts blind)
    val emb = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(6)(d =>
        (((i * 31 + d * 17 + i * i * 7) % 19) - 9).toDouble))
    }.toDF("vec_id", "embedding")
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val truth = Ann.bruteForceTopK(emb, emb, "vec_id", "embedding", 4)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = df.select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (truth & got).size.toDouble / truth.size
    }
    // ring-init recall = fraction of true neighbors within ±4 ring hops
    val ringRecall = {
      val truth = Ann.bruteForceTopK(emb, emb, "vec_id", "embedding", 4)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      truth.count { case (q, nb) =>
        (1 to 4).exists(j => (q + j) % 60 == nb) }.toDouble / truth.length
    }
    val r2 = recallOf(Ann.nnDescent(emb, "vec_id", "embedding", k = 4, iters = 4))
    assert(r2 > ringRecall + 0.2,
      s"descent recall $r2 must clearly beat the ring init's $ringRecall")
    assert(r2 >= 0.7, s"descent recall $r2 must approach exact")
    // partition-invariance: same graph regardless of input layout
    val a = Ann.nnDescent(emb.repartition(7), "vec_id", "embedding", 4, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = Ann.nnDescent(emb.repartition(1), "vec_id", "embedding", 4, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("huffmanCodes: prefix-free, Kraft-complete, optimal on a known fixture") {
    import spark.implicits._
    import graft.operators.SkipGram
    // counts a:8 b:4 c:2 d:1 e:1 → classic depths 1,2,3,4,4
    val text = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c") ++
      Seq("d", "e")).mkString(" ")
    val out = SkipGram.huffmanCodes(Seq(text).toDF("text"), "text", minCount = 1L)
      .collect().map(r => r.getString(0) -> (r.getString(2), r.getInt(3))).toMap
    assert(out("a")._2 === 1 && out("b")._2 === 2 && out("c")._2 === 3)
    assert(out("d")._2 === 4 && out("e")._2 === 4)
    val codes = out.values.map(_._1).toSeq
    // prefix-free
    assert(!codes.exists(c1 => codes.exists(c2 => c2 != c1 && c2.startsWith(c1))))
    // Kraft equality (complete binary tree): Σ 2^-len = 1
    assert(codes.map(c => math.pow(2, -c.length)).sum === 1.0)
  }

  test("logHistogram: partitioning-invariant, bounded rel-error, SQL-registered") {
    import spark.implicits._
    import graft.functions.{Fns, LogHistogram}
    val vals = (1 to 5000).map(i => ((i * 2654435761L) % 1000000L).max(1L))
    val df = vals.toDF("v")
    def sketch(d: org.apache.spark.sql.DataFrame) =
      d.agg(Fns.logHistogram(col("v"), 4).as("h"))
        .select(explode(col("h")).as("e"))
        .select(col("e.b"), col("e.n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sketch(df.repartition(13)) === sketch(df.repartition(1)),
      "bucket sums are order- and partitioning-independent")
    // read-off p50 within 2^-4 relative error of the exact median
    val buckets = sketch(df)
    val n = vals.size
    val rank = (50 * n + 99) / 100
    var cum = 0L
    val b = buckets.iterator.takeWhile { _ => cum < rank }
      .map { case (bb, nn) => cum += nn; bb }.toSeq.last
    val est = LogHistogram.lowerBound(b, 4).toDouble
    val exact = vals.sorted.apply(rank - 1).toDouble
    assert(math.abs(est - exact) / exact <= 1.0 / 16 + 0.01,
      s"est $est vs exact $exact exceeds the 2^-subBits bound")
    // negatives land in the -1 error channel; SQL surface registered
    val neg = Seq(-5L, 3L).toDF("v")
      .agg(Fns.logHistogram(col("v"), 4).as("h"))
      .select(explode(col("h")).as("e")).select("e.b")
      .collect().map(_.getLong(0)).toSet
    assert(neg === Set(-1L, 3L))
    neg.foreach(_ => ())
    val viaSql = {
      Seq(1L, 2L, 100L).toDF("v").createOrReplaceTempView("lh_in")
      spark.sql("SELECT log_histogram(v, 4) AS h FROM lh_in")
        .select(size(col("h"))).collect()(0).getInt(0)
    }
    assert(viaSql === 3)
  }

  test("band buckets: stream HOF construction == relational construction") {
    import spark.implicits._
    import graft.streaming.StreamingCuration
    val docs = Seq(
      (1L, "alpha beta gamma delta alpha beta gamma"), // duplicate shingles
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "tiny"), (4L, ""), // short docs → unique buckets
      (5L, "completely different words here now")).toDF("doc_id", "text")
    val viaStreamExpr = StreamingCuration
      .withBandBuckets(docs, 3, 8, 2)
      .select("doc_id", "bucket")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaRelational = StreamingCuration
      .bandBucketsRelational(docs, 3, 8, 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaStreamExpr === viaRelational)
  }

  test("cdcChunkDedup: shift-robust — a one-token insertion still dedups the tail") {
    import spark.implicits._
    import graft.operators.Dedup
    val body = (1 to 120).map(i => s"w${(i * 37) % 61}").mkString(" ")
    val docs = Seq((1L, body), (2L, "INSERTED " + body)).toDF("doc_id", "text")
    val cdc = Dedup.cdcChunkDedup(docs, "doc_id", "text", window = 4, maskBits = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // content-defined boundaries resynchronize after the edit: doc 2 keeps
    // only the chunks touching the insertion, the rest dedup away
    val (n2, k2) = cdc(2L)
    assert(k2 < n2, s"CDC must drop shifted duplicate chunks (kept $k2 of $n2)")
    assert(k2 <= 3, s"only the chunks containing the edit survive, kept $k2")
    // fixed-width chunking keeps EVERYTHING in doc 2 (every chunk shifted)
    val fixed = Dedup.chunkDedup(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (fn2, fk2) = fixed(2L)
    assert(fk2 === fn2, "fixed-width chunks all shift → none dedup (the contrast)")
  }

  test("bpeEncodeDropout: regularizes segmentations, dropPpm=0 == bpeEncode") {
    import spark.implicits._
    import graft.operators.Vocab
    val docs = Seq((1L, "abab abab abab cdcd abab cd ab")).toDF("doc_id", "text")
    val merges = Vocab.bpeTrain(docs, "text", 3)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    def segs(drop: Long) = Vocab.bpeEncodeDropout(docs, "doc_id", "text", merges, drop)
      .select(col("token"), array_join(col("pieces"), " ").as("p"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    // p=0 degrades exactly to the deterministic encode
    val full = Vocab.bpeEncode(docs, "doc_id", "text", merges)
      .select(col("token"), array_join(col("pieces"), " ").as("p"))
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(segs(0L).sorted.toSeq === full)
    // heavy dropout yields at least one DIFFERENT segmentation, and every
    // sampled segmentation still concatenates back to its token
    val dropped = segs(700000L)
    assert(dropped.exists { case (t, p) => !full.contains((t, p)) },
      "dropout must expose alternative segmentations")
    dropped.foreach { case (t, p) =>
      assert(p.replace(" ", "") === t, s"roundtrip broken for $t -> $p")
    }
  }

  test("mlmMask: ~15% masked, 80-10-10 branches, loss labels only when masked") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val text = (1 to 2000).map(i => s"tok${i % 50}").mkString(" ")
    val out = TextAnalysis.mlmMask(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text").collect()
    assert(out.length === 2000)
    val masked = out.filter(_.getBoolean(4))
    val rate = masked.length.toDouble / out.length
    assert(rate > 0.10 && rate < 0.20, s"mask rate $rate")
    val mask = masked.count(_.getString(3) == "[MASK]")
    val keep = masked.count(r => r.getString(3) == r.getString(2))
    val rand = masked.length - mask - keep
    assert(mask.toDouble / masked.length > 0.7, "≈80% [MASK]")
    assert(rand > 0 && keep > 0, "random and keep branches both exercised")
    // labels: original token iff masked; unmasked rows pass through
    out.foreach { r =>
      if (r.getBoolean(4)) assert(r.getString(5) === r.getString(2))
      else {
        assert(r.isNullAt(5))
        assert(r.getString(3) === r.getString(2))
      }
    }
    // deterministic: same input → identical masks
    val again = TextAnalysis.mlmMask(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text").collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("incrementalNearDup: drops batch docs near-duplicating the corpus only") {
    import spark.implicits._
    import graft.operators.Dedup
    val body = (1 to 60).map(i => s"w${(i * 13) % 31}").mkString(" ")
    val other = (1 to 60).map(i => s"z${(i * 17) % 29}").mkString(" ")
    val corpus = Seq((100L, body), (101L, other)).toDF("doc_id", "text")
    val batch = Seq(
      (1L, body + " tailtoken"),  // near-dup of corpus 100 → dropped
      (2L, "totally unrelated fresh content about gardens and rivers flowing"),
      (3L, "headtoken " + body)   // near-dup of corpus 100 → dropped
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalNearDup(batch, corpus, "doc_id", "text",
        n = 3, numHashes = 32, bandSize = 4, threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L),
      s"only the fresh doc survives; got $kept (1 and 3 near-dup corpus 100)")
    // within-batch near-dups are NOT this operator's scope: with an empty
    // corpus everything passes, even though 1 and 3 resemble each other
    val emptyCorpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val keptAll = Dedup.incrementalNearDup(batch, emptyCorpus, "doc_id", "text",
        n = 3, numHashes = 32, bandSize = 4, threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(keptAll === Set(1L, 2L, 3L))
  }

  test("orphanCount: NULL FK is a violation (NOT EXISTS contract)") {
    import spark.implicits._
    val parent = Seq(Some(1L), Some(2L), None).toDF("pk")
    val child = Seq(Some(1L), Some(9L), None).toDF("fk")
    // 9 is an orphan; NULL fk references nothing → violation even though
    // the parent also has a NULL key (null-safe <=> would wrongly match).
    val r = DataQuality.orphanCount(child, Seq("fk"), parent, Seq("pk"))
      .collect()(0)
    assert(r.getLong(0) === 3L)
    assert(r.getLong(1) === 2L)
  }
}
