package graft

import org.apache.spark.sql.functions._
import graft.operators._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents resolves multi-hop chains (not just stars)") {
    // chain 1-2-3-4-5 plus isolated pair 10-11: transitive closure required
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("src", "dst")
    // smallGraphMaxEdges = 0 forces the distributed propagation loop
    val got = IdentityResolution.connectedComponents(edges, smallGraphMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(got(_) == 1L), s"chain not fully resolved: $got")
    assert(got(10L) == 10L && got(11L) == 10L)
  }

  test("connectedComponents resolves a 1000-hop chain within the iteration budget") {
    // worst case for pure propagation (needs 1000 rounds); pointer jumping
    // must close it in O(log n)
    val edges = (0L until 1000L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = IdentityResolution.connectedComponents(edges, smallGraphMaxEdges = 0L)
    assert(got.count() == 1001)
    assert(got.filter(col("component") =!= 0L).isEmpty,
      "chain not fully labeled with root 0")
  }

  test("minhash LSH finds the high-similarity pairs exact jaccard finds") {
    val docs = Tables.t(spark, sfDir, "documents")
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 32, 4, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "no planted near-dups found — test data assumption broken")
    // banding (8 bands × 4) has >99.9% recall at jaccard ≥ 0.9
    assert(lsh == exact, s"LSH missed pairs: ${exact.diff(lsh)}")
  }

  test("simhash of near-duplicate docs differs in few bits") {
    val docs = Tables.t(spark, sfDir, "documents")
    val pair = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.9)
      .orderBy(col("jaccard").desc).select("id_a", "id_b")
      .as[(Long, Long)].head()
    val sig = Dedup.simhash(docs, "doc_id", "text", 32)
      .filter(col("doc").isin(pair._1, pair._2))
      .select("simhash").as[String].collect()
    val hamming = sig(0).zip(sig(1)).count { case (a, b) => a != b }
    assert(hamming <= 6, s"near-dup pair hamming distance $hamming > 6")
  }

  test("LSH top-k neighbors are a subset of brute-force candidates ranked identically within bucket") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val bf = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 50)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Ann.lshTopK(emb, queries, "vec_id", "embedding", 6, 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    assert(lsh.nonEmpty)
    // every LSH hit is a genuine vector pair; ranks are 1..k contiguous
    lsh.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1 to rows.length))
    }
  }

  test("IVF top-k: probed-list search recalls most brute-force neighbors") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val bf = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Ann.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nLists = 8, nprobe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    // probing 3/8 lists should still recover a solid share of true top-5
    val recall = bf.count(ivf).toDouble / bf.size
    assert(recall >= 0.5, s"IVF recall $recall too low")
    // every IVF hit must be a genuine corpus vector, never the query itself
    assert(ivf.forall { case (q, n) => q != n })
  }

  test("multimodal decode is deterministic, partition-count independent") {
    val docs = Tables.t(spark, sfDir, "documents").limit(50)
    val bin = Multimodal.withBinaryPayload(docs, "doc_id", "text")
    val a = Multimodal.decodeMeta(spark, bin.repartition(1)).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeMeta(spark, bin.repartition(7)).collect().sortBy(_.doc_id)
    assert(a.sameElements(b))
    assert(a.forall(m => m.width >= 64 && m.height >= 64 && m.content_hash.length == 32))
    assert(a.map(_.format).toSet.subsetOf(Set("png", "jpeg", "webp")))
  }

  test("simhashPairs finds near-dup docs via block banding with exact hamming verify") {
    val docs = Tables.t(spark, sfDir, "documents")
    val planted = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // 64-bit signatures: jaccard-0.9 pairs land within hamming 15 reliably
    // (32-bit/hamming-7 measured only ~0.78 recall — simhash granularity)
    val got = Dedup.simhashPairs(docs, "doc_id", "text", bits = 64, maxHamming = 15)
      .as[(Long, Long, Int)].collect()
    assert(got.nonEmpty)
    assert(got.forall(_._3 <= 15))
    // high-jaccard planted pairs should overwhelmingly be simhash-close
    val found = got.map(r => (r._1, r._2)).toSet
    val recall = planted.count(found).toDouble / planted.size
    assert(recall >= 0.8, s"simhash recall $recall over ${planted.size} planted pairs")
  }

  test("mixpanel reverse transforms reshape canonical rows to vendor wire shapes") {
    val ev = Seq(("click", "u1", 1700000000L, "i1", "s", Map("a" -> "b")))
      .toDF("event", "distinct_id", "time", "insert_id", "source", "properties")
    val amp = MixpanelTransform.eventsToAmplitude(ev).collect()(0)
    assert(amp.getAs[String]("event_type") == "click")
    assert(amp.getAs[Long]("time") == 1700000000000L) // s → ms
    assert(amp.getAs[String]("user_id") == "u1")
    val woopra = MixpanelTransform.eventsToWoopra(ev).collect()(0)
    assert(woopra.getAs[org.apache.spark.sql.Row]("visitor").getAs[String]("id") == "u1")
    val engage = Seq(("u9", Map("x" -> "1"))).toDF("$distinct_id", "$properties")
    val prof = MixpanelTransform.engageToProfiles(engage).collect()(0)
    assert(prof.getAs[String]("distinct_id") == "u9")
    assert(prof.getAs[Map[String, String]]("set") == Map("x" -> "1"))
  }

  test("saltedJoin is row-identical to the direct join under heavy key skew") {
    // 90% of rows on one hot key — the salting target
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "v")
    val right = Seq((7L, "hot"), (10L, "ten"), (20L, "twenty")).toDF("k", "name")
    val direct = left.join(right, "k").select("k", "v", "name")
    val salted = SkewJoin.saltedJoin(left, right, "k", salts = 8)
      .select("k", "v", "name")
    assert(salted.count() == direct.count())
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
    // left join keeps unmatched probe rows exactly once
    val lj = SkewJoin.saltedJoin(left, right, "k", salts = 4, joinType = "left")
    assert(lj.count() == left.count())
  }

  test("exactFirstWins keeps lowest-ordered row per key") {
    val df = Seq((1, "k1", "a"), (2, "k1", "b"), (3, "k2", "c")).toDF("id", "k", "v")
    val got = Dedup.exactFirstWins(df, Seq("k"), Seq("id"))
      .select("id").as[Int].collect().toSet
    assert(got == Set(1, 3))
  }

  test("language ID prefers the language with most marker hits") {
    val df = Seq("the cat and the dog is here", "el perro de la casa y el gato")
      .toDF("text")
    val got = df.select(TextAnalysis.langId(col("text"))).as[String].collect()
    assert(got.sameElements(Array("en", "es")))
  }

  test("hyperplane bucketing drops null/empty vectors (no null cosines downstream)") {
    val emb = Seq(
      (0L, Seq(1.0, 0.0, 0.0)), (1L, Seq(0.9, 0.1, 0.0)), (2L, Seq(0.0, 1.0, 0.0))
    ).toDF("vec_id", "embedding")
      .unionByName(Seq((3L, null.asInstanceOf[Seq[Double]]), (4L, Seq.empty[Double]))
        .toDF("vec_id", "embedding"))
    val buckets = Ann.hyperplaneBuckets(emb, "vec_id", "embedding", 4)
    assert(buckets.select("vid").as[Long].collect().toSet == Set(0L, 1L, 2L))
    val topk = Ann.lshTopK(emb, emb.filter(col("vec_id") === 0), "vec_id",
      "embedding", 2, 3)
    assert(topk.filter(col("cos").isNull).count() == 0)
  }

  test("nearDupClusters is closure-correct where pairwise keep-lowest is not") {
    // chain 1~2, 2~3 WITHOUT 1~3: one cluster, rep 1
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("stratified sample is monotone in rate and split assignment is stable") {
    val docs = Tables.t(spark, sfDir, "documents")
    val at20 = Sampling.stratifiedSample(docs, "doc_id", "lang", Map.empty, 0.2)
      .select("doc_id").as[Long].collect().toSet
    val at50 = Sampling.stratifiedSample(docs, "doc_id", "lang", Map.empty, 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(at20.subsetOf(at50) && at20.nonEmpty && at50.size > at20.size)
    // split assignment: every row gets exactly one split; re-run identical
    val s1 = Sampling.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.5))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val s2 = Sampling.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.5))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(s1 == s2 && s1.size == docs.count())
  }

  test("stop-shingle cap only ever removes candidate pairs, never adds") {
    val docs = Tables.t(spark, sfDir, "documents")
    val uncapped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8,
      maxShingleFreq = Some(5))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(uncapped),
      s"cap invented pairs: ${capped.diff(uncapped)}")
  }

  test("PPJoin length+positional filters are lossless vs brute-force all-pairs") {
    // Seeded corpus engineered to stress the filters: exact copies,
    // one-token edits (just over/under typical thresholds), length-skewed
    // pairs (length filter must not drop true pairs at the τ boundary),
    // and unrelated docs sharing stop-shingles (what the filters prune).
    val rnd = new scala.util.Random(20260814L)
    val vocab = Vector("data", "spark", "query", "join", "scan", "hash",
      "sort", "merge", "shard", "batch", "tuple", "index")
    def doc(len: Int): Seq[String] = Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
    val base = (0 until 30).map(i => i.toLong -> doc(8 + rnd.nextInt(20))).toMap
    val variants = base.collect { case (id, ts) if id % 3 == 0 =>
      // drop one token / substitute one token — near-dup but not identical
      val k = rnd.nextInt(ts.size)
      (100L + id) -> ts.patch(k, if (id % 2 == 0) Nil else Seq("edit"), 1)
    }
    val copies = base.collect { case (id, ts) if id % 5 == 0 => (200L + id) -> ts }
    val corpus = (base ++ variants ++ copies).toSeq
    val docs = corpus.map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    def shingleSet(ts: Seq[String]): Set[String] =
      if (ts.size < 3) Set.empty
      else ts.sliding(3).map(_.mkString(" ")).toSet
    for (tau <- Seq(0.5, 0.7, 0.8, 0.95)) {
      val naive = (for {
        (a, ta) <- corpus; (b, tb) <- corpus if a < b
        sa = shingleSet(ta); sb = shingleSet(tb)
        inter = (sa & sb).size if sa.nonEmpty && sb.nonEmpty
        j = inter.toDouble / (sa.size + sb.size - inter) if j >= tau
      } yield (a, b)).toSet
      val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, tau)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == naive,
        s"τ=$tau missed=${naive.diff(got)} invented=${got.diff(naive)}")
    }
  }
}
