package graft

import org.apache.spark.sql.functions._
import graft.functions.{BloomUtil, Fns}
import graft.operators._

/** Round-4 operators: bloom-prefilter join, z-order clustering,
  * repetition/PII/contamination text ops.
  */
class Round4OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- bloom filter -------------------------------------------------------

  test("bloom has no false negatives and bounded false positives") {
    val keys = (0L until 2000L).map(_ * 37 + 11)
    val words = new Array[Long](1 << 14) // 2^20 bits
    keys.foreach(BloomUtil.setBit(words, _, 5))
    val bytes = BloomUtil.wordsToBytes(words)
    assert(keys.forall(BloomUtil.mightContain(bytes, _, 5)),
      "false negative — membership must be guaranteed for inserted keys")
    // ~2k keys in 2^20 bits with 5 hashes: fp rate ~1e-9; 10k probes of
    // absent keys should essentially never hit
    val fp = (1L to 10000L).map(_ * 37 + 12).count(BloomUtil.mightContain(bytes, _, 5))
    assert(fp < 10, s"false-positive rate implausibly high: $fp/10000")
  }

  test("bloom agg merge is a word-wise OR (split build == whole build)") {
    val (a, b) = ((0L until 500L).toSeq, (500L until 1000L).toSeq)
    def build(ks: Seq[Long]): Array[Byte] = {
      val w = new Array[Long](1024)
      ks.foreach(BloomUtil.setBit(w, _, 5))
      BloomUtil.wordsToBytes(w)
    }
    val whole = build(a ++ b)
    val merged = {
      val wa = BloomUtil.bytesToWords(build(a))
      val wb = BloomUtil.bytesToWords(build(b))
      BloomUtil.wordsToBytes(wa.indices.map(i => wa(i) | wb(i)).toArray)
    }
    assert(whole.sameElements(merged))
  }

  test("bloom prefilter keeps every joining row and prunes most others") {
    val small = Tables.t(spark, sfDir, "part").filter(col("p_size") <= 3)
    val big = Tables.t(spark, sfDir, "lineitem")
    val bloom = BloomPrefilterJoin.buildBloom(small, "p_partkey")
    val kept = BloomPrefilterJoin.prefilter(big, col("l_partkey"), bloom)

    val joinKeys = small.select("p_partkey").as[Long].collect().toSet
    val total = big.count()
    val keptRows = kept.count()
    val trueMatches = big.filter(col("l_partkey").isin(joinKeys.toSeq: _*)).count()
    assert(keptRows >= trueMatches, "prefilter dropped a joining row")
    assert(keptRows < total / 2,
      s"prefilter pruned nothing: kept $keptRows of $total")
    // end-to-end result identical to the plain join
    val viaBloom = BloomPrefilterJoin.join(big, small, "l_partkey", "p_partkey")
      .groupBy("p_brand").count().orderBy("p_brand").collect()
    val plain = big.join(small, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").count().orderBy("p_brand").collect()
    assert(viaBloom.sameElements(plain))
  }

  // ---- z-order ------------------------------------------------------------

  test("zValue2 matches a reference bit interleave") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L), (170L, 85L), (37L, 200L))
    val df = cases.toDF("x", "y")
      .withColumn("z", ZOrder.zValue2(col("x"), col("y"), 8))
    val got = df.select("x", "y", "z").as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == ref(x, y, 8), s"($x,$y)") }
  }

  test("z-order clustering narrows per-partition spans on BOTH dimensions") {
    // uniform grid: every (x, y) in 64×64
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val parts = 16
    val clustered = ZOrder.cluster(grid, col("x"), col("y"), 6, parts)
      .withColumn("pid", spark_partition_id())
    val spans = clustered.groupBy("pid")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .select("sx", "sy").as[(Long, Long)].collect()
    assert(spans.length == parts)
    // sorting by x alone would give sy = 63 in every partition; the curve
    // must bound both spans well below the full extent
    val (avgX, avgY) = (spans.map(_._1).sum / parts, spans.map(_._2).sum / parts)
    assert(avgX <= 32 && avgY <= 32,
      s"spans not clustered: avg x-span $avgX, avg y-span $avgY")
    // layout plan is range-partitioned, not a global sort
    val plan = ZOrder.cluster(grid, col("x"), col("y"), 6, parts)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("RepartitionByExpression"), plan.take(300))
  }

  // ---- size-adaptive connected components ---------------------------------

  test("small-graph union-find fast path matches the distributed loop exactly") {
    // chains, a star, an isolated pair, and out-of-order labels
    val edges = (Seq((7L, 3L), (3L, 9L), (9L, 1L), (20L, 21L), (22L, 21L)) ++
      (100L until 160L).map(i => (i + 1, i))).toDF("src", "dst")
    val fast = IdentityResolution.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val dist = IdentityResolution.connectedComponents(edges, smallGraphMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(fast == dist, s"paths disagree: ${fast.toSet.diff(dist.toSet)}")
    assert(fast(7L) == 1L && fast(22L) == 20L && fast(160L) == 100L)
  }

  // ---- repetition / PII / contamination -----------------------------------

  test("repetition metrics flag pathological docs and pass natural ones") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, "the quick brown fox jumps over the lazy sleeping dog"),
      (3L, "ab cd ab cd ab cd ab cd ab cd")
    ).toDF("doc_id", "text")
    val m = docs.select(
      col("doc_id"),
      TextAnalysis.topTokenFraction(col("text")).as("tf"),
      TextAnalysis.dupNgramFraction(col("text"), 2).as("d2"),
      TextAnalysis.repetitive(col("text")).as("rep"))
      .as[(Long, Double, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(m(1L)._2 == 1.0 && m(1L)._4, "all-same-token doc must flag")
    assert(!m(2L)._4, s"natural sentence must pass: ${m(2L)}")
    assert(m(3L)._3 > 0.7 && m(3L)._4, s"cycling bigrams must flag: ${m(3L)}")
  }

  test("PII redaction masks emails, phones, and IPs and counts them") {
    val df = Seq(
      "mail bob.smith+x@corp-mail.example.org now",
      "call 555-867-5309 or 555-000-1111",
      "host 192.168.0.1 and 10.0.255.254",
      "clean text with no identifiers at all"
    ).toDF("text").select(
      TextAnalysis.redactPii(col("text")).as("red"),
      TextAnalysis.piiCount(col("text"), TextAnalysis.EmailRe).as("ne"),
      TextAnalysis.piiCount(col("text"), TextAnalysis.PhoneRe).as("np"),
      TextAnalysis.piiCount(col("text"), TextAnalysis.Ipv4Re).as("ni"))
    val rows = df.as[(String, Int, Int, Int)].collect()
    assert(rows(0) == (("mail <EMAIL> now", 1, 0, 0)))
    assert(rows(1) == (("call <PHONE> or <PHONE>", 0, 2, 0)))
    assert(rows(2) == (("host <IP> and <IP>", 0, 0, 2)))
    assert(rows(3) == (("clean text with no identifiers at all", 0, 0, 0)))
  }

  test("contamination flags exactly the docs sharing an n-gram with the bench set") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // contains bench 5-gram
      (2L, "one two three four five six seven"),     // clean
      (3L, "alpha beta gamma delta epsilon other")   // shares the same 5-gram
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val got = Contamination.ngramOverlap(corpus, bench, "doc_id", "text", 5)
      .select("doc_id", "n_contaminated", "contaminated")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._3 && got(1L)._2 == 1L)
    assert(!got(2L)._3 && got(2L)._2 == 0L)
    assert(got(3L)._3)
  }
}
