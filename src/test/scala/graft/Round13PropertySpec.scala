package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Round-13 property cases: the stream≡batch identity proofs replay in
  * event order; these pin that the STATE-STORE LOGIC, not the arrival
  * order, carries the identity — rows are dropped in seeded-shuffled
  * order (within the watermark) and the stream must still land on the
  * batch replica's verdict set.
  */
class Round13PropertySpec extends SparkSpec {

  import spark.implicits._

  private val t0 = 1700000000L

  /** 24 docs in 6 near-dup groups of 4: same base paragraph, ONE word
    * edited per doc (keeps MinHash band collisions alive), distinct
    * event times in id order.
    */
  private def corpus: Seq[(Long, String, Long)] = {
    val bases = Seq(
      "the quick brown fox jumps over a lazy dog while the bright sun sets " +
        "behind tall green hills and children play near the quiet river bank",
      "deep space telescopes measure distant galaxy clusters through gravity " +
        "lensing surveys that map invisible dark matter structure every night",
      "fresh bread bakes slowly in the old stone oven while morning rain " +
        "falls gently on the market square and vendors open their stalls",
      "long freight trains cross the high desert plateau carrying grain and " +
        "timber toward coastal ports where cranes load waiting cargo ships",
      "mountain climbers ascend the icy ridge at dawn roped together against " +
        "strong wind gusts that sweep loose snow across the narrow path",
      "city libraries archive fragile manuscripts in climate controlled vaults " +
        "where scholars study faded ink under special lamps for many hours")
    (0 until 24).map { i =>
      val g = i % 6
      val text = bases(g).replace("the", if (i / 6 == 0) "the" else s"w${i / 6}")
      (i.toLong, text, t0 + i * 7)
    }
  }

  private def line(id: Long, text: String, ts: Long): String =
    s"""{"doc_id":$id,"text":"$text","lang":"en","source":"s1","ingest_ts":$ts}"""

  private def batchKept(rows: Seq[(Long, String, Long)]): Set[Long] =
    graft.streaming.StreamingCuration.nearDupBatchReplica(
        rows.toDF("doc_id", "text", "__et"), "__et",
        n = 3, numHashes = 8, bandSize = 2)
      .as[Long].collect().toSet

  private def streamKept(files: Seq[Seq[String]], name: String): Set[Long] = {
    val staging = Files.createTempDirectory(s"prop-neardup-$name").toString
    val deduped = graft.streaming.StreamingCuration
      .nearDupDocumentStream(spark, staging, watermark = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      files.zipWithIndex.foreach { case (lines, i) =>
        Files.write(java.nio.file.Paths.get(staging, f"f$i%03d.json"),
          lines.mkString("\n").getBytes)
        q.processAllAvailable()
      }
      // flusher advances the watermark so append-mode verdicts emit
      Files.write(java.nio.file.Paths.get(staging, "zz_flush.json"),
        line(-1L, "late watermark flusher document", t0 + 864000).getBytes)
      q.processAllAvailable(); q.processAllAvailable()
      spark.table(name).select("doc_id").as[Long].collect().toSet - (-1L)
    } finally q.stop()
  }

  test("near-dup stream ≡ batch replica under shuffled arrival within one trigger") {
    val rows = corpus
    val expected = batchKept(rows)
    for (seed <- Seq(7, 41, 1999)) {
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(rows).map { case (i, s, ts) => line(i, s, ts) }
      val got = streamKept(Seq(shuffled), s"nd_prop_a$seed")
      assert(got === expected, s"seed $seed: single-trigger shuffled arrival")
    }
  }

  test("near-dup stream ≡ batch replica with shuffled arrival across event-ordered triggers") {
    val rows = corpus
    val expected = batchKept(rows)
    for (seed <- Seq(13, 9001)) {
      val rnd = new scala.util.Random(seed)
      // trigger boundary respects event time (watermark semantics); the
      // ARRIVAL ORDER inside each trigger is shuffled — the state
      // function's within-trigger (event_time, doc_id) sort must absorb it
      val (early, late) = rows.partition(_._3 < t0 + 12 * 7)
      val files = Seq(rnd.shuffle(early), rnd.shuffle(late))
        .map(_.map { case (i, s, ts) => line(i, s, ts) })
      val got = streamKept(files, s"nd_prop_b$seed")
      assert(got === expected, s"seed $seed: two-trigger shuffled arrival")
    }
  }

  test("gpt2PreTokens: exact partition and encode round-trip on random unicode (200 samples)") {
    import graft.operators.Vocab
    val rnd = new scala.util.Random(20260815)
    // sample by CODE POINT — the byte-map contract requires valid UTF-16,
    // and a char-level sampler would split the emoji's surrogate pair
    val alphabet: IndexedSeq[String] =
      "abcXYZ 019,.!?'\t\n  héß你😀-_()".codePoints().toArray.toIndexedSeq
        .map(cp => new String(Character.toChars(cp)))
    def randomText(): String =
      (0 until 1 + rnd.nextInt(60)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    val samples = (0 until 200).map(_ => randomText())
    val got = samples.toDF("text")
      .select(Vocab.gpt2PreTokens(col("text"))).as[Seq[String]].collect()
    samples.zip(got).foreach { case (in, toks) =>
      assert(toks.mkString === in,
        s"pre-tokens must partition exactly: ${in.map(_.toInt)}")
      assert(toks.forall(_.nonEmpty), "no empty pre-tokens")
    }
    // byte-level encode over pre-tokens round-trips the whole document
    val merges = Vocab.bbpeTrainPretok(
      samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "text"), "text", 8)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = Vocab.bbpeEncodePretok(
      samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "text"), "doc_id", "text", merges)
    val rebuilt = enc
      .groupBy("doc")
      .agg(array_join(transform(array_sort(collect_list(
          struct(col("token_idx"), concat_ws("", col("pieces")).as("m")))),
        s => s.getField("m")), "").as("all"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(Vocab.byteUnmapString(rebuilt(i.toLong)) === s,
        s"whole-document byte round-trip of sample $i")
    }
  }

  test("mp3/aac audits are total on random bytes: a status for every payload, no throw") {
    import graft.operators.Multimodal
    val rnd = new scala.util.Random(4242)
    val payloads = (0 until 300).map { i =>
      val n = rnd.nextInt(64)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      // force the claim-prefixes often so the parse path fuzzes too
      if (n >= 2 && i % 3 == 0) { b(0) = 0xff.toByte; b(1) = 0xfb.toByte }
      if (n >= 3 && i % 3 == 1) { b(0) = 'I'; b(1) = 'D'; b(2) = '3' }
      if (n >= 2 && i % 5 == 0) { b(0) = 0xff.toByte; b(1) = 0xf1.toByte }
      (i.toLong, b)
    }.toDF("doc_id", "payload")
    val mp3 = Multimodal.mp3Audit(spark, payloads).collect()
    val aac = Multimodal.aacAudit(spark, payloads).collect()
    assert(mp3.length === 300 && aac.length === 300, "total functions")
    assert(mp3.forall(m => Set("ok", "corrupt", "unsupported")(m.status)))
    assert(aac.forall(m => Set("ok", "corrupt", "unsupported")(m.status)))
    assert(mp3.filter(_.status == "corrupt").forall(_.err.isDefined),
      "every corrupt verdict carries a stable reason")
    assert(aac.filter(_.status == "corrupt").forall(_.err.isDefined))
  }

  test("log-histogram: any shuffle and any batch split merge to the batch buckets") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val vals = (0 until 400).map(i => (i * 2654435761L) % 100000L)
    val batch = vals.toDF("v")
      .agg(graft.functions.Fns.logHistogram(col("v"), 4).as("h"))
      .select(explode(col("h")).as("e")).select("e.b", "e.n")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    for (seed <- Seq(3, 77, 4242)) {
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(vals)
      val cut = 1 + rnd.nextInt(vals.size - 1)
      val mem = MemoryStream[Long]
      val q = mem.toDF().toDF("v")
        .agg(graft.functions.Fns.logHistogram(col("v"), 4).as("h"))
        .writeStream.format("memory").queryName(s"lh_prop_$seed")
        .outputMode("complete").start()
      try {
        val (a, b) = shuffled.splitAt(cut)
        mem.addData(a: _*); q.processAllAvailable()
        mem.addData(b: _*); q.processAllAvailable()
        val streamed = spark.table(s"lh_prop_$seed")
          .select(explode(col("h")).as("e")).select("e.b", "e.n")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(streamed === batch, s"seed $seed cut $cut")
      } finally q.stop()
    }
  }
}
