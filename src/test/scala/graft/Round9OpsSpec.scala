package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Ranks

/** Round-9 operator specs: the distributed exact rank/ntile. */
class Round9OpsSpec extends SparkSpec {

  private def randomDf(n: Int, seed: Int) = {
    val r = new scala.util.Random(seed)
    import spark.implicits._
    // skewed leading column (heavy ties) + unique tiebreaker
    (1 to n).map(i => (i.toLong, r.nextInt(7), r.nextInt(1000)))
      .toDF("id", "grp", "v")
  }

  test("Ranks.ntile is bit-identical to Spark's single-partition ntile") {
    val df = randomDf(997, 42)
    for (k <- Seq(1, 3, 32, 256, 1500)) { // 1500 > n exercises the n<k branch
      val want = df.withColumn("t",
        ntile(k).over(Window.orderBy(col("grp"), col("id"))))
      val got = Ranks.ntile(df, k, Seq("grp", "id"), "t")
      assert(got.schema("t").dataType == want.schema("t").dataType)
      val diff = got.join(want, Seq("id"), "inner")
        .filter(got("t") =!= want("t")).count()
      assert(diff == 0, s"k=$k mismatch on $diff rows")
    }
  }

  test("Ranks.ntile with a caller-supplied monotone bucket matches too") {
    val df = randomDf(500, 7)
    val want = df.withColumn("t", ntile(32).over(Window.orderBy(col("v"), col("id"))))
    // a deliberately COARSE and UNBALANCED monotone bucketing: exactness
    // must not depend on bucket quality, only monotonicity
    val got = Ranks.ntile(df, 32, Seq("v", "id"), "t",
      bucketOf = Some(shiftright(col("v"), 7)))
    val diff = got.join(want, Seq("id")).filter(got("t") =!= want("t")).count()
    assert(diff == 0)
  }

  test("Ranks.ntile refuses an unbounded bucket expression loudly") {
    val df = spark.range(Ranks.MaxRankBuckets + 10).toDF("id")
    val e = intercept[IllegalArgumentException] {
      Ranks.ntile(df, 4, Seq("id"), "t", bucketOf = Some(col("id")))
    }
    assert(e.getMessage.contains("distinct buckets"))
  }

  test("quantileBucket guards its driver materialization bounds") {
    val df = spark.range(100).toDF("id")
    intercept[IllegalArgumentException] { Ranks.quantileBucket(df, "id", 1) }
    intercept[IllegalArgumentException] {
      Ranks.quantileBucket(df, "id", Ranks.MaxRankBuckets + 1)
    }
  }

  test("Ranks.ntile never plans a partition-less window") {
    val df = randomDf(300, 3)
    val got = Ranks.ntile(df, 16, Seq("v", "id"), "t")
    got.count()
    assert(partitionlessWindows(got).isEmpty)
  }

  // ---- advisor items ------------------------------------------------------

  /** A minimal two-trak ISO-BMFF container: audio tkhd (0x0 geometry)
    * FIRST, then video tkhd (w×h) — the layout that fooled first-tkhd-wins.
    */
  private def twoTrakMp4(timescale: Int, durUnits: Int, w: Int, h: Int,
      includeVideo: Boolean): Array[Byte] = {
    val ident = {
      val m = java.nio.ByteBuffer.allocate(36)
      m.putInt(0x00010000).putInt(0).putInt(0)
      m.putInt(0).putInt(0x00010000).putInt(0)
      m.putInt(0).putInt(0).putInt(0x40000000)
      m.array()
    }
    def trak(bb: java.nio.ByteBuffer, trackId: Int, tw: Int, th: Int): Unit = {
      bb.putInt(100).put("trak".getBytes)
      bb.putInt(92).put("tkhd".getBytes)
        .putInt(0).putInt(0).putInt(0).putInt(trackId).putInt(0)
        .putInt(durUnits).put(new Array[Byte](8))
        .putShort(0).putShort(0).putShort(0).putShort(0)
        .put(ident).putInt(tw << 16).putInt(th << 16)
    }
    val nTraks = if (includeVideo) 2 else 1
    val moovSize = 8 + 108 + 100 * nTraks
    val bb = java.nio.ByteBuffer.allocate(16 + moovSize)
    bb.putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
    bb.putInt(moovSize).put("moov".getBytes)
    bb.putInt(108).put("mvhd".getBytes)
      .putInt(0).putInt(0).putInt(0).putInt(timescale).putInt(durUnits)
      .putInt(0x00010000).putShort(0x0100.toShort).put(new Array[Byte](10))
      .put(ident).put(new Array[Byte](24)).putInt(nTraks + 1)
    trak(bb, 1, 0, 0) // audio track: zero geometry
    if (includeVideo) trak(bb, 2, w, h)
    bb.array()
  }

  test("mp4 decode takes the first NONZERO-geometry track, not the first track") {
    import spark.implicits._
    import graft.operators.Multimodal
    val docs = Seq(
      (1L, twoTrakMp4(1000, 5000, 320, 240, includeVideo = true)),
      (2L, twoTrakMp4(1000, 5000, 0, 0, includeVideo = false)) // audio-only
    ).toDF("doc_id", "payload")
    val got = Multimodal.decodeAvMeta(spark, docs).collect()
      .map(m => m.doc_id -> m).toMap
    // audio trak precedes video: geometry must come from the video trak
    assert(got(1L).status == "ok" && got(1L).width == 320 && got(1L).height == 240)
    assert(got(1L).duration_ms == 5000L)
    // audio-only container: valid file, ok with 0x0 — never "corrupt"
    assert(got(2L).status == "ok" && got(2L).width == 0 && got(2L).height == 0)
  }

  test("RetryingFetcher propagates permanent failures on the FIRST attempt") {
    import graft.sources.Extract
    class Counting(e: => Throwable) extends Extract.Fetcher {
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      def get(url: String): Option[Array[Byte]] = { n.incrementAndGet(); throw e }
    }
    // permanent: 401 auth failure — exactly one attempt, no backoff burn
    val auth = new Counting(new RuntimeException("HTTP 401 Unauthorized"))
    intercept[RuntimeException] { new Extract.RetryingFetcher(auth, 3).get("u") }
    assert(auth.n.get() == 1, s"permanent failure retried ${auth.n.get()} times")
    // transient: IOException — all attempts consumed
    val flaky = new Counting(new java.io.IOException("connection reset"))
    intercept[java.io.IOException] { new Extract.RetryingFetcher(flaky, 3).get("u") }
    assert(flaky.n.get() == 3)
    // transient by message shape: 503 in a RuntimeException still retries
    val five = new Counting(new RuntimeException("HTTP 503 Service Unavailable"))
    intercept[RuntimeException] { new Extract.RetryingFetcher(five, 2).get("u") }
    assert(five.n.get() == 2)
  }

  test("resizeExec thumbnails round-trip: re-decoding gives the resampled raster") {
    import spark.implicits._
    import graft.operators.Multimodal
    val specs = Seq(
      Multimodal.PatternImageSpec(1L, 48, 32, 10),
      Multimodal.PatternImageSpec(2L, 8, 8, 0) // smaller than target: no upscale
    ).toDS()
    val bin = Multimodal.synthesizePatternImages(spark, specs)
    val out = Multimodal.resizeExec(spark, bin, 16, 16).collect()
      .map(r => r.doc_id -> r).toMap
    val r1 = out(1L)
    assert(r1.status == "ok" && r1.out_w == 16 && r1.out_h == 10)
    // the thumb is a REAL PNG of the resampled raster: decode it and
    // recompute the nearest-neighbor pattern pixel-for-pixel
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r1.thumb))
    assert(img.getWidth == 16 && img.getHeight == 10)
    for (oy <- 0 until 10; ox <- 0 until 16) {
      val expect = ((ox * 48 / 16) * 7 + (oy * 32 / 10) * 13 + 10) % 256
      assert(((img.getRGB(ox, oy) >> 16) & 0xff) == expect, s"pixel ($ox,$oy)")
    }
    // under-target image: identity geometry, pixels preserved
    val r2 = out(2L)
    assert(r2.out_w == 8 && r2.out_h == 8 && r2.min_gray == 0)
    // corrupt payload: quarantine row, stable reason, no thumb
    val cut = bin.filter($"doc_id" === 1L)
      .select($"doc_id", $"payload".substr(1, 33).as("payload"))
    val q = Multimodal.resizeExec(spark, cut, 16, 16).collect().head
    assert(q.status == "corrupt" && q.err.contains("decode_failed") && q.thumb == null)
  }

  test("pqAdcTopK over a materialized code table equals the encode-per-batch serve") {
    import graft.operators.Ann
    val emb = Tables.t(spark, sfDir, "embeddings")
    val books = Ann.pqCodebooks(emb, "vec_id", "embedding", m = 8, k = 4)
    val qIds = emb.select(col("vec_id")).filter(col("vec_id") < 5)
    val want = Ann.pqTopK(emb, qIds, "vec_id", "embedding", books, 4, topK = 5)
    // materialize codes to parquet — the serving fleet's on-disk index —
    // and serve the same batch against the coded relation alone
    val d = java.nio.file.Files.createTempDirectory("pq-idx").toString
    Ann.pqEncode(emb, "vec_id", "embedding", books)
      .write.mode("overwrite").parquet(d)
    val enc = spark.read.parquet(d)
    val queries = emb.filter(col("vec_id") < 5)
    val got = Ann.pqAdcTopK(enc, books, 4, queries, "vec_id", "embedding", topK = 5)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // serving plan: no raw-vector column anywhere on the corpus side
    got.count()
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "coded corpus must not shuffle — the query LUT side broadcasts")
  }

  test("quantizeInt8 refuses non-embedding-shaped columns before the corpus pass") {
    import spark.implicits._
    import graft.operators.Ann
    val wide = Seq((1L, Array.fill(Ann.MaxQuantDims + 1)(0.5))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      Ann.quantizeInt8(wide, "id", "vec")
    }
    assert(e.getMessage.contains("refusing to quantize"))
  }
}
