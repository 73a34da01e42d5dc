package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Round-10 operator specs: TRUE MP4 frame demux (stsz/stsc/stco) and the
  * second-codec executed-resize path.
  */
class Round10OpsSpec extends SparkSpec {

  private def specDs(sizes: Seq[Int], spc: Int, seed: Int) = {
    import spark.implicits._
    Seq(Multimodal.Mp4SampleSpec(1L, 600, 1200L, 64, 48, sizes, spc, seed)).toDS()
  }

  test("frameIndex recovers exact offsets, sizes, byte sums, pts, and sync flags") {
    val sizes = Seq(9, 12, 8, 15, 10, 11, 13) // non-uniform, 7 samples, spc 3
    val bin = Multimodal.synthesizeMp4Samples(spark, specDs(sizes, 3, 50))
    val rows = Multimodal.frameIndex(spark, bin, stride = 1)
      .orderBy("frame_idx").collect()
    assert(rows.forall(_.status == "ok") && rows.length == 7)
    // layout arithmetic: ns=7, nc=3, nk=2 -> data region at 408+4*12=456;
    // sample i offset = 456 + 4*(i/3+1) + cumsum(sizes); stts runs:
    // h=4 samples at 40 ms then 80 ms (media timescale 1000); stss marks
    // samples 1 and 5 (1-based) = frames 0 and 4
    var cum = 0
    for ((r, i) <- rows.zipWithIndex) {
      val expOff = 456 + 4 * (i / 3 + 1) + cum
      assert(r.byte_offset == expOff, s"frame $i offset ${r.byte_offset} != $expOff")
      assert(r.frame_bytes == sizes(i))
      assert(r.frame_sum == sizes(i).toLong * ((50 + 7 * i) % 256))
      assert(r.pts_ms == 40L * math.min(i, 4) + 80L * math.max(i - 4, 0),
        s"frame $i pts ${r.pts_ms}")
      assert(r.is_sync == (i % 4 == 0), s"frame $i sync ${r.is_sync}")
      cum += sizes(i)
    }
  }

  test("frameIndex stride emits every k-th frame only") {
    val bin = Multimodal.synthesizeMp4Samples(spark, specDs(Seq(8, 8, 8, 8, 8, 8), 2, 0))
    val idx = Multimodal.frameIndex(spark, bin, stride = 3)
      .collect().map(_.frame_idx).sorted
    assert(idx.toSeq == Seq(0L, 3L))
  }

  test("parseMp4SampleIndex expands multi-entry stsc runs correctly") {
    // hand-build an stbl whose stsc has TWO entries: chunks 1-2 carry 2
    // samples each, chunk 3+ carries 1 — 5 samples over 3 chunks
    val sizes = Seq(10, 11, 12, 13, 14)
    val stco = Seq(1000, 2000, 3000)
    val stszSz = 20 + 4 * sizes.size
    val stscSz = 16 + 12 * 2
    val stcoSz = 16 + 4 * stco.size
    val stblSz = 8 + stszSz + stscSz + stcoSz
    // minimal mp4: ftyp + moov(trak(mdia(minf(stbl)))) — no mvhd/tkhd
    // needed, the index walker only follows the stbl path; trailing slack
    // bytes keep the stco offsets in-bounds for the payload-length check
    val trakSz = 8 + (8 + (8 + stblSz))
    val bb = java.nio.ByteBuffer.allocate(16 + 8 + trakSz + 5000)
    bb.putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
    bb.putInt(8 + trakSz).put("moov".getBytes)
    bb.putInt(trakSz).put("trak".getBytes)
    bb.putInt(8 + (8 + stblSz)).put("mdia".getBytes)
    bb.putInt(8 + stblSz).put("minf".getBytes)
    bb.putInt(stblSz).put("stbl".getBytes)
    bb.putInt(stszSz).put("stsz".getBytes).putInt(0).putInt(0).putInt(sizes.size)
    sizes.foreach(bb.putInt)
    bb.putInt(stscSz).put("stsc".getBytes).putInt(0).putInt(2)
      .putInt(1).putInt(2).putInt(1) // chunks 1-2: 2 samples each
      .putInt(3).putInt(1).putInt(1) // chunk 3+: 1 sample
    bb.putInt(stcoSz).put("stco".getBytes).putInt(0).putInt(stco.size)
    stco.foreach(bb.putInt)
    val idx = Multimodal.parseMp4SampleIndex(bb.array()).toOption.get
    assert(idx.map(s => (s.offset, s.size)).toSeq == Seq(
      (1000L, 10), (1010L, 11), // chunk 1
      (2000L, 12), (2012L, 13), // chunk 2
      (3000L, 14)))             // chunk 3
    // no stts/mdhd -> pts unknown; no stss -> every sample is sync
    assert(idx.forall(s => s.ptsMs == -1L && s.sync))
  }

  test("parseMp4SampleIndex handles fixed-size stsz (sample_size > 0)") {
    val bin = Multimodal.synthesizeMp4Samples(spark, specDs(Seq(6, 6, 6, 6), 4, 9))
      .collect().head.getAs[Array[Byte]]("payload")
    // rewrite stsz to the fixed-size form in place: find "stsz", set
    // sample_size=6, count=4, and blank the per-entry area is NOT needed —
    // fixed-size readers must ignore it
    val pos = (0 until bin.length - 4).find(i =>
      bin(i) == 's' && bin(i + 1) == 't' && bin(i + 2) == 's' && bin(i + 3) == 'z').get
    val bb = java.nio.ByteBuffer.wrap(bin)
    bb.putInt(pos + 8, 6) // sample_size
    val idx = Multimodal.parseMp4SampleIndex(bin).toOption.get
    assert(idx.length == 4 && idx.forall(_.size == 6))
  }

  test("frameIndex quarantines mid-moov and mid-mdat truncation distinctly from ok") {
    import spark.implicits._
    val specs = Seq(
      Multimodal.Mp4SampleSpec(1L, 600, 100L, 8, 8, Seq(10, 10, 10), 3, 1),
      Multimodal.Mp4SampleSpec(2L, 600, 100L, 8, 8, Seq(10, 10, 10), 3, 1),
      Multimodal.Mp4SampleSpec(3L, 600, 100L, 8, 8, Seq(10, 10, 10), 3, 1)).toDS()
    val bin = Multimodal.synthesizeMp4Samples(spark, specs)
      .select(col("doc_id"),
        when(col("doc_id") === 2, col("payload").substr(1, 60))   // mid-moov
          .when(col("doc_id") === 3, col("payload").substr(1, 430)) // mid-mdat
          .otherwise(col("payload")).as("payload"))
    val out = Multimodal.frameIndex(spark, bin, stride = 1).collect()
      .groupBy(_.doc_id)
    assert(out(1L).forall(_.status == "ok") && out(1L).length == 3)
    for (d <- Seq(2L, 3L)) {
      assert(out(d).length == 1 && out(d).head.status == "corrupt" &&
        out(d).head.err.contains("truncated"), s"doc $d: ${out(d).toSeq}")
    }
    // a non-mp4 payload is unsupported, not corrupt
    val alien = Seq((9L, "plain text".getBytes)).toDF("doc_id", "payload")
    val a = Multimodal.frameIndex(spark, alien, 1).collect().head
    assert(a.status == "unsupported" && a.err.isEmpty)
  }

  test("parseMp4SampleIndex reads 64-bit co64 chunk offsets") {
    // hand-build: stsz (2 samples of 10/11) + single-entry stsc + co64
    // with offsets that only fit the wide form semantically
    val stszSz = 20 + 4 * 2
    val stscSz = 28
    val co64Sz = 16 + 8 * 1
    val stblSz = 8 + stszSz + stscSz + co64Sz
    val trakSz = 8 + (8 + (8 + stblSz))
    val bb = java.nio.ByteBuffer.allocate(16 + 8 + trakSz + 3000)
    bb.putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
    bb.putInt(8 + trakSz).put("moov".getBytes)
    bb.putInt(trakSz).put("trak".getBytes)
    bb.putInt(8 + (8 + stblSz)).put("mdia".getBytes)
    bb.putInt(8 + stblSz).put("minf".getBytes)
    bb.putInt(stblSz).put("stbl".getBytes)
    bb.putInt(stszSz).put("stsz".getBytes).putInt(0).putInt(0).putInt(2)
      .putInt(10).putInt(11)
    bb.putInt(stscSz).put("stsc".getBytes).putInt(0).putInt(1)
      .putInt(1).putInt(2).putInt(1)
    bb.putInt(co64Sz).put("co64".getBytes).putInt(0).putInt(1).putLong(2500L)
    val idx = Multimodal.parseMp4SampleIndex(bb.array()).toOption.get
    assert(idx.map(s => (s.offset, s.size)).toSeq == Seq((2500L, 10), (2510L, 11)))
  }

  test("stts runs that under-cover the sample count are bad_stts; out-of-range stss is bad_stss") {
    def payload(): Array[Byte] = Multimodal.synthesizeMp4Samples(spark,
      specDs(Seq(8, 8, 8, 8), 4, 0)).collect().head.getAs[Array[Byte]]("payload")
    def boxPos(b: Array[Byte], tag: String): Int =
      (0 until b.length - 4).find(i => tag.indices.forall(j => b(i + j) == tag(j))).get
    // stts: shrink the SECOND run's count so the runs cover 3 of 4 samples
    val p1 = payload()
    val bb1 = java.nio.ByteBuffer.wrap(p1)
    bb1.putInt(boxPos(p1, "stts") + 20, 1) // run2 count: 2 -> 1
    val e1 = Multimodal.parseMp4SampleIndex(p1).swap.toOption.get
    assert(e1 == "bad_stts")
    // stss: point a sync entry past the sample count
    val p2 = payload()
    val bb2 = java.nio.ByteBuffer.wrap(p2)
    bb2.putInt(boxPos(p2, "stss") + 12, 99) // sample 99 of 4
    val e2 = Multimodal.parseMp4SampleIndex(p2).swap.toOption.get
    assert(e2 == "bad_stss")
  }

  test("legacy headers-only mp4 (no stbl) is quarantined as no_stbl") {
    import spark.implicits._
    val bin = Multimodal.synthesizeMp4(spark,
      Seq(Multimodal.Mp4Spec(1L, 600, 100L, 8, 8)).toDS())
    val r = Multimodal.frameIndex(spark, bin, 1).collect().head
    assert(r.status == "corrupt" && r.err.contains("no_stbl"))
  }

  test("resizeExec decodes BMP pattern fixtures pixel-exactly") {
    import spark.implicits._
    val specs = Seq(
      Multimodal.PatternImageFmtSpec(1L, 48, 32, 10, "bmp"),
      Multimodal.PatternImageFmtSpec(2L, 48, 32, 10, "png")).toDS()
    val bin = Multimodal.synthesizePatternImagesFmt(spark, specs)
    val out = Multimodal.resizeExec(spark, bin, 16, 16).collect()
      .map(r => (r.doc_id, (r.out_w, r.out_h, r.sum_gray, r.checksum))).toMap
    // the same raster through two lossless codecs must yield identical
    // resampled stats
    assert(out(1L) == out(2L))
    assert(out(1L)._1 == 16)
  }

  test("truncated BMP is corrupt; text payload is unsupported") {
    import spark.implicits._
    val specs = Seq(Multimodal.PatternImageFmtSpec(1L, 32, 32, 0, "bmp")).toDS()
    val cut = Multimodal.synthesizePatternImagesFmt(spark, specs)
      .select(col("doc_id"), col("payload").substr(1, 20).as("payload"))
    val c = Multimodal.resizeExec(spark, cut, 16, 16).collect().head
    assert(c.status == "corrupt" && c.err.contains("decode_failed"))
    val txt = Seq((2L, "not an image at all".getBytes)).toDF("doc_id", "payload")
    val u = Multimodal.resizeExec(spark, txt, 16, 16).collect().head
    assert(u.status == "unsupported")
  }

  test("URL canonicalization: case, ports, www, fragments, tracking params, param order, slashes") {
    import spark.implicits._
    import graft.operators.WebCuration
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&z=1&a=2#frag",
      "http://sub.Domain.co.uk:8080/p",
      "http://x.io/",
      "https://one.com:8443/q?fbclid=abc&gclid=d&ref=rss",
      "http://plain.org:80/path//")
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val got = urls.select(col("id"),
      WebCuration.canonicalizeUrl(col("url")).as("c"),
      WebCuration.hostOf(col("url")).as("h"),
      WebCuration.registeredDomain(col("url")).as("rd"))
      .orderBy("id").as[(Long, String, String, String)].collect().toSeq
    assert(got == Seq(
      (0L, "https://example.com/a/b?a=2&z=1", "example.com", "example.com"),
      (1L, "http://sub.domain.co.uk:8080/p", "sub.domain.co.uk", "domain.co.uk"),
      (2L, "http://x.io", "x.io", "x.io"),
      (3L, "https://one.com:8443/q", "one.com", "one.com"),
      (4L, "http://plain.org/path", "plain.org", "plain.org")))
  }

  test("urlDedup collapses surface variants of one resource to a single canonical row") {
    import graft.operators.WebCuration
    import spark.implicits._
    val docs = Seq(
      (10L, "https://A.com/x?utm_source=s"),
      (11L, "HTTPS://www.a.COM:443/x/"),
      (12L, "https://a.com/x#top"),
      (13L, "https://a.com/y"))
      .toDF("doc_id", "url")
    val got = WebCuration.urlDedup(docs, "doc_id", "url")
      .orderBy("canonical_url").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("https://a.com/x", 3L, 10L), ("https://a.com/y", 1L, 13L)))
  }

  test("blockDomains drops exactly the blocklisted registered domains, case-insensitively") {
    import spark.implicits._
    import graft.operators.WebCuration
    val docs = Seq(
      (1L, "http://www.bad.com/x"), (2L, "https://Sub.Bad.COM/y"),
      (3L, "http://good.org/z"), (4L, "http://evil.co.uk/w"),
      (5L, "http://notbad.com/v"))
      .toDF("doc_id", "url")
    val blocked = Seq("BAD.com", "evil.co.uk").toDF("domain")
    val got = WebCuration.blockDomains(docs, "url", blocked)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(3L, 5L))
  }

  test("dsirWeights: target-heavy grams outscore source-heavy grams; weights integer-exact") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // target corpus repeats 'alpha', source repeats 'beta'; a doc made of
    // alphas must outweigh a doc made of betas under any hashing
    val docs = (
      (0 until 8).map(i => (i.toLong, "alpha alpha alpha alpha", "tgt")) ++
      (0 until 8).map(i => ((100 + i).toLong, "beta beta beta beta", "src")) ++
      Seq((500L, "alpha alpha alpha alpha", "src"),
          (501L, "beta beta beta beta", "src"))).toDF("doc_id", "text", "kind")
    val w = TextAnalysis.dsirWeights(docs, "doc_id", "text",
      col("kind") === "tgt", buckets = 64)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(w(500L) > w(501L),
      s"alpha-doc ${w(500L)} not above beta-doc ${w(501L)}")
    // identical text => identical weight (pure function of content)
    assert(w(0L) == w(500L))
  }

  test("mixSchedule: integer-exact epochs + tail rate reconstruct tokens_wanted") {
    import spark.implicits._
    import graft.operators.Sampling
    val docs = Seq(
      (1L, "a", 100L), (2L, "a", 150L), // a: 250 tokens
      (3L, "b", 1000L),                 // b: 1000 tokens
      (4L, "c", 60L))                   // c: untargeted, must not appear
      .toDF("doc_id", "domain", "n_tok")
    val got = Sampling.mixSchedule(docs, "domain", col("n_tok"),
      Map("a" -> 600000L, "b" -> 400000L), budgetTokens = 1000L)
      .orderBy("domain")
      .select("domain", "tokens_have", "tokens_wanted", "full_epochs",
        "tail_rate_ppm", "repeat_ppm")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // a: wants 600 of 250 -> 2 full epochs + 100/250 tail; b: wants 400
    // of 1000 -> 0 epochs + 0.4 sample
    assert(got == Seq(
      ("a", 250L, 600L, 2L, 400000L, 2400000L),
      ("b", 1000L, 400L, 0L, 400000L, 400000L)))
    // invariant: full_epochs*have + tail_rate*have/1e6 ~= wanted (floor)
    got.foreach { case (_, have, want, ep, tail, _) =>
      assert(ep * have + tail * have / 1000000 <= want)
      assert(ep * have + (tail + 1) * have / 1000000 + 1 >= want)
    }
  }

  test("audioEnergy never throws on arbitrary bytes — every garbage payload quarantines") {
    import spark.implicits._
    val rnd = new scala.util.Random(42L)
    // seeded garbage: pure noise, RIFF-magic noise (forces the chunk
    // walk), empty, and 1-3 byte stubs
    val payloads: Seq[(Long, Array[Byte])] =
      (0 until 30).map { i =>
        val b = new Array[Byte](rnd.nextInt(200))
        rnd.nextBytes(b)
        if (i % 3 == 0 && b.length >= 12) {
          Array.copy("RIFF".getBytes, 0, b, 0, 4)
          Array.copy("WAVE".getBytes, 0, b, 8, 4)
        }
        (i.toLong, b)
      } :+ (100L, Array.empty[Byte]) :+ (101L, Array[Byte](82))
    val rows = Multimodal.audioEnergy(spark,
      payloads.toDF("doc_id", "payload"), 8).collect()
    assert(rows.length == payloads.length)
    assert(rows.forall(r => r.status == "corrupt" || r.status == "unsupported"),
      rows.filter(r => r.status != "corrupt" && r.status != "unsupported").mkString(","))
  }

  test("canonicalizeUrl total on degenerate inputs (no scheme, empty, bare host, junk)") {
    import spark.implicits._
    import graft.operators.WebCuration
    val weird = Seq("", "   ", "no-scheme-at-all", "http://", "https://:8080",
      "ftp://Weird.Host/path", "http://h?#", "a://b//", "http://h/p?&&&")
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    // must evaluate without throwing and never yield null for non-null in
    val got = weird.select(WebCuration.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect()
    assert(got.length == 9 && got.forall(_ != null))
  }

  test("jacobiEigen recovers a known symmetric spectrum") {
    import graft.operators.Ann
    // [[2,1],[1,2]] has eigenvalues 3 (along [1,1]) and 1 (along [1,-1])
    val (vals, vecs) = Ann.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    assert(math.abs(math.abs(vecs(0)(0)) - math.sqrt(0.5)) < 1e-12)
    // eigen property: A v = lambda v
    val m = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    for (k <- 0 until 2; i <- 0 until 2) {
      val av = (0 until 2).map(j => m(i)(j) * vecs(k)(j)).sum
      assert(math.abs(av - vals(k) * vecs(k)(i)) < 1e-10)
    }
  }

  test("pcaTrain: orthonormal rotation, PC1 beats every raw axis on correlated data") {
    import spark.implicits._
    import graft.operators.Ann
    // strongly correlated 6-dim data: dims are scaled copies of one
    // latent factor plus small deterministic perturbations
    val rows = (0 until 400).map { i =>
      val t = (i % 97) / 97.0 - 0.5
      val p = (i % 13) / 130.0
      (i.toLong, Seq(t, 2 * t + p, -t + p / 2, 0.5 * t - p, t + 2 * p, -2 * t + p).map(_.toFloat))
    }.toDF("vec_id", "embedding")
    val (mu, rot) = Ann.pcaTrain(rows, "vec_id", "embedding", outDims = 6)
    // orthonormality: R R^T = I
    for (a <- rot.indices; b <- rot.indices) {
      val dot = rot(a).zip(rot(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9, s"R R^T [$a][$b] = $dot")
    }
    val proj = Ann.pcaProject(rows, "vec_id", "embedding", mu, rot)
      .select("rotated").as[Seq[Double]].collect()
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val pcVar = variance(proj.map(_.head).toSeq)
    val raw = rows.select("embedding").as[Seq[Float]].collect()
    val rawVars = (0 until 6).map(d => variance(raw.map(_(d).toDouble).toSeq))
    assert(rawVars.forall(pcVar >= _ - 1e-12),
      s"PC1 var $pcVar below a raw axis ${rawVars.max}")
    // total variance preserved by the full rotation (trace invariance)
    val projVarSum = (0 until 6).map(d => variance(proj.map(_(d)).toSeq)).sum
    assert(math.abs(projVarSum - rawVars.sum) < 1e-6)
  }

  test("pcaTrain round-robin interleave permutes the top components across subspaces") {
    import spark.implicits._
    import graft.operators.Ann
    val rows = (0 until 100).map { i =>
      val t = (i % 31) / 31.0
      (i.toLong, Seq(t, t / 2, (i % 7) / 7.0, (i % 5) / 5.0).map(_.toFloat))
    }.toDF("vec_id", "embedding")
    val (_, plain) = Ann.pcaTrain(rows, "vec_id", "embedding", 4, pqSubspaces = 1)
    val (_, inter) = Ann.pcaTrain(rows, "vec_id", "embedding", 4, pqSubspaces = 2)
    // subspaces of 2: interleave order is PCs (0,2 | 1,3)
    assert(inter(0).sameElements(plain(0)) && inter(1).sameElements(plain(2)))
    assert(inter(2).sameElements(plain(1)) && inter(3).sameElements(plain(3)))
  }

  test("pcaProject is partition-count independent (deterministic fold order)") {
    import spark.implicits._
    import graft.operators.Ann
    val emb = Tables.t(spark, sfDir, "embeddings").limit(64)
    val (mu, rot) = Ann.pcaTrain(emb, "vec_id", "embedding", outDims = 8)
    def run(parts: Int) = Ann.pcaProject(emb.repartition(parts), "vec_id",
      "embedding", mu, rot)
      .select("vec_id", "rotated").as[(Long, Seq[Double])].collect()
      .sortBy(_._1).toSeq
    assert(run(1) == run(7))
  }

  test("audioEnergy decodes real PCM frames to exact window statistics") {
    import spark.implicits._
    // 2 channels, 10 frames, window 4 -> windows of 4/4/2 frames; every
    // stat recomputed here independently from the waveform formula
    val (ch, nf, seed, win) = (2, 10, 100, 4)
    val specs = Seq(Multimodal.WavPcmSpec(1L, 8000, ch, 16, nf, seed)).toDS()
    val bin = Multimodal.synthesizeWavPcm(spark, specs)
    val rows = Multimodal.audioEnergy(spark, bin, win)
      .orderBy("window_idx").collect()
    def s(k: Int, c: Int) = (seed + 31 * k + 17 * c) % 4096 - 2048
    assert(rows.length == 3 && rows.forall(_.status == "ok"))
    for ((r, w) <- rows.zipWithIndex) {
      val ks = (w * win) until math.min((w + 1) * win, nf)
      val samples = for (k <- ks; c <- 0 until ch) yield s(k, c)
      assert(r.n_frames == ks.size)
      assert(r.sum_sq == samples.map(v => v.toLong * v).sum, s"window $w sum_sq")
      assert(r.peak == samples.map(math.abs).max)
      val c0 = ks.map(s(_, 0))
      val zc = c0.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0))
      assert(r.zcross == zc, s"window $w zcross ${r.zcross} != $zc")
    }
  }

  test("audioEnergy decodes NEGATIVE samples correctly (sign extension)") {
    import spark.implicits._
    // seed 0: s(0,0) = -2048 (min 16-bit pattern value) — a decoder that
    // reads unsigned would report peak 2048 with sum_sq of 63488² instead
    val specs = Seq(Multimodal.WavPcmSpec(1L, 8000, 1, 16, 1, 0)).toDS()
    val r = Multimodal.audioEnergy(spark,
      Multimodal.synthesizeWavPcm(spark, specs), 8).collect().head
    assert(r.sum_sq == 2048L * 2048 && r.peak == 2048)
  }

  test("audioEnergy status fan-out: 8-bit unsupported, truncated corrupt, ragged corrupt") {
    import spark.implicits._
    val eight = Seq(Multimodal.WavPcmSpec(1L, 8000, 1, 8, 20, 5)).toDS()
    val u = Multimodal.audioEnergy(spark,
      Multimodal.synthesizeWavPcm(spark, eight), 8).collect().head
    assert(u.status == "unsupported" && u.err.contains("bits_8"))
    val good = Seq(Multimodal.WavPcmSpec(2L, 8000, 2, 16, 20, 5)).toDS()
    val cut = Multimodal.synthesizeWavPcm(spark, good)
      .select(col("doc_id"), col("payload").substr(1, 30).as("payload"))
    val c = Multimodal.audioEnergy(spark, cut, 8).collect().head
    assert(c.status == "corrupt" && c.err.contains("truncated"))
    // stereo 16-bit container cut to an odd number of PAYLOAD bytes past
    // the header: data chunk declares more than remains -> truncated too;
    // ragged needs a VALID but non-frame-aligned data size — synthesize by
    // patching the data-chunk length field down to a non-multiple of 4
    val patched = Multimodal.synthesizeWavPcm(spark, good).as[(Long, Array[Byte])]
      .map { case (id, b) =>
        val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putInt(40, 6) // 6 bytes = 1.5 stereo frames
        (id, b)
      }.toDF("doc_id", "payload")
    val rg = Multimodal.audioEnergy(spark, patched, 8).collect().head
    assert(rg.status == "corrupt" && rg.err.contains("ragged_data"), rg.toString)
  }

  // ---- distributed suffix array ------------------------------------------

  private def docsDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Brute-force suffix order: materialize every suffix, sort by
    * (suffix, doc, pos) — the oracle the distributed ranks must match.
    */
  private def bruteSa(rows: Seq[(Long, String)]): Seq[(Long, Long, Long)] =
    rows.flatMap { case (d, t) =>
      (0 until t.length).map(p => (d, p.toLong, t.substring(p)))
    }.sortBy { case (d, p, s) => (s, d, p) }
      .zipWithIndex.map { case ((d, p, _), i) => (d, p, i.toLong) }

  test("suffixRanks orders the banana suffixes exactly") {
    val got = operators.SuffixArray.suffixRanks(docsDf(1L -> "banana"),
        "doc_id", "text")
      .orderBy("sa_pos").collect().map(r => (r.getLong(1), r.getLong(2)))
    // a(5) < ana(3) < anana(1) < banana(0) < na(4) < nana(2)
    assert(got.toSeq == Seq(5L -> 0L, 3L -> 1L, 1L -> 2L, 0L -> 3L,
      4L -> 4L, 2L -> 5L))
  }

  test("suffixRanks breaks byte-identical suffix ties by (doc, pos)") {
    val got = operators.SuffixArray.suffixRanks(
        docsDf(2L -> "abab", 1L -> "abab"), "doc_id", "text")
      .orderBy("sa_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // ab(1,2) ab(2,2) abab(1,0) abab(2,0) b(1,3) b(2,3) bab(1,1) bab(2,1)
    assert(got.toSeq == Seq(1L -> 2L, 2L -> 2L, 1L -> 0L, 2L -> 0L,
      1L -> 3L, 2L -> 3L, 1L -> 1L, 2L -> 1L))
  }

  test("suffixRanks matches brute force through multiple quadrupling rounds, " +
    "independent of input partitioning") {
    // initWidth=4 with 60+-char docs forces the multicast-gather loop to
    // run (widths 4 -> 16 -> 64); planted shared spans keep classes
    // non-trivial deep into the rounds
    val rnd = new scala.util.Random(7)
    val span = "the quick brown fox jumps over the lazy dog"
    val rows = (0L until 12L).map { i =>
      val noise = (0 until 20).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      i -> (if (i % 3 == 0) noise + span else span + noise)
    }
    val exp = bruteSa(rows)
    for (parts <- Seq(1, 7)) {
      val got = operators.SuffixArray.suffixRanks(
          docsDf(rows: _*).repartition(parts), "doc_id", "text", initWidth = 4)
        .orderBy("sa_pos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq == exp, s"mismatch at $parts partitions")
    }
  }

  test("dupSpans matches an all-pairs brute force on planted repeats") {
    val rows = Seq[(Long, String)](
      1L -> ("unique preamble one THIS EXACT SPAN REPEATS VERBATIM LATER tail a"),
      2L -> ("other lead-in text THIS EXACT SPAN REPEATS VERBATIM LATER coda bb"),
      3L -> "no repetition here just some short filler words nothing shared")
    val minLen = 20; val cap = 64
    // brute force: per position, max LCP against ANY other suffix — which
    // equals the operator's max over rank-adjacent neighbors (the SA
    // adjacency property the operator relies on)
    val all = rows.flatMap { case (d, t) =>
      (0 until t.length).map(p => ((d, p), t.substring(p))) }
    def lcp(a: String, b: String): Int =
      a.zip(b).take(cap).takeWhile { case (x, y) => x == y }.size
    val expected = rows.map { case (d, t) =>
      def best(p: Int): Int = {
        val s = t.substring(p)
        (all.collect { case ((d2, p2), s2) if (d2, p2) != ((d, p)) =>
          lcp(s, s2) } :+ 0).max
      }
      val bests = (0 until t.length).map(best)
      (d, t.length.toLong, bests.count(_ >= minLen).toLong, bests.max)
    }
    val got = operators.SuffixArray.dupSpans(docsDf(rows: _*), "doc_id", "text",
        minLen, cap)
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == expected)
  }

  test("CommonPrefixLen kernel: caps, exact bounds, multi-byte boundaries") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val f = functions.CommonPrefixLen
    assert(f.lcpChars(u("abcdef"), u("abcxyz"), 64) == 3)
    assert(f.lcpChars(u("same"), u("same"), 64) == 4)
    assert(f.lcpChars(u("same"), u("same"), 2) == 2) // cap wins
    assert(f.lcpChars(u(""), u("x"), 64) == 0)
    assert(f.lcpChars(u("héllo"), u("héllx"), 64) == 4) // 2-byte é counts once
    assert(f.lcpChars(u("é"), u("è"), 64) == 0) // shared lead byte, no char
  }

  // ---- pocket perceptron training ----------------------------------------

  test("perceptron separates disjoint vocabularies perfectly and converges") {
    import operators.TextAnalysis
    val docs = docsDf((0L until 40L).map { i =>
      i -> (if (i % 2 == 0) "alpha beta gamma alpha" else "omega psi chi omega psi")
    }: _*).withColumn("y", when(col("doc_id") % 2 === 0, 1L).otherwise(-1L))
    val conf = TextAnalysis.perceptronScore(docs, "doc_id", "text",
        col("y"), dim = 16, epochs = 3)
      .groupBy("y", "pred").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // disjoint token sets: epoch 1's gradient already separates; the
    // pocket keeps it
    assert(conf == Set((1L, 1L, 20L), (-1L, -1L, 20L)), conf.toString)
  }

  test("perceptron pocket beats the final-epoch weights on oscillating data") {
    import operators.TextAnalysis
    // threshold label with unscaled-bias dynamics: plain batch perceptron
    // oscillates between all-positive and all-negative predictions; the
    // pocket must still return a candidate at least as good as epoch 0's
    // trivial classifier
    val docs = docsDf((0L until 30L).map { i =>
      i -> ("w " * (if (i < 15) 3 else 9)).trim
    }: _*).withColumn("y", when(col("doc_id") < 15, -1L).otherwise(1L))
    val conf = TextAnalysis.perceptronScore(docs, "doc_id", "text",
        col("y"), dim = 4, epochs = 4, biasScale = 5)
      .groupBy("y", "pred").agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val correct = conf.getOrElse((1L, 1L), 0L) + conf.getOrElse((-1L, -1L), 0L)
    assert(correct == 30L, s"pocket should separate this trivially: $conf")
  }

  test("perceptron fused epoch (r17) equals the two-action reference loop") {
    import operators.TextAnalysis
    import graft.functions.Fns
    // non-separable mix (threshold label + shared vocab) so the pocket
    // logic and every epoch's err/gradient ordering are all exercised
    val docs = docsDf((0L until 36L).map { i =>
      i -> (("w " * (1 + (i % 7).toInt)) + (if (i % 3 == 0) "alpha beta" else "omega")).trim
    }: _*).withColumn("y", when(col("doc_id") % 2 === 0, 1L).otherwise(-1L))
    val dim = 8; val epochs = 4; val biasScale = 5
    val got = TextAnalysis.perceptronTrain(docs, "doc_id", "text",
        col("y"), dim = dim, epochs = epochs, biasScale = biasScale)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: the pre-fusion loop — one mis.count() action, then a
    // separate gradient collect, per epoch (epochs feed forward, so any
    // fusion slip would compound into different final weights)
    val feat = {
      val tok = docs.filter(col("doc_id").isNotNull)
        .select(col("doc_id").as("doc"), col("y"),
          explode(Fns.tokens(col("text"))).as("t"))
        .filter(col("t") =!= "")
        .select(col("doc"), col("y"),
          pmod(Fns.rollingHash(col("t")), lit(dim.toLong)).as("j"))
        .groupBy("doc", "y", "j").agg(count(lit(1)).as("x"))
      val bias = docs.filter(col("doc_id").isNotNull)
        .select(col("doc_id").as("doc"), col("y"),
          lit(dim.toLong).as("j"), lit(biasScale.toLong).as("x"))
      tok.unionByName(bias).localCheckpoint()
    }
    val w = Array.fill(dim + 1)(0L)
    var pocket = w.clone()
    var bestErr = Long.MaxValue
    def mis(weights: Array[Long]) = {
      val wMap = weights.indices.map(i => i.toLong -> weights(i)).toMap
      feat.groupBy("doc", "y").agg(
          sum(element_at(typedLit(wMap), col("j")) * col("x")).as("score"))
        .filter(col("y") * col("score") <= 0L)
    }
    for (_ <- 1 to epochs) {
      val m = mis(w)
      val err = m.count()
      if (err < bestErr) { bestErr = err; pocket = w.clone() }
      feat.join(m.select("doc"), "doc")
        .groupBy("j").agg(sum(col("y") * col("x")).as("g"))
        .collect()
        .foreach(r => w(r.getAs[Long]("j").toInt) += r.getAs[Long]("g"))
    }
    if (mis(w).count() < bestErr) pocket = w
    val want = pocket.zipWithIndex.map { case (wt, j) => j.toLong -> wt }.toMap
    assert(got == want, s"fused=$got reference=$want")
  }

  // ---- executed audio resample -------------------------------------------

  test("audioResample: hand-computed boxcar digest, tail block dropped") {
    import spark.implicits._
    // mono, 9 frames, factor 4: samples s_k = (31k) % 4096 - 2048;
    // out0 = s0..s3 = -8006, out1 = s4..s7 = -7510; frame 8 dropped
    val bin = Multimodal.synthesizeWavPcm(spark,
      Seq(Multimodal.WavPcmSpec(1L, 8000, 1, 16, 9, 0)).toDS())
    val r = Multimodal.audioResample(spark, bin, 4).collect().head
    assert(r.status == "ok" && r.n_in_frames == 9 && r.n_out_frames == 2)
    assert(r.out_peak == 8006)
    assert(r.checksum == -8006L * 1 + -7510L * 2, r.toString)
    // quarantine parity with audioEnergy
    val cut = Multimodal.synthesizeWavPcm(spark,
        Seq(Multimodal.WavPcmSpec(2L, 8000, 1, 16, 9, 0)).toDS())
      .select(col("doc_id"), col("payload").substr(1, 30).as("payload"))
    val q = Multimodal.audioResample(spark, cut, 4).collect().head
    assert(q.status == "corrupt" && q.err.contains("truncated"))
  }

  // ---- Misra–Gries heavy hitters -----------------------------------------

  test("MisraGries guarantees hold under every partitioning (merge orders)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // skewed stream: 3 hot keys at ~20% each, 200 cold keys on the rest
    val stream = (0 until 5000).map { _ =>
      if (rnd.nextInt(10) < 6) s"hot${rnd.nextInt(3)}"
      else s"cold${rnd.nextInt(200)}"
    }
    val truth = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val k = 16
    val n = stream.size.toLong
    for (parts <- Seq(1, 4, 13)) {
      val mg = stream.toDF("key").repartition(parts)
        .agg(functions.Fns.misraGries(col("key"), k))
        .collect().head.getMap[String, Long](0)
      assert(mg.size <= k - 1, s"size ${mg.size} at $parts parts")
      // membership: every key above n/k must be present
      truth.filter(_._2 > n / k).keys.foreach(key =>
        assert(mg.contains(key), s"heavy $key missing at $parts parts"))
      // band: est <= true <= est + n/k for EVERY summarized key
      mg.foreach { case (key, est) =>
        val tr = truth.getOrElse(key, 0L)
        assert(est <= tr && tr <= est + n / k,
          s"bound violated for $key: est=$est true=$tr at $parts parts")
      }
    }
  }

  test("MisraGries buffer: eviction retires counters, exact below capacity") {
    import scala.collection.mutable
    val buf = mutable.HashMap.empty[String, Long]
    for (i <- 0 until 10) functions.MisraGries.offer(buf, s"k$i", 4)
    assert(buf.size <= 3)
    // below capacity the sketch is exact
    val ex = mutable.HashMap.empty[String, Long]
    for (_ <- 0 until 5) functions.MisraGries.offer(ex, "a", 4)
    for (_ <- 0 until 2) functions.MisraGries.offer(ex, "b", 4)
    assert(ex("a") == 5L && ex("b") == 2L)
    // shrink keeps at most k-1 and only subtracts
    val m = mutable.HashMap("a" -> 10L, "b" -> 7L, "c" -> 3L, "d" -> 3L, "e" -> 1L)
    functions.MisraGries.shrink(m, 4)
    assert(m.size <= 3 && m("a") == 7L && m("b") == 4L && !m.contains("e"))
  }

  // ---- Count-Min sketch ----------------------------------------------------

  test("CountMin content is bit-identical across partitionings; est >= true") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val stream = (0 until 3000).map(_ => s"k${rnd.nextInt(500)}")
    val truth = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val sketches = Seq(1, 4, 13).map { parts =>
      stream.toDF("key").repartition(parts)
        .agg(functions.Fns.countMin(col("key"), 3, 32))
        .collect().head.getSeq[Long](0)
    }
    // commutative sums: every partitioning yields the SAME matrix
    assert(sketches.distinct.size == 1)
    val cm = sketches.head
    truth.foreach { case (key, tr) =>
      val h = functions.CountMin.baseHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(key))
      val est = (0 until 3).map(i =>
        cm(i * 32 + functions.CountMin.rowSlot(h, i, 32))).min
      assert(est >= tr, s"undercount for $key: est=$est true=$tr")
    }
    // total mass per row = stream size
    (0 until 3).foreach(i =>
      assert(cm.slice(i * 32, (i + 1) * 32).sum == 3000L))
  }

  // ---- sliding windows + span corruption -----------------------------------

  test("slidingWindows: overlap content, short last window, sub-window doc") {
    import spark.implicits._
    import graft.operators.Packing
    val docs = Seq((1L, (0 until 11).map(i => s"t$i").mkString(" ")),
      (2L, "a b"), (3L, "  ")).toDF("doc_id", "text")
    val rows = Packing.slidingWindows(docs, "doc_id", "text",
        window = 4, stride = 2)
      .orderBy("doc_id", "win_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getString(4)))
    // doc 1: n=11 -> nw = 1 + ceil(7/2) = 5; starts 0,2,4,6,8
    val d1 = rows.filter(_._1 == 1L)
    assert(d1.map(_._3).toSeq == Seq(0L, 2L, 4L, 6L, 8L))
    assert(d1.map(_._4).toSeq == Seq(4, 4, 4, 4, 3)) // last short
    assert(d1(1)._5 == "t2 t3 t4 t5") // overlap window content
    assert(d1(4)._5 == "t8 t9 t10")
    // doc 2: n=2 < window -> single short window
    assert(rows.filter(_._1 == 2L).toSeq ==
      Seq((2L, 0L, 0L, 2, "a b")))
    // blank doc emits nothing
    assert(!rows.exists(_._1 == 3L))
  }

  test("spanCorruptionMask: phase shift, disjoint spans, end clipping") {
    import spark.implicits._
    import graft.operators.Packing
    val docs = Seq((0L, (0 until 10).map(_ => "w").mkString(" ")),
      (3L, (0 until 10).map(_ => "w").mkString(" ")),
      (9L, "w w")).toDF("doc_id", "text")
    val rows = Packing.spanCorruptionMask(docs, "doc_id", "text",
        spanLen = 2, every = 4)
      .orderBy("doc_id", "span_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getInt(4)))
    // doc 0 phase 0: starts 0,4,8; last span clips to 2 (10-8)
    assert(rows.filter(_._1 == 0L).toSeq == Seq(
      (0L, 0L, 0L, 2, 0), (0L, 1L, 4L, 2, 1), (0L, 2L, 8L, 2, 2)))
    // doc 3 phase 3: starts 3,7; span at 11 would exceed n=10
    assert(rows.filter(_._1 == 3L).toSeq == Seq(
      (3L, 0L, 3L, 2, 0), (3L, 1L, 7L, 2, 1)))
    // doc 9 phase 1, n=2: start 1 -> clipped to 1 token
    assert(rows.filter(_._1 == 9L).toSeq == Seq((9L, 0L, 1L, 1, 0)))
    // spans disjoint within every doc
    rows.groupBy(_._1).values.foreach { g =>
      val spans = g.map(r => (r._3, r._3 + r._4))
      spans.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(e1 <= s2)
        case _ =>
      }
    }
  }

  // ---- domain KL -----------------------------------------------------------

  test("domainKl: hand-exact micro-nats") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(("A", "x x y"), ("B", "y z")).toDF("source", "text")
    val rows = TextAnalysis.domainKl(docs, "text", "source")
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // A: x(c=2,ln(10/6)=.510826), y(c=1,ln(5/6)=-.182322)
    //    num = 2*510826 - 182322 = 839330; kl = 839330 div 3 = 279776
    // B: y(ln(5/4)=.223144), z(ln(5/2)=.916291)
    //    num = 1139435; kl = 1139435 div 2 = 569717
    assert(rows.toSeq == Seq(
      ("A", 3L, 2L, 279776L), ("B", 2L, 2L, 569717L)))
  }

  // ---- PNG chunk walk ------------------------------------------------------

  test("synthesizePngChunked writes REAL PNGs (ImageIO decodes the exact " +
      "raster); pngChunks verifies CRCs and quarantines") {
    import spark.implicits._
    val specs = Seq(
      Multimodal.PngChunkSpec(1L, 10, 6, 40, corrupt_crc = false),
      Multimodal.PngChunkSpec(2L, 10, 6, 40, corrupt_crc = true)).toDS()
    val bin = Multimodal.synthesizePngChunked(spark, specs)
    // the stored-deflate PNG is a real PNG: ImageIO decodes the pattern
    val good = bin.filter(col("doc_id") === 1L)
      .head().getAs[Array[Byte]]("payload")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(good))
    assert(img.getWidth == 10 && img.getHeight == 6)
    // raw raster samples (getRGB would gray->sRGB-convert the values)
    for (y <- 0 until 6; x <- 0 until 10)
      assert(img.getRaster.getSample(x, y, 0) == (x * 7 + y * 13 + 40) % 256)
    // chunk walk: geometry + CRC flags
    val truncated = Seq(Multimodal.BinaryDoc(3L, good.take(40))).toDF("doc_id", "payload")
    val rows = Multimodal.pngChunks(spark, bin.unionByName(truncated))
      .orderBy("doc_id", "chunk_idx").collect()
    val d1 = rows.filter(_.doc_id == 1L)
    assert(d1.map(c => (c.chunk_type, c.crc_ok)).toSeq ==
      Seq(("IHDR", true), ("IDAT", true), ("IEND", true)))
    assert(d1(1).data_len == 11L + 6 * 11 && d1(2).byte_offset == 56L + 66)
    val d2 = rows.filter(_.doc_id == 2L)
    assert(d2.map(c => (c.chunk_type, c.crc_ok)).toSeq ==
      Seq(("IHDR", true), ("IDAT", false), ("IEND", true)))
    val d3 = rows.filter(_.doc_id == 3L)
    assert(d3.length == 1 && d3.head.status == "corrupt" &&
      d3.head.chunk_idx == -1)
  }

  // ---- funnels + retention -------------------------------------------------

  test("funnelCounts: strict ordering, re-entry ignored, ppm exact") {
    import spark.implicits._
    import graft.operators.Funnels
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L), // full
      (2L, "view", 10L), (2L, "click", 5L),                         // click BEFORE view: not converted
      (3L, "view", 10L), (3L, "click", 15L),                        // no purchase
      (4L, "click", 10L), (4L, "purchase", 20L)                     // never viewed: not in funnel
    ).toDF("user_id", "event_type", "t")
    val rows = Funnels.funnelCounts(ev, "user_id", "event_type", col("t"),
        Seq("view", "click", "purchase"))
      .orderBy("step_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (1, "view", 3L, 1000000L), (2, "click", 2L, 666666L),
      (3, "purchase", 1L, 333333L)))
  }

  test("cohortRetention: first-bucket cohorts, offsets, distinct users") {
    import spark.implicits._
    import graft.operators.Funnels
    val ev = Seq(
      (1L, 0L), (1L, 86410L), (1L, 86420L), // cohort 0, active days 0,1 (dup day-1 rows collapse)
      (2L, 86400L), (2L, 172800L),          // cohort 1, days 1,2
      (3L, 10L)                             // cohort 0, day 0 only
    ).toDF("user_id", "t")
    val rows = Funnels.cohortRetention(ev, "user_id", col("t"), 86400L)
      .orderBy("cohort", "bucket_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(
      (0L, 0L, 2L), (0L, 1L, 1L), (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  // ---- silence segmentation ------------------------------------------------

  test("silenceSegments: islands split on loud windows, quarantine excluded") {
    import spark.implicits._
    val windows = Seq(
      // doc 1: silent 0,1 | loud 2 | silent 3 -> two islands
      (1L, 0L, 80, 100L, 3, 0, "ok"), (1L, 1L, 80, 90L, 5, 0, "ok"),
      (1L, 2L, 80, 99999L, 2000, 3, "ok"), (1L, 3L, 40, 10L, 7, 0, "ok"),
      // doc 2: all loud -> no islands
      (2L, 0L, 80, 99999L, 1500, 2, "ok"),
      // doc 3: quarantined -> excluded entirely
      (3L, -1L, 0, 0L, 0, 0, "corrupt")
    ).toDF("doc_id", "window_idx", "n_frames", "sum_sq", "peak", "zcross",
      "status")
    val segs = Multimodal.silenceSegments(windows, peakThreshold = 8)
      .orderBy("doc_id", "start_window").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(segs.toSeq == Seq(
      (1L, 0L, 2L, 160L, 5), (1L, 3L, 1L, 40L, 7)))
  }

  // ---- phrase search + index compression -----------------------------------

  test("phraseSearch: overlap counting, repeated terms, phrase length > 2") {
    import spark.implicits._
    import graft.operators.Retrieval
    val docs = Seq(
      (1L, "a a a b c"),   // "a a" matches at starts 0 AND 1 (overlap)
      (2L, "x a b a a x"), // "a a" at 3; "a b a" at 1
      (3L, "b c")
    ).toDF("doc_id", "text")
    val rows = Retrieval.phraseSearch(docs, "doc_id", "text",
        Map(1 -> "a a", 2 -> "a b a", 3 -> "zz"))
      .orderBy("phrase_id", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1, 1L, 2L), (1, 2L, 1L), (2, 2L, 1L)))
  }

  test("indexCompressionStats: hand-exact gamma bits and gaps") {
    import spark.implicits._
    import graft.operators.Retrieval
    // term 'q' in docs 0, 1, 5: gaps 1, 1, 4 -> gamma bits 1 + 1 + 5 = 7
    val docs = Seq((0L, "q"), (1L, "q"), (5L, "q"), (3L, "r"))
      .toDF("doc_id", "text")
    val rows = Retrieval.indexCompressionStats(docs, "doc_id", "text")
      .orderBy("term").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // 'r' in doc 3: first gap 4 -> bits 5; raw 64
    assert(rows.toSeq == Seq(
      ("q", 3L, 7L, 192L, 36458L), ("r", 1L, 5L, 64L, 78125L)))
  }

  // ---- incremental dedup ---------------------------------------------------

  test("incrementalDedup: batch first-wins + corpus anti, exact under " +
      "heavy bloom false positives") {
    import spark.implicits._
    import graft.operators.Dedup
    val batch = Seq((10L, "a"), (11L, "a"), (12L, "b"), (13L, "c"), (14L, "d"))
      .toDF("doc_id", "pkey")
    val corpus = Seq("b", "e").toDF("pkey")
    val expected = Seq(10L, 13L, 14L) // a first-wins, b in corpus, c/d new
    // normal bloom
    val got = Dedup.incrementalDedup(batch, corpus, "pkey", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == expected)
    // 64-bit bloom with 1 hash: false positives near-certain — the exact
    // confirm join must still produce the identical result
    val gotFp = Dedup.incrementalDedup(batch, corpus, "pkey", "doc_id",
        numBits = 64, numHashes = 1)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(gotFp == expected)
  }

  // ---- TF-IDF retrieval ----------------------------------------------------

  test("tfIdfTopK: hand-exact integer scores, tie-break by id, absent and " +
      "duplicate query terms") {
    import spark.implicits._
    import graft.operators.Retrieval
    val docs = Seq(
      (1L, "cat dog cat"), // tf(cat)=2
      (2L, "cat fish"),
      (3L, "dog dog dog"),
      (4L, "fish")
    ).toDF("doc_id", "text")
    // df: cat=2, dog=2, fish=2; N=4; idf = 4*1000000 div 2 = 2000000 each
    val q = Seq((0, "cat"), (0, "cat"), (0, "dog"), (1, "ghost"))
      .toDF("query_id", "term") // duplicate 'cat' must collapse; q1 empty
    val rows = Retrieval.tfIdfTopK(docs, "doc_id", "text", q, k = 3)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // q0 scores: d1 = 2*2e6 + 1*2e6 = 6e6; d3 = 3*2e6 = 6e6 (tie -> d1
    // first by id); d2 = 2e6
    assert(rows.toSeq == Seq(
      (0, 1, 1L, 6000000L), (0, 2, 3L, 6000000L), (0, 3, 2L, 2000000L)))
  }

  // ---- Aho–Corasick multi-pattern blocklist --------------------------------

  test("AhoMatcher: boundaries, phrases, case fold, overlap, edge positions") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val m = new functions.AhoMatcher(Seq("art", "slow", "table hash", "b"))
    // substring of a word must NOT count; standalone must
    assert(m.countIn(u("part of art")) == 1L)
    assert(m.countIn(u("art")) == 1L) // both boundaries at string edges
    assert(m.countIn(u("artful art smart")) == 1L)
    // phrase + its overlap with single-word patterns
    assert(m.countIn(u("table hash b")) == 2L) // phrase + 'b'
    assert(m.countIn(u("tablehash b_x")) == 0L) // no space, b followed by _
    // case-insensitive
    assert(m.countIn(u("SLOW Slow sLoW")) == 3L)
    // patterns sharing suffixes: 'b' inside word 'ab' must not count
    assert(m.countIn(u("ab b a b")) == 2L)
    assert(m.countIn(u("")) == 0L)
    assert(m.countIn(null) == 0L)
    // non-ASCII bytes reset the automaton and act as non-word boundaries
    assert(m.countIn(u("café slow éart")) == 2L)
  }

  test("MultiPatternCount stays inside whole-stage codegen and matches " +
      "interpreted eval") {
    // spark.range (not a LocalRelation, which ConvertToLocalRelation
    // would fold away before any codegen happens)
    val docs = spark.range(3).select(element_at(
      array(lit("slow table hash"), lit("part art"), lit("nothing here")),
      (col("id") + 1).cast("int")).as("text"))
    val out = docs.select(functions.Fns.multiPatternCount(col("text"),
      Seq("slow", "art", "table hash")).as("n"))
    // the `*(n)` prefix marks a WholeStageCodegen stage in the compact form
    assert(out.queryExecution.executedPlan.toString.contains("*(1) Project"),
      s"projection fell out of codegen:\n${out.queryExecution.executedPlan}")
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(2L, 1L, 0L))
  }

  // ---- HyperLogLog registers ----------------------------------------------

  test("HllRegisters content is bit-identical across partitionings and " +
      "duplicate-insensitive; registers replay from the portable hash") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val stream = (0 until 4000).map(_ => s"u${rnd.nextInt(800)}")
    val vectors = Seq(1, 4, 13).map { parts =>
      stream.toDF("key").repartition(parts)
        .agg(functions.Fns.hllRegisters(col("key"), 64))
        .collect().head.getSeq[Int](0)
    }
    assert(vectors.distinct.size == 1) // max merge: partition-independent
    val regs = vectors.head
    // idempotence: the distinct key set yields the identical vector
    val dedup = stream.distinct.toDF("key")
      .agg(functions.Fns.hllRegisters(col("key"), 64))
      .collect().head.getSeq[Int](0)
    assert(dedup == regs)
    // replay every register from the hash contract
    val expected = new Array[Int](64)
    stream.distinct.foreach { k =>
      val h = functions.CountMin.baseHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(k))
      val perm = (3L * h + 43L) % functions.CountMin.P
      val rank = if (perm == 0L) 31
        else java.lang.Long.numberOfTrailingZeros(perm) + 1
      val b = (h % 64).toInt
      if (rank > expected(b)) expected(b) = rank
    }
    assert(regs == expected.toSeq)
    assert(regs.forall(r => r >= 0 && r <= 31))
  }

  // ---- keyframe-aligned clip extraction ----------------------------------

  test("keyframeClips aggregates GOPs exactly and quarantines corrupt docs") {
    import spark.implicits._
    val sizes = Seq(9, 12, 8, 15, 10, 11, 13) // sync at frames 0 and 4
    val good = Multimodal.synthesizeMp4Samples(spark, specDs(sizes, 3, 50))
    val bad = Seq((9L, "not an mp4".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val rows = Multimodal.keyframeClips(spark, good.unionByName(bad))
      .orderBy("doc_id", "clip_idx").collect()
    assert(rows.length == 3)
    val Array(c0, c1, q) = rows
    // clip 0 = frames 0-3: starts at data region 456+4, bytes 9+12+8+15
    assert(c0.getLong(1) == 0L && c0.getLong(2) == 0L && c0.getLong(3) == 4L)
    assert(c0.getLong(4) == 460L && c0.getLong(5) == 44L)
    assert(c0.getLong(6) == 9L * 50 + 12 * 57 + 8 * 64 + 15 * 71)
    assert(c0.getLong(7) == 0L && c0.getLong(8) == 120L)
    // clip 1 = frames 4-6: frame 4 offset = 456 + 4*(4/3+1) + 44
    assert(c1.getLong(1) == 1L && c1.getLong(2) == 4L && c1.getLong(3) == 3L)
    assert(c1.getLong(4) == 508L && c1.getLong(5) == 34L)
    assert(c1.getLong(6) == 10L * 78 + 11 * 85 + 13 * 92)
    assert(c1.getLong(7) == 160L && c1.getLong(8) == 160L)
    assert(q.getLong(0) == 9L && q.getLong(1) == -1L &&
      q.getString(9) == "unsupported")
  }

  // ---- perceptual aHash -----------------------------------------------

  private def patternDs(specs: (Long, Int, Int, Int)*) = {
    import spark.implicits._
    specs.map { case (id, w, h, s) =>
      Multimodal.PatternImageSpec(id, w, h, s) }.toDS()
  }

  /** Independent replay of the aHash contract from the pattern formula —
    * per-pixel accumulate with the cross-multiplied mean compare.
    */
  private def expectedHash(w: Int, h: Int, shade: Int): (Long, Long) = {
    val cs = new Array[Long](64); val cn = new Array[Long](64)
    var tot = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val g = (x * 7 + y * 13 + shade) % 256
      val idx = (y * 8 / h) * 8 + x * 8 / w
      cs(idx) += g; cn(idx) += 1; tot += g
    }
    var hi = 0L; var lo = 0L
    for (i <- 0 until 64)
      if (cs(i) * (w.toLong * h) >= tot * cn(i)) {
        if (i < 32) hi |= 1L << (31 - i) else lo |= 1L << (63 - i)
      }
    (hi, lo)
  }

  test("perceptualHash: decoded-pixel aHash matches the formula replay; " +
      "identical rasters collide; quarantine rows are stable") {
    import spark.implicits._
    val bin = Multimodal.synthesizePatternImages(spark,
      patternDs((1L, 20, 16, 40), (2L, 20, 16, 40), (3L, 20, 16, 41),
        (4L, 33, 25, 200)))
    val cut = bin.select(col("doc_id"),
      when(col("doc_id") === 4L, col("payload").substr(1, 20))
        .otherwise(col("payload")).as("payload"))
    val small = Seq(Multimodal.BinaryDoc(5L, {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(new java.awt.image.BufferedImage(
        4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB), "png", out)
      out.toByteArray
    })).toDF("doc_id", "payload")
    val rows = Multimodal.perceptualHash(spark, cut.unionByName(small))
      .orderBy("doc_id").collect()
    val (hi1, lo1) = expectedHash(20, 16, 40)
    assert(rows(0).status == "ok" && rows(0).ahash_hi == hi1 &&
      rows(0).ahash_lo == lo1)
    assert(rows(0).ahash_hi >= 0L && rows(0).ahash_lo >= 0L) // 32-bit halves
    assert(rows(1).ahash_hi == hi1 && rows(1).ahash_lo == lo1) // identical raster
    val (hi3, lo3) = expectedHash(20, 16, 41)
    assert(rows(2).ahash_hi == hi3 && rows(2).ahash_lo == lo3)
    // +1 shade: near-identical raster, hash within a few bits
    val ham = java.lang.Long.bitCount(hi1 ^ hi3) +
      java.lang.Long.bitCount(lo1 ^ lo3)
    assert(ham <= 6, s"shade+1 drifted $ham bits")
    assert(rows(3).status == "corrupt" && rows(3).err.contains("decode_failed"))
    assert(rows(4).status == "too_small" && rows(4).ahash_hi == 0L)
  }

  // ---- PageRank -------------------------------------------------------

  test("pageRank: distributed loop == driver fast path == hand arithmetic") {
    import spark.implicits._
    import graft.operators.LinkGraph
    // 3-node cycle with one extra edge 0->2: hand-checkable
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L), (0L, 1L))
      .toDF("src", "dst") // duplicate edge must collapse
    val fast = LinkGraph.pageRank(edges, "src", "dst", iters = 3,
        scale = 1000000L)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    val dist = LinkGraph.pageRank(edges, "src", "dst", iters = 3,
        scale = 1000000L, smallGraphMaxEdges = 0L)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fast.toSeq == dist.toSeq,
      s"driver ${fast.toSeq} != distributed ${dist.toSeq}")
    // hand replay: n=3, r0=333333, base=333333*15/100=49999
    var r = Map(0L -> 333333L, 1L -> 333333L, 2L -> 333333L)
    val od = Map(0L -> 2L, 1L -> 1L, 2L -> 1L)
    val es = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L))
    for (_ <- 1 to 3) {
      val mass = es.groupBy(_._2).map { case (d, g) =>
        d -> g.map { case (s, _) => r(s) / od(s) }.sum }
      r = r.keys.map(k => k -> (49999L + 85L * mass.getOrElse(k, 0L) / 100L)).toMap
    }
    assert(fast.toMap == r, s"engine ${fast.toMap} != hand $r")
    // mass conservation (minus floor loss): total stays within n*dampDen
    // units of scale*(converging series) — sanity: all ranks positive
    assert(fast.forall(_._2 > 0))
  }

  test("perceptualNearPairs: band candidates + popcount verify, bounded " +
      "distance, no self/dup pairs") {
    import spark.implicits._
    val hashes = Seq(
      (1L, 0x12345678L, 0x0000FFFFL, "ok"),
      (2L, 0x12345678L, 0x0000FFFFL, "ok"), // distance 0 from 1
      (3L, 0x12345678L, 0x0000FF0FL, "ok"), // distance 4 from 1/2, shares 3 bands
      (4L, 0x87654321L, 0xFFFF0000L, "ok"), // far from everything
      (5L, 0x12345678L, 0x0000FFFFL, "corrupt") // quarantined: excluded
    ).toDF("doc_id", "ahash_hi", "ahash_lo", "status")
    val pairs = Multimodal.perceptualNearPairs(hashes, maxHamming = 6)
      .orderBy("id_a", "id_b").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ==
      Seq((1L, 2L, 0), (1L, 3L, 4), (2L, 3L, 4)))
  }
}
