package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Round-16 specs for the G.711 μ-law/A-law executed decode tier
  * (VERDICT r15 #6: one more real codec). Spot values are the public
  * ITU-T G.711 reference expansions (the classic public-domain g711.c
  * tables): ulaw2linear(0x00) = −32124, ulaw2linear(0xff) = 0,
  * alaw2linear(0x55) = −8, alaw2linear(0xd5) = +8.
  */
class Round16CodecSpec extends SparkSpec {
  test("G.711 expansion formulas match the public reference values") {
    assert(Multimodal.ulawToLinear(0x00) === -32124)
    assert(Multimodal.ulawToLinear(0xff) === 0)
    assert(Multimodal.ulawToLinear(0x7f) === 0)
    assert(Multimodal.ulawToLinear(0x80) === 32124)
    assert(Multimodal.alawToLinear(0x55) === -8)
    assert(Multimodal.alawToLinear(0xd5) === 8)
    assert(Multimodal.alawToLinear(0x2a) === -32256) // full-scale negative
    assert(Multimodal.alawToLinear(0xaa) === 32256)  // full-scale positive
    // μ-law decode is odd-symmetric about the sign bit
    for (u <- 0 until 128)
      assert(Multimodal.ulawToLinear(u) === -Multimodal.ulawToLinear(u | 0x80))
    // every A-law magnitude is even and ≤ 32256; μ-law ≤ 32124
    for (u <- 0 until 256) {
      assert(math.abs(Multimodal.alawToLinear(u)) <= 32256)
      assert(math.abs(Multimodal.ulawToLinear(u)) <= 32124)
    }
  }

  test("g711Audit: executed decode digests + quarantine fan-out") {
    import spark.implicits._
    val specs = Seq(
      Multimodal.G711Spec(0L, 0, 8000, 1, 40, 7, 0),  // clean μ-law mono
      Multimodal.G711Spec(1L, 1, 8000, 2, 40, 11, 0), // clean A-law stereo
      Multimodal.G711Spec(2L, 0, 8000, 1, 40, 7, 3),  // truncated
      Multimodal.G711Spec(3L, 1, 8000, 1, 40, 7, 4)   // mislabeled PCM
    ).toDS()
    val out = Multimodal.g711Audit(spark, Multimodal.synthesizeG711(spark, specs))
      .collect().sortBy(_.doc_id)
    assert(out(0).status === "ok" && out(0).codec === "ulaw")
    assert(out(0).n_frames === 40L && out(0).duration_ms === 5L)
    // digest equals a direct expansion of the same closed-form bytes
    val exp = (0 until 40).map(k => Multimodal.ulawToLinear((7 + 31 * k) % 256))
    assert(out(0).peak === exp.map(math.abs).max)
    assert(out(0).sum_abs === exp.map(v => math.abs(v).toLong).sum)
    assert(out(0).n_zero_cross ===
      exp.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0)).toLong)
    assert(out(1).status === "ok" && out(1).codec === "alaw")
    assert(out(1).channels === 2 && out(1).n_frames === 40L)
    assert(out(2).status === "corrupt" && out(2).err === Some("truncated"))
    assert(out(3).status === "unsupported" && out(3).err === Some("fmt_code_1"))
    // garbage payload: unsupported, never a task failure
    val garbage = Seq((9L, "not audio".getBytes)).toDF("doc_id", "payload")
    val g = Multimodal.g711Audit(spark, garbage).collect().head
    assert(g.status === "unsupported" && g.err === Some("bad_magic"))
  }

  test("adpcmStep: IMA reference transitions") {
    // hand-computed from the IMA spec's integer algorithm
    assert(Multimodal.adpcmStep(0, 0, 0) === (0, 0))   // zero nibble, idx clamps at 0
    assert(Multimodal.adpcmStep(0, 0, 7) === (11, 8))  // max magnitude at step 7
    assert(Multimodal.adpcmStep(0, 0, 8) === (0, 0))   // −0: sign bit alone
    assert(Multimodal.adpcmStep(0, 88, 7) === (32767, 88)) // clamp both ends
    assert(Multimodal.adpcmStep(100, 20, 5) === (168, 24)) // step 50: 6+50+12
    assert(Multimodal.adpcmStep(100, 20, 13) === (32, 24)) // same, negative
    // predictor clamps at the negative rail too
    assert(Multimodal.adpcmStep(-32768, 88, 15)._1 === -32768)
  }

  test("adpcmAudit: stateful decode ≡ reference replay, block reset, fan-out") {
    import spark.implicits._
    val specs = Seq(
      Multimodal.AdpcmSpec(0L, 8000, 12, 1, -500, 30, 7, 0), // clean 1-block
      Multimodal.AdpcmSpec(1L, 8000, 16, 2, 2000, 85, 11, 0), // clean 2-block
      Multimodal.AdpcmSpec(2L, 8000, 12, 1, 0, 0, 7, 3),     // truncated
      Multimodal.AdpcmSpec(3L, 8000, 12, 1, 0, 0, 7, 4)      // mislabeled PCM
    ).toDS()
    val out = Multimodal.adpcmAudit(spark, Multimodal.synthesizeAdpcm(spark, specs))
      .collect().sortBy(_.doc_id)
    // independent replay of the closed-form fixture through adpcmStep
    def replay(nb: Int, nblk: Int, pred0: Int, idx0: Int, seed: Int) = {
      val samples = scala.collection.mutable.ArrayBuffer[Int]()
      var pred = 0; var idx = 0
      for (b <- 0 until nblk) {
        pred = math.max(-32768, math.min(32767, pred0 + 100 * b))
        idx = (idx0 + 7 * b) % 89
        samples += pred
        for (g <- b * nb until (b + 1) * nb) {
          val bv = (seed + 31 * g) % 256
          val (p1, i1) = Multimodal.adpcmStep(pred, idx, bv & 0x0f)
          samples += p1
          val (p2, i2) = Multimodal.adpcmStep(p1, i1, bv >> 4)
          samples += p2
          pred = p2; idx = i2
        }
      }
      (samples.toSeq, pred, idx)
    }
    for ((s, o) <- Seq(specs.collect()(0), specs.collect()(1)).zip(out.take(2))) {
      val (exp, fp, fi) = replay(s.nb, s.n_blocks, s.pred0, s.idx0, s.seed)
      assert(o.status === "ok")
      assert(o.n_blocks === s.n_blocks.toLong)
      assert(o.n_samples === exp.length.toLong)
      assert(o.peak === exp.map(math.abs).max)
      assert(o.sum_abs === exp.map(v => math.abs(v).toLong).sum)
      assert(o.n_zero_cross ===
        exp.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0)).toLong)
      assert(o.final_pred === fp && o.final_idx === fi)
    }
    assert(out(2).status === "corrupt" && out(2).err === Some("truncated"))
    assert(out(3).status === "unsupported" && out(3).err === Some("fmt_code_1"))
    val g = Multimodal.adpcmAudit(spark,
      Seq((9L, "not audio".getBytes)).toDF("doc_id", "payload"))
      .collect().head
    assert(g.status === "unsupported" && g.err === Some("bad_magic"))
  }

  test("oggCrc: RFC 3533 polynomial against independent reference vectors") {
    // computed with a separate straight-from-the-spec bitwise
    // implementation (poly 0x04C11DB7, init 0, MSB-first, no reflection)
    def crc(s: Array[Byte]): Long =
      Multimodal.oggCrc(s, 0, s.length) & 0xffffffffL
    assert(crc("OggS".getBytes) === 0x5fb0a94fL)
    assert(crc("vorbis".getBytes) === 0x01eb8985L)
    assert(crc(Array.tabulate(16)(_.toByte)) === 0xfc57dd85L)
  }

  test("oggVorbisAudit: page walk, lacing, CRC witness, fan-out") {
    import spark.implicits._
    val specs = Seq(
      Multimodal.OggSpec(0L, 16000, 2, 3, 7, 0),  // clean
      Multimodal.OggSpec(1L, 16000, 1, 1, 0, 0),  // clean minimal
      Multimodal.OggSpec(2L, 16000, 2, 2, 11, 3), // truncated
      Multimodal.OggSpec(3L, 16000, 2, 2, 11, 4), // payload flip -> bad CRC
      Multimodal.OggSpec(4L, 16000, 1, 1, 5, 5),  // not vorbis
      Multimodal.OggSpec(5L, 16000, 1, 1, 5, 6)   // vorbis version 1
    ).toDS()
    val out = Multimodal.oggVorbisAudit(spark, Multimodal.synthesizeOgg(spark, specs))
      .collect().sortBy(_.doc_id)
    val c = out(0)
    assert(c.status === "ok" && c.err.isEmpty)
    assert(c.sample_rate === 16000 && c.channels === 1 && c.bitrate_nominal === 64000)
    assert(c.n_pages === 3L && c.n_packets === 6L)
    assert(c.payload_bytes ===
      (0 until 6).map(g => 1L + (7 + 17 * g) % 254).sum)
    assert(c.final_granule === 2L * 441L * 3L && c.crc_fail_pages === 0L)
    val m = out(1)
    assert(m.status === "ok" && m.n_pages === 2L && m.n_packets === 1L &&
      m.channels === 2 && m.final_granule === 441L)
    assert(out(2).status === "corrupt" && out(2).err === Some("truncated"))
    assert(out(3).status === "corrupt" && out(3).err === Some("bad_crc") &&
      out(3).crc_fail_pages === 1L)
    assert(out(4).status === "unsupported" && out(4).err === Some("not_vorbis"))
    assert(out(5).status === "unsupported" && out(5).err === Some("version_1"))
    val g = Multimodal.oggVorbisAudit(spark,
      Seq((9L, "not an ogg".getBytes)).toDF("doc_id", "payload"))
      .collect().head
    assert(g.status === "unsupported" && g.err === Some("bad_magic"))
  }

  test("flacAudit: STREAMINFO packed-bit unpack + block-walk fan-out") {
    import spark.implicits._
    val specs = Seq(
      Multimodal.FlacSpec(0L, 44100, 2, 16, 441000L, 0), // clean: 10 s
      Multimodal.FlacSpec(1L, 8000, 1, 24, 12345L, 0),
      Multimodal.FlacSpec(2L, 44100, 2, 16, 1000L, 3),   // truncated
      Multimodal.FlacSpec(3L, 44100, 2, 16, 1000L, 4),   // type 127
      Multimodal.FlacSpec(4L, 44100, 2, 16, 1000L, 5)    // no STREAMINFO
    ).toDS()
    val out = Multimodal.flacAudit(spark, Multimodal.synthesizeFlac(spark, specs))
      .collect().sortBy(_.doc_id)
    assert(out(0).status === "ok" && out(0).sample_rate === 44100 &&
      out(0).channels === 2 && out(0).bits === 16 &&
      out(0).total_samples === 441000L && out(0).duration_ms === 10000L &&
      out(0).n_blocks === 2 && out(0).has_vorbis_comment)
    assert(out(1).status === "ok" && out(1).sample_rate === 8000 &&
      out(1).channels === 1 && out(1).bits === 24 &&
      out(1).duration_ms === 12345L * 1000 / 8000)
    assert(out(2).status === "corrupt" && out(2).err === Some("truncated"))
    assert(out(3).status === "corrupt" && out(3).err === Some("bad_block_type"))
    assert(out(4).status === "corrupt" && out(4).err === Some("no_streaminfo"))
    val g = Multimodal.flacAudit(spark,
      Seq((9L, "OggS not flac".getBytes)).toDF("doc_id", "payload"))
      .collect().head
    assert(g.status === "unsupported" && g.err === Some("bad_magic"))
  }
}
