package graft

import org.apache.spark.sql.functions._

/** Round-14 specs: MP3 Xing/VBRI VBR-header shortcut, AAC CRC/MPEG-2
  * variants, multi-target DSIR mixtures, and the integer-exact top-k.
  */
class Round14OpsSpec extends SparkSpec {

  test("mp3Audit: Xing/VBRI shortcut used (not walked), length check fires") {
    import spark.implicits._
    import graft.operators.Multimodal
    val specs = Seq(
      Multimodal.Mp3Spec(8L, 0, 6, 5),  // Xing
      Multimodal.Mp3Spec(9L, 1, 6, 6),  // VBRI
      Multimodal.Mp3Spec(10L, 0, 6, 7), // Xing, truncated 7 bytes
      Multimodal.Mp3Spec(8L + 14, 0, 6, 1) // ID3+VBR, same data frames as 8
    ).toDS()
    val out = Multimodal.mp3Audit(spark, Multimodal.synthesizeMp3(spark, specs))
      .collect().map(m => m.doc_id -> m).toMap
    // shortcut: declared frames EXCLUDE the tag frame — a walk of the
    // same file would count 7; data frames j use idx 1+(8+j)%14 ->
    // kbps 128,160,192,224,256,320 at 44100 Hz
    val dataBytes = Seq(128, 160, 192, 224, 256, 320)
      .map(k => 144 * k * 1000 / 44100).sum
    val total = 144 * 32 * 1000 / 44100 + dataBytes
    val durMs = 6L * 1152 * 1000 / 44100
    assert(out(8L).status === "ok" && out(8L).method === "xing")
    assert(out(8L).n_frames === 6, "declared frames, not the 7-frame walk")
    assert(out(8L).duration_ms === durMs)
    assert(out(8L).bitrate_kbps === (total * 8 / durMs).toInt)
    assert(out(9L).status === "ok" && out(9L).method === "vbri" &&
      out(9L).n_frames === 6)
    assert(out(10L).status === "corrupt" &&
      out(10L).err === Some("vbr_length_mismatch"),
      s"truncated VBR stream must fail the byte-total check, got ${out(10L)}")
    // the ID3+VBR fixture has no VBR header: still walked
    assert(out(22L).method === "walk" && out(22L).n_frames === 6)
  }

  test("aacAudit: CRC verified (flip -> crc_mismatch), MPEG-2 ID bit decoded") {
    import spark.implicits._
    import graft.operators.Multimodal
    val specs = Seq(
      Multimodal.AacExtSpec(5L, 4, 1, 2, 10, 0, 0, 0), // mpeg4, no CRC
      Multimodal.AacExtSpec(6L, 4, 1, 2, 10, 1, 0, 0), // mpeg2, no CRC
      Multimodal.AacExtSpec(7L, 4, 1, 2, 10, 0, 1, 0), // mpeg4 + CRC, clean
      Multimodal.AacExtSpec(8L, 4, 1, 2, 10, 1, 1, 5), // CRC, payload flipped
      Multimodal.AacExtSpec(9L, 4, 1, 2, 10, 0, 1, 3)  // CRC, truncated
    ).toDS()
    val out = Multimodal.aacAudit(spark,
        Multimodal.synthesizeAacExt(spark, specs))
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(5L).status === "ok" && out(5L).version === "mpeg4" &&
      out(5L).crc === "none" && out(5L).duration_ms === 232L)
    assert(out(6L).status === "ok" && out(6L).version === "mpeg2" &&
      out(6L).crc === "none" && out(6L).duration_ms === 232L,
      "MPEG-2 framing: same 1024-samples/frame timing")
    assert(out(7L).status === "ok" && out(7L).crc === "ok" &&
      out(7L).n_frames === 10)
    assert(out(8L).status === "corrupt" &&
      out(8L).err === Some("crc_mismatch"),
      s"flipped payload byte must fail CRC verify, got ${out(8L)}")
    assert(out(9L).status === "corrupt" && out(9L).err === Some("truncated"))
  }

  test("aacAudit: legacy synthesizeAac fixtures unchanged (mpeg4, none)") {
    import spark.implicits._
    import graft.operators.Multimodal
    val specs = Seq(Multimodal.AacSpec(5L, 4, 1, 2, 10, 0)).toDS()
    val out = Multimodal.aacAudit(spark,
      Multimodal.synthesizeAac(spark, specs)).collect().head
    assert(out.status === "ok" && out.version === "mpeg4" &&
      out.crc === "none" && out.duration_ms === 232L)
  }

  test("dsirMixtureWeights: per-domain weights match dsirLogWeights; argmax deterministic") {
    import graft.operators.Sampling
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    def tgt(l: String) = docs.filter(col("lang") === l)
      .select("doc_id", "text")
    val mix = Sampling.dsirMixtureWeights(docs,
        Seq("en" -> tgt("en"), "de" -> tgt("de")), "doc_id", "text", 512)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    // each domain column IS dsirLogWeights toward that target
    for (d <- Seq("en", "de")) {
      val single = Sampling.dsirLogWeights(docs, tgt(d), "doc_id", "text", 512)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      single.foreach { case (doc, (nf, lw)) =>
        val (mnf, mlw, _) = mix((doc, d))
        assert(mnf === nf && mlw === lw,
          s"doc $doc domain $d: mixture ($mnf,$mlw) != single ($nf,$lw)")
      }
    }
    // exactly one is_best per doc, and it carries the max weight
    mix.keys.map(_._1).toSeq.distinct.foreach { doc =>
      val rows = Seq("en", "de").map(d => d -> mix((doc, d)))
      val best = rows.filter(_._2._3)
      assert(best.size === 1, s"doc $doc: ${best.size} is_best rows")
      assert(best.head._2._2 === rows.map(_._2._2).max)
    }
    // target-language docs prefer their own domain on average
    val docLang = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def meanBestOwn(l: String): Double = {
      val own = docLang.filter(_._2 == l).keys.toSeq
      own.count(d => mix((d, l))._3).toDouble / own.size
    }
    assert(meanBestOwn("en") > 0.5 && meanBestOwn("de") > 0.5,
      s"argmax domain should track the doc's language: " +
        s"en=${meanBestOwn("en")} de=${meanBestOwn("de")}")
  }

  test("topKByLongScore: exact above 2^53 where a double key collapses") {
    import spark.implicits._
    import graft.functions.Fns
    val base = (1L << 53)
    // keys base+1 and base+2 are distinct longs but the SAME double
    val df = Seq((base + 1L, 10L), (base + 2L, 20L), (base - 5L, 30L))
      .toDF("key", "id")
    val got = df.groupBy()
      .agg(Fns.topKByLongScore(col("key"), col("id"), 2).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.score"), col("t.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((base + 2L, 20L), (base + 1L, 10L)),
      s"long keys must order exactly past 2^53, got $got")
  }
}
