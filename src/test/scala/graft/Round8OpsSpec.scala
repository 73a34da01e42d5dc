package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Round-8 operators: WAV/RIFF + MP4 (ISO-BMFF) header decode and the
  * audio/video quarantine channel.
  */
class Round8OpsSpec extends SparkSpec {

  import Multimodal.{WavSpec, Mp4Spec}

  private def decodeOne(payload: Array[Byte]): Multimodal.AvMeta = {
    import spark.implicits._
    val df = Seq((1L, payload)).toDF("doc_id", "payload")
    Multimodal.decodeAvMeta(spark, df).collect().head
  }

  test("WAV header decode agrees with the JDK's own AudioSystem parser") {
    import spark.implicits._
    // cross-check against an INDEPENDENT public parser: javax.sound reads
    // the same RIFF bytes, so rate/channels/bits must agree exactly
    val specs = Seq(
      WavSpec(1, 8000, 1, 8, 100), WavSpec(2, 16000, 2, 16, 777),
      WavSpec(3, 44100, 2, 16, 4410), WavSpec(4, 22050, 1, 16, 221))
    val rows = Multimodal.synthesizeWav(spark, specs.toDS()).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).sortBy(_._1)
    for (((id, bytes), spec) <- rows.zip(specs)) {
      val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      assert(fmt.getFormat.getSampleRate.toInt == spec.sample_rate, s"doc $id")
      assert(fmt.getFormat.getChannels == spec.channels, s"doc $id")
      assert(fmt.getFormat.getSampleSizeInBits == spec.bits, s"doc $id")
      assert(fmt.getFrameLength == spec.n_samples, s"doc $id")
      val got = decodeOne(bytes)
      assert(got.format == "wav" && got.status == "ok")
      assert(got.sample_rate == spec.sample_rate)
      assert(got.channels == spec.channels)
      assert(got.bits_per_sample == spec.bits)
      assert(got.duration_ms == spec.n_samples * 1000L / spec.sample_rate)
    }
  }

  test("WAV quarantine: truncation and zero byte-rate get stable reasons") {
    import spark.implicits._
    val full = Multimodal.synthesizeWav(spark, Seq(WavSpec(1, 16000, 1, 16, 50)).toDS())
      .collect().head.getAs[Array[Byte]](1)
    val truncated = decodeOne(full.take(20))
    assert(truncated.status == "corrupt" && truncated.err.contains("truncated"))
    assert(truncated.format == "wav" && truncated.duration_ms == 0)
    // data chunk content cut short (declared size survives, bytes do not)
    val shortData = decodeOne(full.take(full.length - 10))
    assert(shortData.status == "corrupt" && shortData.err.contains("truncated"))
    // byte rate patched to zero: header walk succeeds, division must not
    val zeroRate = full.clone()
    for (i <- 28 until 32) zeroRate(i) = 0 // fmt byteRate field
    val bad = decodeOne(zeroRate)
    assert(bad.status == "corrupt" && bad.err.contains("bad_byte_rate"))
  }

  test("MP4 header decode recovers mvhd duration and tkhd 16.16 geometry") {
    import spark.implicits._
    val specs = Seq(Mp4Spec(1, 600, 3600, 640, 480), Mp4Spec(2, 90000, 450000, 1920, 1080))
    val rows = Multimodal.synthesizeMp4(spark, specs.toDS()).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).sortBy(_._1)
    for (((_, bytes), spec) <- rows.zip(specs)) {
      assert(bytes.length == 232)
      val got = decodeOne(bytes)
      assert(got.format == "mp4" && got.status == "ok")
      assert(got.width == spec.w && got.height == spec.h)
      assert(got.duration_ms == spec.duration_units * 1000L / spec.timescale)
    }
    val cut = decodeOne(rows.head._2.take(40))
    assert(cut.status == "corrupt" && cut.err.contains("truncated"))
  }

  test("MP4 version-1 mvhd/tkhd (64-bit times) parse at their shifted offsets") {
    // hand-built v1 boxes: the synthesis writer only emits v0, so this is
    // the only coverage of the version-1 field layout
    def box(tpe: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length).put(tpe.getBytes("ISO-8859-1")).put(body)
      bb.array()
    }
    val mvhdBody = {
      val bb = java.nio.ByteBuffer.allocate(112)
      bb.putInt(0x01000000) // version 1
      bb.putLong(0L).putLong(0L) // creation, modification (64-bit)
      bb.putInt(1000) // timescale
      bb.putLong(2500L) // duration (64-bit)
      bb.putInt(0x00010000).putShort(0x0100.toShort).put(new Array[Byte](10))
      bb.put(new Array[Byte](36)).put(new Array[Byte](24)).putInt(2)
      bb.array()
    }
    val tkhdBody = {
      val bb = java.nio.ByteBuffer.allocate(96)
      bb.putInt(0x01000000) // version 1
      bb.putLong(0L).putLong(0L) // creation, modification
      bb.putInt(1).putInt(0) // track id, reserved
      bb.putLong(2500L) // duration (64-bit)
      bb.put(new Array[Byte](8)).putShort(0).putShort(0).putShort(0).putShort(0)
      bb.put(new Array[Byte](36))
      bb.putInt(320 << 16).putInt(240 << 16)
      bb.array()
    }
    val ftyp = {
      val bb = java.nio.ByteBuffer.allocate(16)
      bb.putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
      bb.array()
    }
    val moov = box("moov", box("mvhd", mvhdBody) ++ box("trak", box("tkhd", tkhdBody)))
    val got = decodeOne(ftyp ++ moov)
    assert(got.status == "ok" && got.format == "mp4")
    assert(got.duration_ms == 2500L * 1000 / 1000)
    assert(got.width == 320 && got.height == 240)
  }

  test("payloads neither container claims fall through to a loud stub row") {
    val got = decodeOne("plain text, no container".getBytes)
    assert(got.format == "unknown" && got.status == "stub" && got.err.isEmpty)
  }
}
