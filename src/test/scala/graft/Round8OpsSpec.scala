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

  // ---- WordPiece vocab training ----------------------------------------

  /** Independent sequential WordPiece trainer (Schuster & Nakajima 2012
    * likelihood criterion): written map-over-vector style, no delimited-
    * replace trick, so agreement with the operator proves the SEMANTICS.
    */
  private def refWordpiece(words: Seq[String], nMerges: Int): Seq[(String, String, String, Long)] = {
    var tbl = words.filter(_.nonEmpty).groupBy(identity).toVector
      .map { case (w, ws) =>
        (w.zipWithIndex.map { case (c, i) =>
          if (i == 0) c.toString else "##" + c }.toVector, ws.size.toLong)
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, Long)]
    var done = false
    for (_ <- 1 to nMerges if !done) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val syms = scala.collection.mutable.HashMap.empty[String, Long]
      for ((s, c) <- tbl) {
        for (x <- s) syms(x) = syms.getOrElse(x, 0L) + c
        for (i <- 0 until s.length - 1)
          pairs(s(i) -> s(i + 1)) = pairs.getOrElse(s(i) -> s(i + 1), 0L) + c
      }
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), fp) = pairs.toSeq.minBy { case ((a, b), n) =>
          (-(n.toDouble / (syms(a).toDouble * syms(b).toDouble)), a, b)
        }
        out += ((l, r, l + r.stripPrefix("##"), fp))
        val merged = l + r.stripPrefix("##")
        tbl = tbl.map { case (s, c) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < s.length) {
            if (i < s.length - 1 && s(i) == l && s(i + 1) == r) {
              acc += merged; i += 2
            } else { acc += s(i); i += 1 }
          }
          (acc.toVector, c)
        }
      }
    }
    out.toSeq
  }

  test("wordpieceTrain matches the independent reference on 25 random corpora, both tiers") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    for (trial <- 0 until 25) {
      val words = Seq.fill(3 + rng.nextInt(20))(
        (0 until 1 + rng.nextInt(6)).map(_ => ('a' + rng.nextInt(3)).toChar).mkString)
      val n = 1 + rng.nextInt(5)
      val expected = refWordpiece(words, n)
      val docs = words.mkString(" ") :: Nil map Tuple1.apply toDF "text"
      def collected(df: org.apache.spark.sql.DataFrame) = df
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
      assert(collected(Vocab.wordpieceTrainDistributed(docs, "text", n)) == expected,
        s"distributed trial $trial corpus=${words.mkString(" ")} n=$n")
      assert(collected(Vocab.wordpieceTrainIncremental(docs, "text", n)) == expected,
        s"incremental trial $trial corpus=${words.mkString(" ")} n=$n")
      // deep run: most corpora exhaust every pair, exercising early stop
      assert(collected(Vocab.wordpieceTrainIncremental(docs, "text", 40)) ==
        refWordpiece(words, 40), s"incremental trial $trial n=40")
    }
  }

  test("wordpieceTrain merges favor exclusive pairs over frequent ones") {
    import spark.implicits._
    // "ab" appears 4x but a also occurs apart (az); "xy" appears 2x and
    // x,y occur ONLY together — likelihood ratio must pick (x,##y) first
    // (score 2/(2*2)=0.5 beats 4/(5*4)=0.2), where raw-frequency BPE
    // picks (a,b)
    val docs = Seq("ab ab ab ab xy xy az").toDF("text")
    val wp = Vocab.wordpieceTrain(docs, "text", 1).collect()
    assert(wp.head.getString(1) == "x" && wp.head.getString(2) == "##y")
    val bpe = Vocab.bpeTrain(docs, "text", 1).collect()
    assert(bpe.head.getString(1) == "a" && bpe.head.getString(2) == "b")
  }

  test("wordpieceTrain round-trips through wordpieceEncode with no [UNK]") {
    import spark.implicits._
    val corpus = Seq("the merge table the table scan scan the merge")
    val docs = corpus.map(Tuple1.apply).toDF("text")
    val merges = Vocab.wordpieceTrain(docs, "text", 8)
      .orderBy("merge_rank").collect().map(_.getString(3)).toSeq
    // vocab = every single character (bare + continuation) + the learned
    // pieces — the artifact a WordPiece tokenizer ships
    val chars = corpus.flatMap(_.split("\\s+")).flatMap(_.toSeq).distinct
      .flatMap(c => Seq(c.toString, "##" + c))
    val vocab = (chars ++ merges).distinct
    val idDocs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val enc = Vocab.wordpieceEncode(idDocs, "doc_id", "text", vocab).collect()
    assert(enc.nonEmpty)
    for (row <- enc) {
      val tok = row.getString(2)
      val pieces = row.getSeq[String](3)
      assert(!pieces.contains("[UNK]"), s"token $tok hit [UNK]")
      assert(pieces.head + pieces.tail.map(_.stripPrefix("##")).mkString == tok,
        s"pieces $pieces do not reconstruct $tok")
    }
    // the trained merges are actually USED: at least one multi-char piece
    assert(enc.exists(_.getSeq[String](3).exists(p => p.stripPrefix("##").length > 1)))
  }
}
