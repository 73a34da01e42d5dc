package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) travels as opaque
  * `binary` columns with typed metadata alongside. PNG/JPEG payloads are
  * decoded for REAL with the JDK's ImageIO (magic-byte reader sniffing +
  * full pixel decode); payloads no installed reader recognizes fall back to
  * the deterministic stub (marked STUB below), which keeps the pipeline
  * total and testable for formats whose codecs aren't in this environment
  * (webp, audio, video). Swapping in more codecs changes only the reader
  * layer.
  *
  * Scale posture: decode runs per-partition with no shuffle; partition
  * sizing (spark.sql.files.maxPartitionBytes) bounds peak memory per task;
  * decoded features are columnar structs so downstream pruning works.
  */
object Multimodal {

  /** Decoded-media metadata. `status` is the per-row decode outcome —
    * "ok" (real codec decode), "stub" (no installed reader claims the
    * payload; deterministic fallback), or "corrupt" (a reader claimed the
    * payload but the pixel decode failed: truncated/garbled container).
    * Corrupt rows are QUARANTINE rows: width/height are 0, `err` carries
    * the failure class, and n_bytes/content_hash still describe the raw
    * payload so the quarantine is fully accountable downstream. One bad
    * JPEG must never abort a multi-hour curation run — the reference's
    * own skip-and-account contract (connectors/csvETL.js:41-63, O4).
    */
  case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      format: String,
      width: Int,
      height: Int,
      content_hash: String,
      status: String,
      err: Option[String])

  case class BinaryDoc(doc_id: Long, payload: Array[Byte])

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  /** STUB decoder for payloads no installed ImageIO reader recognizes: a
    * real implementation would parse the container header and decode
    * frames. The fake derives deterministic "dimensions" from payload
    * bytes so the full pipeline is testable end-to-end with stable
    * results.
    */
  private def decodeStub(d: BinaryDoc): MediaMeta = {
    val n = d.payload.length.toLong
    val head = if (d.payload.nonEmpty) d.payload(0) & 0xff else 0
    val fmt = head % 3 match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "webp"
    }
    MediaMeta(d.doc_id, n, fmt, 64 + (n % 512).toInt, 64 + (head * 7 % 512),
      md5hex(d.payload), "stub", None)
  }

  /** REAL decoder: ImageIO reader sniffing (PNG/JPEG/GIF/BMP magic bytes)
    * + a full pixel decode (`reader.read`, not just the header scan), so a
    * truncated or corrupt container surfaces here rather than downstream.
    * Returns None when no installed reader claims the payload — text and
    * exotic containers fall through to [[decodeStub]]. A payload a reader
    * DOES claim but cannot decode (truncated PNG, garbage after magic) is
    * a corrupt input, not an unknown format: it becomes a QUARANTINE row
    * (status "corrupt", zero geometry, failure class in `err`) — routing
    * it through the stub's deterministic shape would mask corruption, and
    * throwing would let one bad image in 100 TB of crawled media abort a
    * multi-hour job (the wrong failure mode; skip-and-account is the
    * reference's own contract). Reported width/height come from the
    * DECODED raster; format is the reader's canonical name lower-cased
    * ("png", "jpeg").
    */
  private def decodeReal(d: BinaryDoc): Option[MediaMeta] = {
    if (d.payload.isEmpty) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(d.payload))
    if (iis == null) return None
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val img = reader.read(0)
          Some(MediaMeta(d.doc_id, d.payload.length.toLong,
            reader.getFormatName.toLowerCase(java.util.Locale.ROOT),
            img.getWidth, img.getHeight, md5hex(d.payload), "ok", None))
        } catch {
          // NonFatal, not just IOException: ImageIO readers throw
          // IIOException, EOF, IndexOutOfBounds, NegativeArraySize… on
          // adversarial bytes — all of them are data problems, none of
          // them may kill the task
          case scala.util.control.NonFatal(e) =>
            Some(MediaMeta(d.doc_id, d.payload.length.toLong,
              reader.getFormatName.toLowerCase(java.util.Locale.ROOT),
              0, 0, md5hex(d.payload), "corrupt",
              Some(e.getClass.getSimpleName)))
        } finally reader.dispose()
      }
    } finally iis.close()
  }

  /** Attach a binary payload column (here: utf-8 of text — stands in for
    * real media bytes) — the ingest shape a media pipeline would produce.
    */
  def withBinaryPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).cast("binary").as("payload"))

  /** Partition-parallel batched decode: binary column → typed metadata
    * columns. mapPartitions (not per-row UDF) so the decoder amortizes
    * per-task init — the Scala analogue of mapInPandas batch semantics.
    * Payloads an installed ImageIO reader recognizes (PNG/JPEG magic) are
    * decoded for real; everything else takes the deterministic stub.
    */
  def decodeMeta(spark: SparkSession, binDocs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    // streaming inputs: partitioning belongs to the source/trigger, and
    // .rdd (inside ensureMinParallelism) is illegal on a streaming plan —
    // the decode itself is per-row and works identically in both modes,
    // quarantine rows included (skip-and-account must hold incrementally)
    val base =
      if (binDocs.isStreaming) binDocs
      else graft.Tables.ensureMinParallelism(binDocs)
    base.as[BinaryDoc].mapPartitions { it =>
      // ImageIO's disk-backed scratch cache is pure overhead for the tiny
      // in-memory payloads a curation pass decodes — per-task init
      javax.imageio.ImageIO.setUseCache(false)
      it.map(d => decodeReal(d).getOrElse(decodeStub(d)))
    }
  }

  /** Decode accounting over [[decodeMeta]] output: per (status, format),
    * row count and quarantined byte mass (bytes of corrupt payloads only —
    * the number an operator pages on when a crawl's corruption rate
    * jumps). ONE map-side-combined aggregation over ≤ |statuses×formats|
    * groups; the audit that sizes a quarantine BEFORE anyone greps logs.
    */
  def decodeAudit(meta: DataFrame): DataFrame =
    meta.groupBy("status", "format")
      .agg(count(lit(1)).as("n"),
        sum(when(col("status") === "corrupt", col("n_bytes")).otherwise(0L))
          .cast("long").as("q_bytes"))

  /** Image-fixture synthesis: encode a REAL `fmt` ("png"/"jpeg") image of
    * the given dimensions per row, gray-filled with `shade` (0-255).
    * mapPartitions like the decoder — this is the write side of the same
    * codec layer, used by tests and the `mm_decode_real` oracle query to
    * manufacture payloads whose decoded geometry is known arithmetic.
    */
  case class ImageSpec(doc_id: Long, w: Int, h: Int, fmt: String, shade: Int)

  def synthesizeImages(spark: SparkSession, specs: Dataset[ImageSpec]): DataFrame = {
    import spark.implicits._
    graft.Tables.ensureMinParallelism(specs.toDF()).as[ImageSpec].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { s =>
        // TYPE_INT_RGB: the JDK JPEG writer rejects alpha channels
        val img = new java.awt.image.BufferedImage(
          s.w, s.h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (s.shade & 0xff) * 0x010101
        for (y <- 0 until s.h; x <- 0 until s.w) img.setRGB(x, y, rgb)
        val out = new java.io.ByteArrayOutputStream()
        require(javax.imageio.ImageIO.write(img, s.fmt, out),
          s"no ImageIO writer for format ${s.fmt}")
        BinaryDoc(s.doc_id, out.toByteArray)
      }
    }.toDF("doc_id", "payload")
  }

  // ---- audio/video container headers: REAL byte-arithmetic decode ------

  /** Decoded audio/video container metadata. Audio fields are zero for
    * video payloads and vice versa; `status`/`err` follow the same
    * skip-and-account quarantine contract as [[MediaMeta]] — `err` values
    * are STABLE reason strings ("truncated", "no_fmt_chunk", …), never
    * exception classes, so quarantine accounting is deterministic.
    */
  case class AvMeta(
      doc_id: Long,
      n_bytes: Long,
      format: String,
      duration_ms: Long,
      sample_rate: Int,
      channels: Int,
      bits_per_sample: Int,
      width: Int,
      height: Int,
      status: String,
      err: Option[String])

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def tag4(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** WAV (RIFF/WAVE) header decode — pure byte arithmetic over the public
    * container layout (Microsoft/IBM RIFF spec, 1991; the `fmt ` chunk:
    * audio format, channels, sample rate, byte rate, block align, bits per
    * sample, all little-endian; duration = data-chunk bytes / byte rate).
    * Caller guarantees the RIFF/WAVE magic. Returns (sampleRate, channels,
    * bitsPerSample, durationMs) or a stable failure reason.
    */
  private def parseWav(b: Array[Byte]): Either[String, (Int, Int, Int, Long)] = {
    var sr = -1; var ch = -1; var bits = -1; var byteRate = -1L
    var dataSize = -1L
    var partial = false // walk hit a chunk whose declared size overruns the bytes
    var o = 12L // Long cursor: a hostile 4 GiB chunk size must not overflow
    while (!partial && o + 8 <= b.length) {
      val oi = o.toInt
      val id = tag4(b, oi)
      val size = le32(b, oi + 4)
      if (o + 8 + size > b.length) {
        // a truncated fmt/data chunk is fatal to the decode; an overrun
        // trailing metadata chunk just ends the walk
        if (id == "fmt " || id == "data") return Left("truncated")
        partial = true
      } else {
        if (id == "fmt ") {
          if (size < 16) return Left("truncated")
          ch = le16(b, oi + 10)
          sr = le32(b, oi + 12).toInt
          byteRate = le32(b, oi + 16)
          bits = le16(b, oi + 22)
        } else if (id == "data") dataSize = size
        o += 8 + size + (size & 1) // chunks pad to even length
      }
    }
    if (sr < 0) Left(if (partial || o < b.length) "truncated" else "no_fmt_chunk")
    else if (dataSize < 0)
      Left(if (partial || o < b.length) "truncated" else "no_data_chunk")
    else if (byteRate <= 0) Left("bad_byte_rate")
    else Right((sr, ch, bits, dataSize * 1000L / byteRate))
  }

  /** MP4/ISO-BMFF header decode — pure byte arithmetic over the public box
    * layout (ISO/IEC 14496-12): big-endian [size, type] box walk; `moov/
    * mvhd` carries (timescale, duration), `moov/trak/tkhd` carries track
    * width/height as 16.16 fixed point. Versions 0 and 1 of both boxes are
    * handled. Caller guarantees the `ftyp` magic. Returns (durationMs,
    * width, height) or a stable failure reason.
    */
  private def parseMp4(b: Array[Byte]): Either[String, (Long, Int, Int)] = {
    var timescale = -1L; var duration = -1L; var w = -1; var h = -1
    var sawTkhd = false
    def walk(from: Int, to: Int, depth: Int): Option[String] = {
      var o = from
      while (o + 8 <= to) {
        val size = be32(b, o)
        if (size < 8) return Some("bad_box")
        if (o + size > to) return Some("truncated")
        val tpe = tag4(b, o + 4)
        val end = (o + size).toInt
        tpe match {
          case "moov" if depth == 0 =>
            val e = walk(o + 8, end, 1); if (e.isDefined) return e
          case "trak" if depth == 1 =>
            val e = walk(o + 8, end, 2); if (e.isDefined) return e
          case "mvhd" if depth == 1 =>
            if (o + 12 > to) return Some("truncated")
            val v = b(o + 8) & 0xff
            if (v == 0) {
              if (o + 28 > to) return Some("truncated")
              timescale = be32(b, o + 20); duration = be32(b, o + 24)
            } else {
              if (o + 40 > to) return Some("truncated")
              timescale = be32(b, o + 28); duration = be64(b, o + 32)
            }
          case "tkhd" if depth == 2 =>
            if (o + 12 > to) return Some("truncated")
            val v = b(o + 8) & 0xff
            val wOff = if (v == 0) o + 84 else o + 96
            if (wOff + 8 > to) return Some("truncated")
            // first track with NONZERO geometry wins: audio tkhds carry
            // width=height=0, so a file whose audio track precedes its
            // video track must not report 0x0 and mask the real geometry
            sawTkhd = true
            val tw = (be32(b, wOff) >> 16).toInt
            val th = (be32(b, wOff + 4) >> 16).toInt
            if (w <= 0 && tw > 0 && th > 0) { w = tw; h = th }
          case _ => ()
        }
        o = end
      }
      if (o != to && depth == 0) Some("truncated") else None
    }
    walk(0, b.length, 0) match {
      case Some(reason) => Left(reason)
      case None =>
        if (timescale < 0) Left("no_mvhd")
        else if (timescale == 0) Left("bad_timescale")
        else if (!sawTkhd) Left("no_tkhd")
        // tkhd(s) present but none with geometry = audio-only container:
        // a valid file, reported ok with 0x0 — not corrupt
        else Right((duration * 1000L / timescale, math.max(w, 0), math.max(h, 0)))
    }
  }

  private def wavClaims(b: Array[Byte]): Boolean =
    b.length >= 12 && tag4(b, 0) == "RIFF" && tag4(b, 8) == "WAVE"
  private def mp4Claims(b: Array[Byte]): Boolean =
    b.length >= 12 && tag4(b, 4) == "ftyp"

  /** Decode one payload's audio/video container header, or None when
    * neither magic matches (caller falls through to its stub). A payload
    * that CLAIMS wav/mp4 but fails the parse is a quarantine row, never a
    * task failure — same contract as [[decodeReal]].
    */
  private def decodeAv(d: BinaryDoc): Option[AvMeta] = {
    val b = d.payload
    val n = b.length.toLong
    if (wavClaims(b)) Some(parseWav(b) match {
      case Right((sr, ch, bits, durMs)) =>
        AvMeta(d.doc_id, n, "wav", durMs, sr, ch, bits, 0, 0, "ok", None)
      case Left(reason) =>
        AvMeta(d.doc_id, n, "wav", 0, 0, 0, 0, 0, 0, "corrupt", Some(reason))
    })
    else if (mp4Claims(b)) Some(parseMp4(b) match {
      case Right((durMs, w, h)) =>
        AvMeta(d.doc_id, n, "mp4", durMs, 0, 0, 0, w, h, "ok", None)
      case Left(reason) =>
        AvMeta(d.doc_id, n, "mp4", 0, 0, 0, 0, 0, 0, "corrupt", Some(reason))
    })
    else None
  }

  /** Partition-parallel audio/video header decode: binary column → typed
    * [[AvMeta]]. Same shape and streaming posture as [[decodeMeta]]; a
    * payload neither container claims gets a loud "stub"/"unknown" row
    * (total function — one alien payload never aborts the batch).
    */
  def decodeAvMeta(spark: SparkSession, binDocs: DataFrame): Dataset[AvMeta] = {
    import spark.implicits._
    val base =
      if (binDocs.isStreaming) binDocs
      else graft.Tables.ensureMinParallelism(binDocs)
    base.as[BinaryDoc].mapPartitions { it =>
      it.map { d =>
        decodeAv(d).getOrElse(
          AvMeta(d.doc_id, d.payload.length.toLong, "unknown",
            0, 0, 0, 0, 0, 0, "stub", None))
      }
    }
  }

  /** MPEG-1 Layer III bitrate table, kbps by header index 1–14 (index 0
    * is "free", 15 is forbidden — both quarantine). Public constants from
    * ISO/IEC 11172-3.
    */
  val Mp3Bitrates: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample rates by header index 0–2 (3 is reserved). */
  val Mp3SampleRates: Array[Int] = Array(44100, 48000, 32000)

  /** MP3 fixture spec: `cls` 0 = plain CBR, 1 = ID3v2-tagged VBR (frame j
    * uses bitrate index `1 + (doc_id + j) mod 14`), 3 = CBR cut 7 bytes
    * mid-final-frame (shortest legal frame is 96 bytes), 4 = first
    * header carries the forbidden bitrate index 15, 5 = Xing-tagged VBR
    * (a leading TAG frame at bitrate index 1 carries "Xing" + frames +
    * bytes at the MPEG-1-stereo side-info offset 36, then `n_frames`
    * VBR data frames), 6 = same with a VBRI tag (offset 36, the
    * Fraunhofer layout), 7 = Xing-tagged stream cut 7 bytes at the end
    * (declared byte total no longer matches — the O(1) integrity check
    * real VBR headers enable). CBR index is `1 + doc_id mod 14`.
    */
  case class Mp3Spec(doc_id: Long, sr_idx: Int, n_frames: Int, cls: Int)

  /** MP3 fixture synthesis: REAL MPEG-1 Layer III framing (sync + version
    * + layer + bitrate/sample-rate indices; frame length
    * `144·bitrate/rate + pad`, ISO/IEC 11172-3) with deterministic filler
    * payloads — the write side of [[mp3Audit]], so every parsed field is
    * closed-form arithmetic a SQL oracle can replay.
    */
  def synthesizeMp3(spark: SparkSession, specs: Dataset[Mp3Spec]): DataFrame = {
    import spark.implicits._
    graft.Tables.ensureMinParallelism(specs.toDF()).as[Mp3Spec].mapPartitions { it =>
      it.map { s =>
        val out = new java.io.ByteArrayOutputStream()
        if (s.cls == 1) {
          val pad = (s.doc_id % 50).toInt
          out.write("ID3".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
          out.write(Array[Byte](4, 0, 0)) // version 2.4.0, no flags
          // syncsafe 28-bit size (7 bits per byte)
          out.write((pad >> 21) & 0x7f); out.write((pad >> 14) & 0x7f)
          out.write((pad >> 7) & 0x7f); out.write(pad & 0x7f)
          (0 until pad).foreach(k => out.write((k * 7 + 3) % 128))
        }
        val sr = Mp3SampleRates(s.sr_idx)
        val vbrTagged = s.cls == 5 || s.cls == 6 || s.cls == 7
        def dataBidx(j: Int): Int =
          if (s.cls == 1 || vbrTagged) (1 + ((s.doc_id + j) % 14)).toInt
          else (1 + (s.doc_id % 14)).toInt
        if (vbrTagged) {
          // TAG frame: bitrate index 1 (32 kbps), stereo (mode 00 → side
          // info 32, tag at byte 36); declared frames = the DATA frames
          // (the tag frame itself is excluded, the LAME/Xing convention),
          // declared bytes = the whole audio stream incl. the tag frame
          val tagLen = 144 * Mp3Bitrates(1) * 1000 / sr
          val total = tagLen + (0 until s.n_frames)
            .map(j => 144 * Mp3Bitrates(dataBidx(j)) * 1000 / sr).sum
          val tag = new Array[Byte](tagLen)
          tag(0) = 0xff.toByte; tag(1) = 0xfb.toByte
          tag(2) = ((1 << 4) | (s.sr_idx << 2)).toByte
          tag(3) = 0
          def be32(a: Array[Byte], off: Int, v: Int): Unit = {
            a(off) = (v >> 24).toByte; a(off + 1) = (v >> 16).toByte
            a(off + 2) = (v >> 8).toByte; a(off + 3) = v.toByte
          }
          if (s.cls == 6) {
            // VBRI (Fraunhofer): always at header+32; version, delay,
            // quality, bytes, frames
            "VBRI".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
              .copyToArray(tag, 36)
            tag(41) = 1 // version = 1 (low byte)
            be32(tag, 46, total)
            be32(tag, 50, s.n_frames)
          } else {
            // Xing: at header + side info (32 for MPEG-1 stereo);
            // flags = frames | bytes
            "Xing".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
              .copyToArray(tag, 36)
            be32(tag, 40, 0x3)
            be32(tag, 44, s.n_frames)
            be32(tag, 48, total)
          }
          out.write(tag)
        }
        for (j <- 0 until s.n_frames) {
          val bidx = dataBidx(j)
          val frameLen = 144 * Mp3Bitrates(bidx) * 1000 / sr
          out.write(0xff); out.write(0xfb) // sync + MPEG1 + Layer III
          out.write((bidx << 4) | (s.sr_idx << 2))
          out.write(0)
          (4 until frameLen).foreach(k =>
            out.write(((s.doc_id + j * 31 + k * 7) % 251).toInt))
        }
        val bytes = out.toByteArray
        val fuzzed = s.cls match {
          case 3 | 7 => java.util.Arrays.copyOf(bytes, bytes.length - 7)
          case 4 =>
            bytes(2) = ((0xf << 4) | (s.sr_idx << 2)).toByte; bytes
          case _ => bytes
        }
        BinaryDoc(s.doc_id, fuzzed)
      }
    }.toDF("doc_id", "payload")
  }

  private def mp3Claims(b: Array[Byte]): Boolean =
    (b.length >= 3 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') ||
      (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0)

  /** MPEG-1 Layer III frame-header walk — pure byte arithmetic over the
    * public header layout (ISO/IEC 11172-3): skip an ID3v2 tag (syncsafe
    * size), then hop frame to frame by the declared length; interior
    * bytes are never inspected, so cost is O(frames), not O(bytes).
    * Returns (frames, sampleRate, mean kbps, durationMs, method) —
    * duration = frames · 1152 samples / rate — or a stable failure
    * reason (forbidden bitrate/rate index → bad_header; a declared frame
    * overrunning the payload → truncated).
    *
    * VBR-header shortcut (method "xing"/"vbri" vs "walk"): real VBR
    * corpora carry a Xing/Info tag at header + side-info offset or a
    * VBRI tag at header + 32 in the FIRST frame, declaring the stream's
    * frame and byte totals — the standard O(1) duration path (the walk
    * would be O(frames) and tools trust the header). When one is found,
    * frames/duration come from the declared frame count (the tag frame
    * itself excluded, the LAME convention), mean kbps = declared bytes
    * over duration, and the ONE cheap integrity check the header enables
    * runs: declared bytes must equal the remaining payload length, else
    * `vbr_length_mismatch` (a truncated VBR file would otherwise report
    * a silently wrong duration).
    */
  private def parseMp3(b: Array[Byte])
      : Either[String, (Int, Int, Int, Long, String)] = {
    var pos = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      pos = 10 + size
      if (pos > b.length) return Left("truncated")
    }
    // probe the first frame for a Xing/Info/VBRI header before walking
    if (pos + 4 <= b.length && (b(pos) & 0xff) == 0xff &&
      (b(pos + 1) & 0xe0) == 0xe0 && ((b(pos + 1) >> 3) & 3) == 3 &&
      ((b(pos + 1) >> 1) & 3) == 1) {
      val sridx = (b(pos + 2) >> 2) & 3
      val bidx = (b(pos + 2) >> 4) & 0xf
      if (bidx >= 1 && bidx <= 14 && sridx != 3) {
        val sr = Mp3SampleRates(sridx)
        val mode = (b(pos + 3) >> 6) & 3
        val sideInfo = if (mode == 3) 17 else 32 // MPEG-1: mono 17, else 32
        def tagAt(off: Int, magic: String): Boolean =
          pos + off + 4 <= b.length &&
            (0 until 4).forall(i => (b(pos + off + i) & 0xff) == magic(i))
        def be32(off: Int): Long =
          if (pos + off + 4 > b.length) -1L
          else ((b(pos + off) & 0xffL) << 24) | ((b(pos + off + 1) & 0xffL) << 16) |
            ((b(pos + off + 2) & 0xffL) << 8) | (b(pos + off + 3) & 0xffL)
        val xingOff = 4 + sideInfo
        val vbr: Option[(String, Long, Long)] =
          if (tagAt(xingOff, "Xing") || tagAt(xingOff, "Info")) {
            val flags = be32(xingOff + 4)
            if (flags < 0) return Left("truncated")
            // fields appear in flag order: frames (bit 0), bytes (bit 1)
            if ((flags & 3L) != 3L) None // no frame+byte totals: walk
            else {
              val frames = be32(xingOff + 8)
              val bytes = be32(xingOff + 12)
              if (frames < 0 || bytes < 0) return Left("truncated")
              Some(("xing", frames, bytes))
            }
          } else if (tagAt(36, "VBRI")) {
            val bytes = be32(46)
            val frames = be32(50)
            if (bytes < 0 || frames < 0) return Left("truncated")
            Some(("vbri", frames, bytes))
          } else None
        vbr match {
          case Some((method, frames, bytes)) =>
            if (frames <= 0) return Left("bad_header")
            if (bytes != (b.length - pos).toLong)
              return Left("vbr_length_mismatch")
            val durMs = frames * 1152L * 1000L / sr
            val kbps = if (durMs > 0) (bytes * 8L / durMs).toInt else 0
            return Right((frames.toInt, sr, kbps, durMs, method))
          case None => // fall through to the frame walk
        }
      }
    }
    var n = 0; var sr = -1; var kbpsSum = 0L
    while (pos < b.length) {
      if (pos + 4 > b.length) return Left("truncated")
      if ((b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xe0) != 0xe0)
        return Left("bad_header")
      if (((b(pos + 1) >> 3) & 3) != 3 || ((b(pos + 1) >> 1) & 3) != 1)
        return Left("unsupported_mpeg") // only MPEG-1 Layer III here
      val bidx = (b(pos + 2) >> 4) & 0xf
      val sridx = (b(pos + 2) >> 2) & 3
      if (bidx == 0 || bidx == 15 || sridx == 3) return Left("bad_header")
      val thisSr = Mp3SampleRates(sridx)
      if (sr < 0) sr = thisSr
      else if (sr != thisSr) return Left("mixed_sample_rate")
      val pad = (b(pos + 2) >> 1) & 1
      val frameLen = 144 * Mp3Bitrates(bidx) * 1000 / thisSr + pad
      if (pos + frameLen > b.length) return Left("truncated")
      kbpsSum += Mp3Bitrates(bidx)
      n += 1
      pos += frameLen
    }
    if (n == 0) Left("bad_header")
    else Right((n, sr, (kbpsSum / n).toInt, n * 1152L * 1000L / sr, "walk"))
  }

  /** Per-payload MP3 audit verdict. `method` records how duration was
    * derived: "walk" (frame-by-frame), "xing"/"vbri" (declared VBR-header
    * totals, the O(1) shortcut); "" for unsupported/corrupt rows.
    */
  case class Mp3Meta(doc_id: Long, n_bytes: Long, status: String,
      err: Option[String], n_frames: Int, sample_rate: Int,
      bitrate_kbps: Int, duration_ms: Long, method: String = "")

  /** Partition-parallel MP3 metadata audit: binary column → typed
    * [[Mp3Meta]] with the ok/unsupported/corrupt fan-out — the lossy-
    * audio sibling of the `mm_jpeg_decode` tier (VERDICT r12 #5). A
    * payload that CLAIMS the sync/ID3 magic but fails the frame walk is
    * a `corrupt` row with a stable reason, never a task failure; a
    * payload with neither magic is `unsupported`. Zero shuffle.
    */
  def mp3Audit(spark: SparkSession, binDocs: DataFrame): Dataset[Mp3Meta] = {
    import spark.implicits._
    val base =
      if (binDocs.isStreaming) binDocs
      else graft.Tables.ensureMinParallelism(binDocs)
    base.as[BinaryDoc].mapPartitions { it =>
      it.map { d =>
        val n = d.payload.length.toLong
        if (!mp3Claims(d.payload))
          Mp3Meta(d.doc_id, n, "unsupported", None, 0, 0, 0, 0L)
        else parseMp3(d.payload) match {
          case Right((frames, sr, kbps, durMs, method)) =>
            Mp3Meta(d.doc_id, n, "ok", None, frames, sr, kbps, durMs, method)
          case Left(reason) =>
            Mp3Meta(d.doc_id, n, "corrupt", Some(reason), 0, 0, 0, 0L)
        }
      }
    }
  }

  /** AAC ADTS sample-rate table by header index 0–12 (13–15 reserved —
    * quarantine). Public constants from ISO/IEC 14496-3.
    */
  val AacSampleRates: Array[Int] = Array(96000, 88200, 64000, 48000, 44100,
    32000, 24000, 22050, 16000, 12000, 11025, 8000, 7350)

  /** ADTS profile names by the 2-bit header field (MPEG-4 audio object
    * type minus one).
    */
  val AacProfiles: Array[String] = Array("main", "lc", "ssr", "ltp")

  /** AAC-ADTS fixture spec: `cls` 0 = clean stream, 3 = cut 5 bytes
    * mid-final-frame, 4 = reserved sample-rate index 15 in the first
    * header. Per-frame payload length = 20 + (doc_id + j) mod 30 bytes
    * (ADTS carries an EXPLICIT 13-bit frame length, so variable payloads
    * exercise the walk).
    */
  case class AacSpec(doc_id: Long, sr_idx: Int, profile: Int, channels: Int,
      n_frames: Int, cls: Int)

  /** ADTS fixture synthesis: REAL 7-byte ADTS headers (syncword 0xFFF,
    * MPEG-4, layer 00, no CRC; profile / sample-rate index / channel
    * configuration / explicit frame length at their ISO/IEC 14496-3 bit
    * positions) over deterministic filler payloads — the write side of
    * [[aacAudit]].
    */
  def synthesizeAac(spark: SparkSession, specs: Dataset[AacSpec]): DataFrame = {
    import spark.implicits._
    graft.Tables.ensureMinParallelism(specs.toDF()).as[AacSpec].mapPartitions { it =>
      it.map { s =>
        val out = new java.io.ByteArrayOutputStream()
        for (j <- 0 until s.n_frames) {
          val payload = 20 + ((s.doc_id + j) % 30).toInt
          val flen = 7 + payload
          val sri = if (s.cls == 4 && j == 0) 15 else s.sr_idx
          out.write(0xff)
          out.write(0xf1) // sync low 4 bits=1111, MPEG-4(0), layer 00, no-CRC(1)
          out.write((s.profile << 6) | (sri << 2) | ((s.channels >> 2) & 1))
          out.write(((s.channels & 3) << 6) | ((flen >> 11) & 3))
          out.write((flen >> 3) & 0xff)
          out.write(((flen & 7) << 5) | 0x1f) // buffer fullness high bits
          out.write(0xfc) // fullness low + frames-in-packet-1 = 0
          (0 until payload).foreach(k =>
            out.write(((s.doc_id + j * 13 + k * 11) % 251).toInt))
        }
        val bytes = out.toByteArray
        val fuzzed =
          if (s.cls == 3) java.util.Arrays.copyOf(bytes, bytes.length - 5)
          else bytes
        BinaryDoc(s.doc_id, fuzzed)
      }
    }.toDF("doc_id", "payload")
  }

  /** Extended ADTS fixture spec covering the two variants real corpora
    * add on top of [[AacSpec]]'s MPEG-4/no-CRC baseline: `mpeg2` = 1 sets
    * the ID bit (MPEG-2 AAC, ISO/IEC 13818-7 — same 1024-samples/frame
    * timing, same rate table), `crc` = 1 clears protection_absent (the
    * 9-byte header with a CRC-16 after the fixed 7 bytes — frame length
    * counts it). `cls` 0 = clean, 3 = cut 5 bytes mid-final-frame,
    * 4 = reserved sample-rate index 15, 5 = one payload byte flipped
    * AFTER the CRC was computed (the corrupt-CRC case — requires
    * crc = 1).
    */
  case class AacExtSpec(doc_id: Long, sr_idx: Int, profile: Int,
      channels: Int, n_frames: Int, mpeg2: Int, crc: Int, cls: Int)

  /** CRC-16 (poly 0x8005, init 0xFFFF, MSB-first, no reflection) over the
    * 7 fixed header bytes + the raw payload — the frame-integrity
    * contract [[synthesizeAacExt]] writes and [[parseAac]] verifies when
    * protection_absent = 0. (ISO/IEC 13818-7 defines the on-air CRC over
    * a bit-level subset; the fixture contract keeps the same polynomial
    * and failure semantics with byte-aligned coverage so the oracle can
    * predict every verdict without a bit-exact codec.)
    */
  private[operators] def adtsCrc16(bytes: Array[Byte], from: Int, until: Int,
      cont: Int = 0xffff): Int = {
    var crc = cont
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var bit = 0
      while (bit < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
        else (crc << 1) & 0xffff
        bit += 1
      }
      i += 1
    }
    crc
  }

  /** ADTS fixture synthesis for [[AacExtSpec]] — REAL 7- or 9-byte ADTS
    * headers with the ID (MPEG-2/4) and protection_absent bits at their
    * ISO positions; CRC-protected frames carry the [[adtsCrc16]] of
    * header + payload in the 2 bytes after the fixed header, and the
    * frame length field counts them.
    */
  def synthesizeAacExt(spark: SparkSession,
      specs: Dataset[AacExtSpec]): DataFrame = {
    import spark.implicits._
    graft.Tables.ensureMinParallelism(specs.toDF()).as[AacExtSpec]
      .mapPartitions { it =>
        it.map { s =>
          val out = new java.io.ByteArrayOutputStream()
          for (j <- 0 until s.n_frames) {
            val payload = new Array[Byte](20 + ((s.doc_id + j) % 30).toInt)
            payload.indices.foreach(k =>
              payload(k) = ((s.doc_id + j * 13 + k * 11) % 251).toByte)
            val hdrLen = if (s.crc == 1) 9 else 7
            val flen = hdrLen + payload.length
            val sri = if (s.cls == 4 && j == 0) 15 else s.sr_idx
            val hdr = new Array[Byte](hdrLen)
            hdr(0) = 0xff.toByte
            hdr(1) = (0xf0 | (s.mpeg2 << 3) | (1 - s.crc)).toByte
            hdr(2) = ((s.profile << 6) | (sri << 2) |
              ((s.channels >> 2) & 1)).toByte
            hdr(3) = (((s.channels & 3) << 6) | ((flen >> 11) & 3)).toByte
            hdr(4) = ((flen >> 3) & 0xff).toByte
            hdr(5) = (((flen & 7) << 5) | 0x1f).toByte
            hdr(6) = 0xfc.toByte
            if (s.crc == 1) {
              val crc = adtsCrc16(payload, 0, payload.length,
                adtsCrc16(hdr, 0, 7))
              hdr(7) = (crc >> 8).toByte
              hdr(8) = crc.toByte
              // cls 5: flip a payload byte AFTER the CRC — the mismatch
              if (s.cls == 5 && j == 0) payload(0) = (payload(0) ^ 0xff).toByte
            }
            out.write(hdr); out.write(payload)
          }
          val bytes = out.toByteArray
          val fuzzed =
            if (s.cls == 3) java.util.Arrays.copyOf(bytes, bytes.length - 5)
            else bytes
          BinaryDoc(s.doc_id, fuzzed)
        }
      }.toDF("doc_id", "payload")
  }

  private def aacClaims(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xf0) == 0xf0

  /** ADTS frame-header walk: hop by the explicit 13-bit frame length;
    * duration = frames · 1024 samples / rate. Returns (frames, rate,
    * profile, channels, durationMs, version, crc) or a stable failure
    * reason. The ID bit selects MPEG-4 vs MPEG-2 framing (version
    * "mpeg4"/"mpeg2" — same timing, both walked); protection_absent = 0
    * means a 9-byte header whose trailing CRC-16 is VERIFIED against
    * [[adtsCrc16]] of the fixed header + payload — a flipped payload
    * byte yields `crc_mismatch`, not a silently-ok row. `crc` output is
    * "ok" when every frame carried a verified CRC, "none" when no frame
    * did, "mixed" otherwise.
    */
  private def parseAac(b: Array[Byte])
      : Either[String, (Int, Int, String, Int, Long, String, String)] = {
    var pos = 0
    var n = 0; var sr = -1; var prof = -1; var ch = -1; var ver = -1
    var crcFrames = 0
    while (pos < b.length) {
      if (pos + 7 > b.length) return Left("truncated")
      if ((b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xf0) != 0xf0)
        return Left("bad_header")
      val thisVer = (b(pos + 1) >> 3) & 1 // ID bit: 0 = MPEG-4, 1 = MPEG-2
      if (ver < 0) ver = thisVer
      else if (ver != thisVer) return Left("mixed_version")
      val protAbsent = b(pos + 1) & 1
      val hdrLen = if (protAbsent == 1) 7 else 9
      val sri = (b(pos + 2) >> 2) & 0xf
      if (sri >= AacSampleRates.length) return Left("bad_header")
      val thisSr = AacSampleRates(sri)
      if (sr < 0) sr = thisSr
      else if (sr != thisSr) return Left("mixed_sample_rate")
      val thisProf = (b(pos + 2) >> 6) & 3
      if (prof < 0) prof = thisProf
      val thisCh = ((b(pos + 2) & 1) << 2) | ((b(pos + 3) >> 6) & 3)
      if (ch < 0) ch = thisCh
      val flen = ((b(pos + 3) & 3) << 11) | ((b(pos + 4) & 0xff) << 3) |
        ((b(pos + 5) >> 5) & 7)
      if (flen < hdrLen) return Left("bad_header")
      if (pos + flen > b.length) return Left("truncated")
      if (protAbsent == 0) {
        val stored = ((b(pos + 7) & 0xff) << 8) | (b(pos + 8) & 0xff)
        val computed = adtsCrc16(b, pos + 9, pos + flen,
          adtsCrc16(b, pos, pos + 7))
        if (stored != computed) return Left("crc_mismatch")
        crcFrames += 1
      }
      n += 1
      pos += flen
    }
    if (n == 0) Left("bad_header")
    else Right((n, sr, AacProfiles(prof), ch, n * 1024L * 1000L / sr,
      if (ver == 1) "mpeg2" else "mpeg4",
      if (crcFrames == 0) "none" else if (crcFrames == n) "ok" else "mixed"))
  }

  /** Per-payload AAC-ADTS audit verdict. `version` is the header ID bit
    * ("mpeg4"/"mpeg2"); `crc` reports frame protection ("none"/"ok"/
    * "mixed", "" for unsupported/corrupt rows).
    */
  case class AacMeta(doc_id: Long, n_bytes: Long, status: String,
      err: Option[String], n_frames: Int, sample_rate: Int, profile: String,
      channels: Int, duration_ms: Long, version: String = "",
      crc: String = "")

  /** Partition-parallel AAC-ADTS metadata audit — [[mp3Audit]]'s sibling
    * for the other dominant lossy-audio codec: same ok/unsupported/
    * corrupt fan-out, same zero-shuffle byte walk (O(frames) via the
    * explicit ADTS frame-length field).
    */
  def aacAudit(spark: SparkSession, binDocs: DataFrame): Dataset[AacMeta] = {
    import spark.implicits._
    val base =
      if (binDocs.isStreaming) binDocs
      else graft.Tables.ensureMinParallelism(binDocs)
    base.as[BinaryDoc].mapPartitions { it =>
      it.map { d =>
        val n = d.payload.length.toLong
        if (!aacClaims(d.payload))
          AacMeta(d.doc_id, n, "unsupported", None, 0, 0, "", 0, 0L)
        else parseAac(d.payload) match {
          case Right((frames, sr, prof, ch, durMs, ver, crc)) =>
            AacMeta(d.doc_id, n, "ok", None, frames, sr, prof, ch, durMs,
              ver, crc)
          case Left(reason) =>
            AacMeta(d.doc_id, n, "corrupt", Some(reason), 0, 0, "", 0, 0L)
        }
      }
    }
  }

  /** WAV fixture synthesis: a REAL RIFF/WAVE container (44-byte canonical
    * header + silent PCM data) per spec row — the write side of
    * [[decodeAvMeta]]'s WAV parser, used by tests and the
    * `mm_decode_audio` oracle so decoded geometry is known arithmetic.
    */
  case class WavSpec(doc_id: Long, sample_rate: Int, channels: Int,
      bits: Int, n_samples: Int)

  def synthesizeWav(spark: SparkSession, specs: Dataset[WavSpec]): DataFrame = {
    import spark.implicits._
    graft.Tables.ensureMinParallelism(specs.toDF()).as[WavSpec].mapPartitions { it =>
      it.map { s =>
        val blockAlign = s.channels * s.bits / 8
        val dataSize = s.n_samples * blockAlign
        val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
        bb.put("fmt ".getBytes).putInt(16)
          .putShort(1) // PCM
          .putShort(s.channels.toShort)
          .putInt(s.sample_rate)
          .putInt(s.sample_rate * blockAlign) // byte rate
          .putShort(blockAlign.toShort)
          .putShort(s.bits.toShort)
        bb.put("data".getBytes).putInt(dataSize)
        // silence payload (zeros) — content is irrelevant to header decode
        BinaryDoc(s.doc_id, bb.array())
      }
    }.toDF("doc_id", "payload")
  }

  /** WAV fixture synthesis with a DETERMINISTIC PCM payload — the write
    * side of [[audioEnergy]]'s sample decoder. Frame `k`, channel `c`
    * carries the 16-bit sample `((seed + 31·k + 17·c) mod 4096) − 2048`
    * (interleaved little-endian, the RIFF PCM layout), so every energy/
    * peak/zero-crossing statistic the decoder extracts is closed-form
    * arithmetic a SQL oracle can replay with `unnest(range(...))`. 8-bit
    * specs write `(seed + 31·k + 17·c) mod 256` unsigned bytes — a VALID
    * container the 16-bit-only executed tier must refuse as
    * `unsupported`, not misread.
    */
  case class WavPcmSpec(doc_id: Long, sample_rate: Int, channels: Int,
      bits: Int, n_frames: Int, seed: Int)

  def synthesizeWavPcm(spark: SparkSession, specs: Dataset[WavPcmSpec]): DataFrame = {
    import spark.implicits._
    graft.Tables.ensureMinParallelism(specs.toDF()).as[WavPcmSpec].mapPartitions { it =>
      it.map { s =>
        require(s.bits == 16 || s.bits == 8, s"bits ${s.bits}")
        val blockAlign = s.channels * s.bits / 8
        val dataSize = s.n_frames * blockAlign
        val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
        bb.put("fmt ".getBytes).putInt(16)
          .putShort(1).putShort(s.channels.toShort)
          .putInt(s.sample_rate).putInt(s.sample_rate * blockAlign)
          .putShort(blockAlign.toShort).putShort(s.bits.toShort)
        bb.put("data".getBytes).putInt(dataSize)
        var k = 0
        while (k < s.n_frames) {
          var c = 0
          while (c < s.channels) {
            val v = (s.seed + 31 * k + 17 * c) % 4096 - 2048
            if (s.bits == 16) bb.putShort(v.toShort)
            else bb.put(((s.seed + 31 * k + 17 * c) % 256).toByte)
            c += 1
          }
          k += 1
        }
        BinaryDoc(s.doc_id, bb.array())
      }
    }.toDF("doc_id", "payload")
  }

  /** Hand-written PNG with STORED-deflate IDAT — every chunk length and
    * offset is closed-form arithmetic of (w, h), which is what lets a
    * relational oracle predict the whole chunk inventory without
    * decompressing anything: raw scanlines are h·(w+1) bytes (filter
    * byte + w gray bytes), the zlib stream wraps them in one stored
    * block (2-byte header + 5-byte block header + raw + 4-byte adler),
    * and the file is signature ‖ IHDR(13) ‖ IDAT ‖ IEND with the
    * standard 12 bytes of framing per chunk. CRCs are REAL (CRC32 of
    * type‖data); `corrupt_crc` flips the last IDAT data byte after the
    * CRC is computed — a valid container whose checksum lies, the case
    * an integrity audit exists for.
    */
  case class PngChunkSpec(doc_id: Long, w: Int, h: Int, shade: Int,
      corrupt_crc: Boolean)

  def synthesizePngChunked(spark: SparkSession,
      specs: Dataset[PngChunkSpec]): DataFrame = {
    import spark.implicits._
    graft.Tables.ensureMinParallelism(specs.toDF()).as[PngChunkSpec]
      .mapPartitions { it =>
        it.map { s =>
          require(s.w >= 1 && s.h >= 1 && s.h * (s.w + 1) <= 60000,
            "stored-deflate fixture needs one block")
          val raw = new Array[Byte](s.h * (s.w + 1))
          var i = 0
          for (y <- 0 until s.h) {
            raw(i) = 0; i += 1 // filter: None
            for (x <- 0 until s.w) {
              raw(i) = ((x * 7 + y * 13 + s.shade) % 256).toByte; i += 1
            }
          }
          val adler = { val a = new java.util.zip.Adler32(); a.update(raw); a.getValue }
          val idat = java.nio.ByteBuffer.allocate(2 + 5 + raw.length + 4)
          idat.put(0x78.toByte).put(0x01.toByte)
            .put(0x01.toByte) // BFINAL=1, BTYPE=00 (stored)
            .put((raw.length & 0xff).toByte).put(((raw.length >> 8) & 0xff).toByte)
            .put(((~raw.length) & 0xff).toByte).put((((~raw.length) >> 8) & 0xff).toByte)
            .put(raw)
            .putInt(adler.toInt)
          val ihdr = java.nio.ByteBuffer.allocate(13)
            .putInt(s.w).putInt(s.h)
            .put(8.toByte).put(0.toByte) // 8-bit grayscale
            .put(0.toByte).put(0.toByte).put(0.toByte)
          def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
            val crc = new java.util.zip.CRC32()
            crc.update(tpe.getBytes("US-ASCII")); crc.update(data)
            java.nio.ByteBuffer.allocate(12 + data.length)
              .putInt(data.length).put(tpe.getBytes("US-ASCII"))
              .put(data).putInt(crc.getValue.toInt).array()
          }
          val idatBytes = chunk("IDAT", idat.array())
          if (s.corrupt_crc) // flip last DATA byte, after the CRC
            idatBytes(idatBytes.length - 5) =
              (idatBytes(idatBytes.length - 5) ^ 0x01).toByte
          val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
            .map(_.toByte)
          BinaryDoc(s.doc_id,
            sig ++ chunk("IHDR", ihdr.array()) ++ idatBytes ++
              chunk("IEND", Array.emptyByteArray))
        }
      }.toDF("doc_id", "payload")
  }

  /** One PNG chunk inventory row; quarantine rows carry chunk_idx −1. */
  case class PngChunk(doc_id: Long, chunk_idx: Int, chunk_type: String,
      data_len: Long, byte_offset: Long, crc_ok: Boolean, status: String)

  /** Real PNG container walk with EXECUTED CRC verification — the image
    * sibling of the MP4 stbl demux and RIFF audio parse: signature
    * check, then (length, type, data, crc) frames walked with strict
    * bounds; `crc_ok` recomputes CRC32 over type‖data and compares to
    * the stored value (a container whose structure parses but whose
    * checksum lies is exactly what an ingest audit must flag, not
    * decode). Truncated/garbled payloads quarantine as a single
    * 'corrupt' row; the walk stops cleanly at IEND. mapPartitions,
    * zero shuffles, streaming-safe.
    */
  def pngChunks(spark: SparkSession, binDocs: DataFrame): Dataset[PngChunk] = {
    import spark.implicits._
    val base =
      if (binDocs.isStreaming) binDocs
      else graft.Tables.ensureMinParallelism(binDocs)
    base.as[BinaryDoc].flatMap { d =>
      val b = d.payload
      def bad(status: String) =
        Seq(PngChunk(d.doc_id, -1, "", 0L, 0L, crc_ok = false, status))
      val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      if (b.length < 8 || !sig.indices.forall(i => b(i) == sig(i).toByte))
        bad("unsupported")
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[PngChunk]
        var off = 8
        var idx = 0
        var done = false
        var corrupt = false
        while (!done && !corrupt) {
          if (off + 8 > b.length) corrupt = true
          else {
            val len = ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
              ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
            if (len < 0 || off + 12 + len > b.length) corrupt = true
            else {
              val tpe = new String(b, off + 4, 4, "US-ASCII")
              if (!tpe.forall(c => c.isLetter)) corrupt = true
              else {
                val crc = new java.util.zip.CRC32()
                crc.update(b, off + 4, 4 + len)
                val stored = ((b(off + 8 + len) & 0xffL) << 24) |
                  ((b(off + 9 + len) & 0xffL) << 16) |
                  ((b(off + 10 + len) & 0xffL) << 8) |
                  (b(off + 11 + len) & 0xffL)
                out += PngChunk(d.doc_id, idx, tpe, len.toLong, off.toLong,
                  crc_ok = (crc.getValue & 0xffffffffL) == stored, "ok")
                if (tpe == "IEND") done = true
                off += 12 + len
                idx += 1
              }
            }
          }
        }
        if (corrupt) bad("corrupt") else out.toSeq
      }
    }
  }

  /** Burst-modulated PCM fixture: the [[synthesizeWavPcm]] waveform
    * gated into loud/loud/QUIET stretches of `burst_frames` frames
    * (`(k div burst) mod 3 == 2` ⇒ amplitude ±4 instead of ±2048) — the
    * deterministic fixture a silence-detection oracle can replay.
    * 16-bit mono/stereo only.
    */
  case class WavPcmBurstSpec(doc_id: Long, sample_rate: Int, channels: Int,
      n_frames: Int, seed: Int, burst_frames: Int)

  def synthesizeWavPcmBursts(spark: SparkSession,
      specs: Dataset[WavPcmBurstSpec]): DataFrame = {
    import spark.implicits._
    graft.Tables.ensureMinParallelism(specs.toDF()).as[WavPcmBurstSpec]
      .mapPartitions { it =>
        it.map { s =>
          require(s.burst_frames > 0)
          val blockAlign = s.channels * 2
          val dataSize = s.n_frames * blockAlign
          val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
          bb.put("fmt ".getBytes).putInt(16)
            .putShort(1).putShort(s.channels.toShort)
            .putInt(s.sample_rate).putInt(s.sample_rate * blockAlign)
            .putShort(blockAlign.toShort).putShort(16)
          bb.put("data".getBytes).putInt(dataSize)
          var k = 0
          while (k < s.n_frames) {
            val quiet = (k / s.burst_frames) % 3 == 2
            var c = 0
            while (c < s.channels) {
              val base = s.seed + 31 * k + 17 * c
              val v = if (quiet) base % 9 - 4 else base % 4096 - 2048
              bb.putShort(v.toShort)
              c += 1
            }
            k += 1
          }
          BinaryDoc(s.doc_id, bb.array())
        }
      }.toDF("doc_id", "payload")
  }

  /** Silence segmentation over [[audioEnergy]] windows — the
    * voice-activity-style trim step an audio-curation pipeline runs
    * before transcription: maximal runs of consecutive windows whose
    * peak |sample| is below `peakThreshold`, as
    * (doc_id, start_window, n_windows, n_frames, max_peak).
    *
    * The classic gaps-and-islands formulation: silent windows ranked
    * within their doc, island key = window_idx − rank (constant within
    * a run), one keyed agg per island. The rank window partitions BY
    * DOC — bounded by windows-per-doc, never corpus-wide.
    */
  def silenceSegments(windows: DataFrame, peakThreshold: Int): DataFrame = {
    require(peakThreshold > 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("window_idx")
    windows
      .filter(col("status") === "ok" && col("peak") < peakThreshold)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__grp", col("window_idx") - col("__rn"))
      .groupBy("doc_id", "__grp")
      .agg(min("window_idx").as("start_window"),
        count(lit(1)).as("n_windows"),
        sum(col("n_frames").cast("long")).as("n_frames"),
        max("peak").as("max_peak"))
      .drop("__grp")
  }

  /** One decoded-audio analysis window: frames `[window_idx·W,
    * window_idx·W + n_frames)`, with integer-exact signal statistics —
    * `sum_sq` = Σ s² over every (frame, channel) sample in the window,
    * `peak` = max |s|, `zcross` = channel-0 sign-boundary crossings
    * WITHIN the window (frame w·W+1 onward — windows are independent, so
    * the stat is embarrassingly parallel at any scale). Quarantine rows
    * carry window_idx −1 and zeroed stats.
    */
  case class AudioWindow(doc_id: Long, window_idx: Long, n_frames: Int,
      sum_sq: Long, peak: Int, zcross: Int, status: String, err: Option[String])

  /** EXECUTED audio tier: parse the RIFF container, decode the REAL
    * interleaved 16-bit PCM frames from the `data` chunk, and emit
    * per-window integer-exact energy/peak/zero-crossing rows — the audio
    * sibling of the pixel-executing [[resizeExec]] (same skip-and-account
    * quarantine contract, same mapPartitions shape: zero shuffles, peak
    * decode memory bounded by the partition's largest payload, streaming-
    * safe). Status fan-out: `ok`; `unsupported` for valid containers the
    * tier doesn't decode (compressed fmt codes, non-16-bit PCM);
    * `corrupt` for bad magic, truncated fmt/data chunks, or a data chunk
    * that is not a whole number of frames (`ragged_data`).
    */
  def audioEnergy(spark: SparkSession, binDocs: DataFrame,
      windowFrames: Int): Dataset[AudioWindow] = {
    import spark.implicits._
    require(windowFrames > 0, s"windowFrames $windowFrames")
    val base =
      if (binDocs.isStreaming) binDocs
      else graft.Tables.ensureMinParallelism(binDocs)
    base.as[BinaryDoc].mapPartitions { it =>
      it.flatMap { d =>
        def bad(status: String, reason: String) =
          Seq(AudioWindow(d.doc_id, -1L, 0, 0L, 0, 0, status, Some(reason)))
        val b = d.payload
        if (!wavClaims(b)) bad("corrupt", "bad_magic")
        else parseWavData(b) match {
          case Left(reason) => bad("corrupt", reason)
          case Right((_, ch, bits, fmtCode, dataOff, dataLen)) =>
            if (fmtCode != 1) bad("unsupported", s"fmt_code_$fmtCode")
            else if (bits != 16) bad("unsupported", s"bits_$bits")
            else {
              val blockAlign = ch * 2
              if (dataLen % blockAlign != 0) bad("corrupt", "ragged_data")
              else {
                val nFrames = (dataLen / blockAlign).toInt
                val nWin = (nFrames + windowFrames - 1) / windowFrames
                (0 until nWin).map { w =>
                  val f0 = w * windowFrames
                  val f1 = math.min(f0 + windowFrames, nFrames)
                  var sumSq = 0L; var peak = 0; var zc = 0
                  var prevNonNeg = false
                  var k = f0
                  while (k < f1) {
                    var c = 0
                    while (c < ch) {
                      val o = dataOff + k * blockAlign + c * 2
                      val v = (le16(b, o) << 16) >> 16 // sign-extend
                      sumSq += v.toLong * v
                      val a = math.abs(v)
                      if (a > peak) peak = a
                      if (c == 0) {
                        val nonNeg = v >= 0
                        if (k > f0 && nonNeg != prevNonNeg) zc += 1
                        prevNonNeg = nonNeg
                      }
                      c += 1
                    }
                    k += 1
                  }
                  AudioWindow(d.doc_id, w.toLong, f1 - f0, sumSq, peak, zc,
                    "ok", None)
                }
              }
            }
        }
      }
    }
  }

  /** One EXECUTED-resample digest per audio doc: the decimated signal's
    * shape and content pinned in a single row. `out[t][c]` is the boxcar
    * sum of `factor` consecutive decoded samples (anti-alias prefilter +
    * downsample in one integer step — the sum is the mean scaled by
    * `factor`, kept UNDIVIDED so the arithmetic is exact in both engines
    * with no floor/truncation-semantics edge); the trailing partial block
    * is dropped (full blocks only, the standard decimator contract).
    * `checksum` = Σ out[t][c]·(t·ch + c + 1) — position-weighted like the
    * image-resize checksum, so any mis-addressed or mis-summed sample
    * anywhere breaks it; `out_peak` = max |out| over every (t, c).
    */
  case class AudioResample(doc_id: Long, n_in_frames: Int, n_out_frames: Int,
      out_peak: Int, checksum: Long, status: String, err: Option[String])

  /** EXECUTED integer decimation over real RIFF/WAVE PCM payloads — the
    * audio sibling of the pixel-executing [[resizeExec]]: parses the
    * container, decodes the ACTUAL 16-bit little-endian samples, and
    * computes the [[AudioResample]] digest of the factor-decimated
    * signal. Same skip-and-account quarantine tier as [[audioEnergy]]
    * (bad magic / truncated / ragged → corrupt; non-PCM / non-16-bit →
    * unsupported); mapPartitions, zero shuffles, streaming-safe.
    */
  def audioResample(spark: SparkSession, binDocs: DataFrame,
      factor: Int): Dataset[AudioResample] = {
    import spark.implicits._
    require(factor > 0, s"factor $factor")
    val base =
      if (binDocs.isStreaming) binDocs
      else graft.Tables.ensureMinParallelism(binDocs)
    base.as[BinaryDoc].mapPartitions { it =>
      it.map { d =>
        def bad(status: String, reason: String) =
          AudioResample(d.doc_id, 0, 0, 0, 0L, status, Some(reason))
        val b = d.payload
        if (!wavClaims(b)) bad("corrupt", "bad_magic")
        else parseWavData(b) match {
          case Left(reason) => bad("corrupt", reason)
          case Right((_, ch, bits, fmtCode, dataOff, dataLen)) =>
            if (fmtCode != 1) bad("unsupported", s"fmt_code_$fmtCode")
            else if (bits != 16) bad("unsupported", s"bits_$bits")
            else {
              val blockAlign = ch * 2
              if (dataLen % blockAlign != 0) bad("corrupt", "ragged_data")
              else {
                val nIn = (dataLen / blockAlign).toInt
                val nOut = nIn / factor
                var peak = 0
                var cks = 0L
                var t = 0
                while (t < nOut) {
                  var c = 0
                  while (c < ch) {
                    var o = 0L
                    var i = 0
                    while (i < factor) {
                      val off = dataOff + (t * factor + i) * blockAlign + c * 2
                      o += (le16(b, off) << 16) >> 16 // sign-extend
                      i += 1
                    }
                    val a = math.abs(o)
                    if (a > peak) peak = a.toInt
                    cks += o * (t.toLong * ch + c + 1)
                    c += 1
                  }
                  t += 1
                }
                AudioResample(d.doc_id, nIn, nOut, peak, cks, "ok", None)
              }
            }
        }
      }
    }
  }

  /** [[parseWav]]'s walk, additionally surfacing the fmt code and the
    * `data` chunk's byte span — what an executed decode needs that a
    * header decode does not. Returns (sampleRate, channels, bits,
    * fmtCode, dataOffset, dataSize) or the same stable reasons.
    */
  private def parseWavData(
      b: Array[Byte]): Either[String, (Int, Int, Int, Int, Int, Long)] = {
    var sr = -1; var ch = -1; var bits = -1; var fmtCode = -1
    var dataOff = -1; var dataSize = -1L
    var partial = false
    var o = 12L
    while (!partial && o + 8 <= b.length) {
      val oi = o.toInt
      val id = tag4(b, oi)
      val size = le32(b, oi + 4)
      if (o + 8 + size > b.length) {
        if (id == "fmt " || id == "data") return Left("truncated")
        partial = true
      } else {
        if (id == "fmt ") {
          if (size < 16) return Left("truncated")
          fmtCode = le16(b, oi + 8)
          ch = le16(b, oi + 10)
          sr = le32(b, oi + 12).toInt
          bits = le16(b, oi + 22)
        } else if (id == "data") { dataOff = oi + 8; dataSize = size }
        o += 8 + size + (size & 1)
      }
    }
    if (sr < 0) Left(if (partial || o < b.length) "truncated" else "no_fmt_chunk")
    else if (dataSize < 0)
      Left(if (partial || o < b.length) "truncated" else "no_data_chunk")
    else Right((sr, ch, bits, fmtCode, dataOff, dataSize))
  }

  // ---- G.711 companded telephony audio: REAL μ-law/A-law decode --------
  // ITU-T G.711 (1972/1988; the public 8-bit logarithmic PCM codecs WAV
  // carries as fmt codes 7 and 6). Decode is closed-form integer
  // arithmetic per byte (the classic Sun g711.c public-domain tables'
  // generating formulas), so a SQL oracle can replay every expanded
  // sample — the same discipline as the MP3/AAC frame walkers and the
  // 16-bit PCM energy tier.

  /** Expand one μ-law byte to its 14-bit-range linear sample (±8031). */
  private[graft] def ulawToLinear(u: Int): Int = {
    val uc = ~u & 0xff
    val t = (((uc & 0x0f) << 3) + 0x84) << ((uc & 0x70) >> 4)
    if ((uc & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** Expand one A-law byte to its 13-bit-range linear sample (±32256
    * in the ×16 convention the reference implementation uses).
    */
  private[graft] def alawToLinear(a: Int): Int = {
    val ac = (a ^ 0x55) & 0xff
    val man = ac & 0x0f
    val seg = (ac & 0x70) >> 4
    val t = seg match {
      case 0 => (man << 4) + 8
      case 1 => (man << 4) + 0x108
      case s => ((man << 4) + 0x108) << (s - 1)
    }
    if ((ac & 0x80) != 0) t else -t
  }

  /** G.711 WAV fixture spec. `law` 0 = μ-law (fmt code 7), 1 = A-law
    * (fmt code 6). `cls` 0 = clean; 3 = truncated (header declares the
    * full data chunk, half the sample bytes are missing); 4 = same
    * payload mislabeled PCM fmt code 1 (the decoder must refuse it as
    * not-G.711, never misread companded bytes as linear). Byte at frame
    * k, channel c is `(seed + 31·k + 17·c) mod 256` — closed-form for
    * the oracle, and it sweeps the full companded byte range so both
    * decode formulas' every segment is exercised.
    */
  case class G711Spec(doc_id: Long, law: Int, sample_rate: Int,
      channels: Int, n_frames: Int, seed: Int, cls: Int)

  def synthesizeG711(spark: SparkSession, specs: Dataset[G711Spec]): DataFrame = {
    import spark.implicits._
    graft.Tables.ensureMinParallelism(specs.toDF()).as[G711Spec].mapPartitions { it =>
      it.map { s =>
        val dataSize = s.n_frames * s.channels // 1 byte per sample
        val kept = if (s.cls == 3) dataSize / 2 else dataSize
        val fmtCode = if (s.cls == 4) 1 else if (s.law == 0) 7 else 6
        val bb = java.nio.ByteBuffer.allocate(44 + kept)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
        bb.put("fmt ".getBytes).putInt(16)
          .putShort(fmtCode.toShort).putShort(s.channels.toShort)
          .putInt(s.sample_rate).putInt(s.sample_rate * s.channels)
          .putShort(s.channels.toShort).putShort(8.toShort)
        bb.put("data".getBytes).putInt(dataSize) // declared FULL size
        var j = 0
        while (j < kept) {
          val k = j / s.channels; val c = j % s.channels
          bb.put(((s.seed + 31 * k + 17 * c) % 256).toByte)
          j += 1
        }
        BinaryDoc(s.doc_id, bb.array())
      }
    }.toDF("doc_id", "payload")
  }

  /** Per-payload G.711 decode digest: every companded byte expanded to
    * linear, with exact integer statistics (peak |sample|, Σ|sample|,
    * channel-0 zero crossings — the [[audioEnergy]] conventions) so the
    * decode is verifiable end to end.
    */
  case class G711Meta(doc_id: Long, n_bytes: Long, status: String,
      err: Option[String], codec: String, sample_rate: Int, channels: Int,
      n_frames: Long, duration_ms: Long, peak: Int, sum_abs: Long,
      n_zero_cross: Long)

  /** EXECUTED G.711 sample decode over RIFF/WAVE payloads carrying fmt
    * code 7 (μ-law) or 6 (A-law): parses the container, expands the
    * ACTUAL companded bytes with [[ulawToLinear]]/[[alawToLinear]], and
    * digests the linear signal. Same skip-and-account quarantine tier as
    * [[audioEnergy]]: bad magic → unsupported; declared-vs-actual data
    * mismatch / ragged layout → corrupt; PCM or any other fmt code →
    * unsupported `fmt_code_N` (this tier decodes ONLY G.711 — linear PCM
    * has its own executed tier). mapPartitions, zero shuffles,
    * streaming-safe.
    */
  def g711Audit(spark: SparkSession, binDocs: DataFrame): Dataset[G711Meta] = {
    import spark.implicits._
    val base =
      if (binDocs.isStreaming) binDocs
      else graft.Tables.ensureMinParallelism(binDocs)
    base.as[BinaryDoc].mapPartitions { it =>
      it.map { d =>
        def bad(status: String, reason: String) =
          G711Meta(d.doc_id, d.payload.length.toLong, status, Some(reason),
            "", 0, 0, 0L, 0L, 0, 0L, 0L)
        val b = d.payload
        if (!wavClaims(b)) bad("unsupported", "bad_magic")
        else parseWavData(b) match {
          case Left(reason) => bad("corrupt", reason)
          case Right((sr, ch, bits, fmtCode, dataOff, dataLen)) =>
            if (fmtCode != 7 && fmtCode != 6)
              bad("unsupported", s"fmt_code_$fmtCode")
            else if (bits != 8) bad("corrupt", s"bits_$bits")
            else if (ch <= 0 || dataLen % ch != 0) bad("corrupt", "ragged_data")
            else {
              val ulaw = fmtCode == 7
              val nFrames = dataLen / ch
              var peak = 0; var sumAbs = 0L; var zc = 0L
              var prevNonNeg = false
              var k = 0L
              while (k < nFrames) {
                var c = 0
                while (c < ch) {
                  val u = b(dataOff + (k * ch + c).toInt) & 0xff
                  val v = if (ulaw) ulawToLinear(u) else alawToLinear(u)
                  val a = math.abs(v)
                  if (a > peak) peak = a
                  sumAbs += a
                  if (c == 0) {
                    val nonNeg = v >= 0
                    if (k > 0 && nonNeg != prevNonNeg) zc += 1
                    prevNonNeg = nonNeg
                  }
                  c += 1
                }
                k += 1
              }
              G711Meta(d.doc_id, b.length.toLong, "ok", None,
                if (ulaw) "ulaw" else "alaw", sr, ch, nFrames,
                nFrames * 1000L / sr, peak, sumAbs, zc)
            }
        }
      }
    }
  }

  // ---- IMA/DVI ADPCM (WAV fmt code 0x11): REAL stateful sample decode --
  // IMA Digital Audio Focus Group algorithm (1992; the WAV packaging is
  // Microsoft's public multimedia registration). Unlike G.711's
  // closed-form per-byte expansion, ADPCM decode is STATEFUL: each 4-bit
  // nibble updates a (predictor, step-index) pair, and each data block
  // re-seeds the state from its 4-byte header (predictor int16 LE, step
  // index u8, reserved u8) — the header predictor IS output sample 0 of
  // the block. The oracle replays the recursion as a DuckDB recursive
  // CTE over (doc, block, sample), so every decoded sample is
  // independently verified, state resets included.

  private[graft] val adpcmStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private[graft] val adpcmIndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8) // indexed by nibble & 7

  /** One IMA ADPCM state step: returns (newPred, newIdx) for `nib` from
    * (pred, idx). The canonical integer bit-shift diff (the IMA spec's
    * reference form): diff = step>>3 (+ step if bit2) (+ step>>1 if
    * bit1) (+ step>>2 if bit0), sign from bit3; predictor clamps to
    * int16, index to [0, 88].
    */
  private[graft] def adpcmStep(pred: Int, idx: Int, nib: Int): (Int, Int) = {
    val step = adpcmStepTable(idx)
    var diff = step >> 3
    if ((nib & 4) != 0) diff += step
    if ((nib & 2) != 0) diff += step >> 1
    if ((nib & 1) != 0) diff += step >> 2
    val p = if ((nib & 8) != 0) pred - diff else pred + diff
    val pc = math.max(-32768, math.min(32767, p))
    val i = idx + adpcmIndexTable(nib & 7)
    (pc, math.max(0, math.min(88, i)))
  }

  /** IMA ADPCM WAV fixture spec. `nb` = data bytes per block (block
    * align = 4 + nb; 2 nibbles per byte, so samples per block =
    * 1 + 2·nb counting the header sample), `n_blocks` full blocks.
    * Block b seeds its state from pred0+100·b (int16-clamped) and
    * (idx0 + 7·b) mod 89 — closed-form, so the oracle re-derives every
    * block header without parsing bytes. Data byte g (a GLOBAL data-byte
    * counter across blocks) is `(seed + 31·g) mod 256`. `cls` 0 = clean;
    * 3 = truncated (data chunk declares the full size, half the bytes
    * are missing); 4 = same payload mislabeled linear PCM fmt code 1
    * (the decoder must refuse — nibble soup is not PCM).
    */
  case class AdpcmSpec(doc_id: Long, sample_rate: Int, nb: Int,
      n_blocks: Int, pred0: Int, idx0: Int, seed: Int, cls: Int)

  def synthesizeAdpcm(spark: SparkSession, specs: Dataset[AdpcmSpec]): DataFrame = {
    import spark.implicits._
    graft.Tables.ensureMinParallelism(specs.toDF()).as[AdpcmSpec].mapPartitions { it =>
      it.map { s =>
        val blockAlign = 4 + s.nb
        val dataSize = blockAlign * s.n_blocks
        val kept = if (s.cls == 3) dataSize / 2 else dataSize
        val fmtCode = if (s.cls == 4) 1 else 17
        val samplesPerBlock = 1 + 2 * s.nb
        val bb = java.nio.ByteBuffer.allocate(48 + kept)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes).putInt(40 + dataSize).put("WAVE".getBytes)
        bb.put("fmt ".getBytes).putInt(20) // 16 base + cbSize(2) + ext(2)
          .putShort(fmtCode.toShort).putShort(1.toShort) // mono
          .putInt(s.sample_rate)
          .putInt(s.sample_rate * blockAlign / samplesPerBlock)
          .putShort(blockAlign.toShort).putShort(4.toShort)
          .putShort(2.toShort).putShort(samplesPerBlock.toShort)
        bb.put("data".getBytes).putInt(dataSize) // declared FULL size
        var w = 0 // bytes written into the data chunk so far
        var b = 0
        while (b < s.n_blocks && w < kept) {
          val p0 = math.max(-32768, math.min(32767, s.pred0 + 100 * b))
          val i0 = (s.idx0 + 7 * b) % 89
          // block header (may itself be cut by the truncation class)
          val hdr = java.nio.ByteBuffer.allocate(4)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            .putShort(p0.toShort).put(i0.toByte).put(0.toByte).array()
          var j = 0
          while (j < 4 && w < kept) { bb.put(hdr(j)); j += 1; w += 1 }
          var g = b * s.nb
          while (g < (b + 1) * s.nb && w < kept) {
            bb.put(((s.seed + 31 * g) % 256).toByte); g += 1; w += 1
          }
          b += 1
        }
        BinaryDoc(s.doc_id, bb.array())
      }
    }.toDF("doc_id", "payload")
  }

  /** Per-payload IMA ADPCM decode digest — [[audioEnergy]]'s integer
    * conventions plus the STATE WITNESSES (`final_pred`, `final_idx`):
    * two fields only a faithful stateful decode can produce, because
    * every one of the ~2·nb·blocks state transitions feeds them.
    */
  case class AdpcmMeta(doc_id: Long, n_bytes: Long, status: String,
      err: Option[String], sample_rate: Int, n_blocks: Long,
      n_samples: Long, duration_ms: Long, peak: Int, sum_abs: Long,
      n_zero_cross: Long, final_pred: Int, final_idx: Int)

  /** blockAlign from the fmt chunk (offset 12 in the fmt payload) — the
    * one field [[parseWavData]]'s shared tuple does not carry; called
    * only after parseWavData has validated the chunk walk.
    */
  private def wavBlockAlign(b: Array[Byte]): Int = {
    var o = 12L
    while (o + 8 <= b.length) {
      val oi = o.toInt
      if (tag4(b, oi) == "fmt ") return le16(b, oi + 20)
      o += 8 + le32(b, oi + 4) + (le32(b, oi + 4) & 1)
    }
    -1
  }

  /** EXECUTED IMA ADPCM sample decode over RIFF/WAVE payloads carrying
    * fmt code 17: parses the container, walks the data chunk block by
    * block (state re-seeded from each block header), expands every
    * nibble with [[adpcmStep]] (low nibble first — the IMA WAV packing),
    * and digests the linear signal across the concatenated blocks. Same
    * skip-and-account quarantine tier as [[g711Audit]]: bad magic →
    * unsupported; non-ADPCM fmt code → unsupported `fmt_code_N` (nibble
    * soup must never be misread as PCM, and vice versa); stereo ADPCM →
    * unsupported `channels_N` (the interleaved 4-byte channel groups are
    * a documented non-goal of this tier); ragged block layout / bad
    * declared bits / out-of-range header step index → corrupt.
    * mapPartitions, zero shuffles, streaming-safe.
    */
  def adpcmAudit(spark: SparkSession, binDocs: DataFrame): Dataset[AdpcmMeta] = {
    import spark.implicits._
    val base =
      if (binDocs.isStreaming) binDocs
      else graft.Tables.ensureMinParallelism(binDocs)
    base.as[BinaryDoc].mapPartitions { it =>
      it.map { d =>
        def bad(status: String, reason: String) =
          AdpcmMeta(d.doc_id, d.payload.length.toLong, status, Some(reason),
            0, 0L, 0L, 0L, 0, 0L, 0L, 0, 0)
        val b = d.payload
        if (!wavClaims(b)) bad("unsupported", "bad_magic")
        else parseWavData(b) match {
          case Left(reason) => bad("corrupt", reason)
          case Right((sr, ch, bits, fmtCode, dataOff, dataLen)) =>
            val blockAlign = wavBlockAlign(b)
            if (fmtCode != 17) bad("unsupported", s"fmt_code_$fmtCode")
            else if (ch != 1) bad("unsupported", s"channels_$ch")
            else if (bits != 4) bad("corrupt", s"bits_$bits")
            else if (blockAlign < 5) bad("corrupt", "bad_block_align")
            else if (dataLen < blockAlign || dataLen % blockAlign != 0)
              bad("corrupt", "ragged_data")
            else {
              val nBlocks = dataLen / blockAlign
              var peak = 0; var sumAbs = 0L; var zc = 0L
              var prevNonNeg = false; var first = true
              var pred = 0; var idx = 0
              def emit(v: Int): Unit = {
                val a = math.abs(v)
                if (a > peak) peak = a
                sumAbs += a
                val nonNeg = v >= 0
                if (!first && nonNeg != prevNonNeg) zc += 1
                prevNonNeg = nonNeg; first = false
              }
              var blk = 0L
              var badIdx = false
              while (blk < nBlocks && !badIdx) {
                val off = dataOff + (blk * blockAlign).toInt
                pred = ((b(off) & 0xff) | (b(off + 1) << 8)).toShort.toInt
                idx = b(off + 2) & 0xff
                if (idx > 88) badIdx = true
                else {
                  emit(pred) // the header predictor is sample 0
                  var j = off + 4
                  val end = off + blockAlign
                  while (j < end) {
                    val byte = b(j) & 0xff
                    val (p1, i1) = adpcmStep(pred, idx, byte & 0x0f)
                    emit(p1)
                    val (p2, i2) = adpcmStep(p1, i1, byte >> 4)
                    emit(p2)
                    pred = p2; idx = i2
                    j += 1
                  }
                }
                blk += 1
              }
              if (badIdx) bad("corrupt", "bad_step_index")
              else {
                val spb = 1L + 2L * (blockAlign - 4)
                val nSamples = nBlocks * spb
                AdpcmMeta(d.doc_id, b.length.toLong, "ok", None, sr,
                  nBlocks, nSamples, nSamples * 1000L / sr, peak, sumAbs,
                  zc, pred, idx)
              }
            }
        }
      }
    }
  }

  // ---- Ogg/Vorbis: REAL page walk with lacing + page-level CRC ---------
  // xiph.org Ogg bitstream (RFC 3533): pages of [`OggS`][version=0]
  // [header_type: 0x02 BOS / 0x04 EOS][granule u64 LE][serial u32]
  // [page_seq u32][crc u32][n_segs u8][lacing table][payload]. The CRC
  // is CRC-32 poly 0x04C11DB7, init 0, MSB-first, NO reflection, xorout
  // 0 — computed over the whole page with the CRC field zeroed (so the
  // check is only passable by a real recompute). Packets are laced:
  // each segment < 255 terminates a packet. The BOS page of a Vorbis
  // stream carries the 30-byte identification header (packet type 1 +
  // "vorbis" + version u32=0 + channels u8 + rate u32 + 3×bitrate i32 +
  // blocksizes u8 + framing bit) — Vorbis I spec.

  private[graft] val oggCrcTable: Array[Int] = Array.tabulate(256) { i =>
    var r = i << 24
    var k = 0
    while (k < 8) {
      r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04C11DB7 else r << 1
      k += 1
    }
    r
  }

  /** Ogg page CRC (RFC 3533 Annex A polynomial conventions). */
  private[graft] def oggCrc(b: Array[Byte], off: Int, len: Int): Int = {
    var crc = 0
    var i = off
    val end = off + len
    while (i < end) {
      crc = (crc << 8) ^ oggCrcTable(((crc >>> 24) ^ (b(i) & 0xff)) & 0xff)
      i += 1
    }
    crc
  }

  /** Page CRC as the spec defines it — over the page image with the
    * 4-byte CRC word (offsets 22..25 from the page start) read as zero —
    * WITHOUT mutating the buffer: fold the three spans separately.
    */
  private def oggPageCrc(b: Array[Byte], off: Int, pageLen: Int): Int = {
    var crc = oggCrc(b, off, 22)
    var k = 0
    while (k < 4) { // the zeroed CRC word
      crc = (crc << 8) ^ oggCrcTable((crc >>> 24) & 0xff)
      k += 1
    }
    var i = off + 26
    val end = off + pageLen
    while (i < end) {
      crc = (crc << 8) ^ oggCrcTable(((crc >>> 24) ^ (b(i) & 0xff)) & 0xff)
      i += 1
    }
    crc
  }

  /** Ogg/Vorbis fixture spec. BOS page 0 carries the 30-byte Vorbis id
    * header; audio pages 1..n_pages each lace `n_segs` segments, global
    * segment g sized `1 + (seed + 17·g) mod 254` (all < 255, so every
    * segment ends a packet) with payload byte j = `(seed + 7·g + 3·j)
    * mod 256`; audio page p's granule is `p · 441 · n_segs`; the last
    * page sets EOS. `cls` 0 = clean; 3 = truncated (the final page's
    * lacing declares bytes the buffer does not have); 4 = one flipped
    * payload byte AFTER CRC stamping (the real CRC recompute must
    * catch it); 5 = the BOS packet is not a Vorbis id header
    * (unsupported `not_vorbis`); 6 = Vorbis version field ≠ 0
    * (unsupported `version_1`).
    */
  case class OggSpec(doc_id: Long, sample_rate: Int, n_pages: Int,
      n_segs: Int, seed: Int, cls: Int)

  def synthesizeOgg(spark: SparkSession, specs: Dataset[OggSpec]): DataFrame = {
    import spark.implicits._
    graft.Tables.ensureMinParallelism(specs.toDF()).as[OggSpec].mapPartitions { it =>
      it.map { s =>
        val out = new java.io.ByteArrayOutputStream()
        def page(headerType: Int, granule: Long, seq: Int,
            segs: Seq[Array[Byte]]): Array[Byte] = {
          val lace = segs.map(_.length)
          require(lace.forall(_ < 255), "fixture segments must end packets")
          val bb = java.nio.ByteBuffer
            .allocate(27 + segs.size + lace.sum)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("OggS".getBytes).put(0.toByte).put(headerType.toByte)
            .putLong(granule).putInt(0x6772616f /* serial */).putInt(seq)
            .putInt(0) // crc placeholder
            .put(segs.size.toByte)
          lace.foreach(l => bb.put(l.toByte))
          segs.foreach(bb.put)
          val a = bb.array()
          val crc = oggCrc(a, 0, a.length)
          a(22) = (crc & 0xff).toByte
          a(23) = ((crc >> 8) & 0xff).toByte
          a(24) = ((crc >> 16) & 0xff).toByte
          a(25) = ((crc >> 24) & 0xff).toByte
          a
        }
        val idHeader = {
          val bb = java.nio.ByteBuffer.allocate(30)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put(1.toByte).put("vorbis".getBytes)
            .putInt(if (s.cls == 6) 1 else 0) // vorbis_version
            .put((1 + (s.doc_id % 2)).toByte) // channels
            .putInt(s.sample_rate)
            .putInt(0).putInt(s.sample_rate * 4).putInt(0) // bitrates
            .put(0xb8.toByte).put(1.toByte) // blocksizes, framing
          bb.array()
        }
        val bos =
          if (s.cls == 5) page(0x02, 0L, 0, Seq("theora-ish".getBytes))
          else page(0x02, 0L, 0, Seq(idHeader))
        out.write(bos)
        var g = 0
        for (p <- 1 to s.n_pages) {
          val segs = (0 until s.n_segs).map { _ =>
            val sz = 1 + (s.seed + 17 * g) % 254
            val seg = Array.tabulate(sz)(j => ((s.seed + 7 * g + 3 * j) % 256).toByte)
            g += 1
            seg
          }
          val ht = if (p == s.n_pages) 0x04 else 0x00
          out.write(page(ht, p.toLong * 441L * s.n_segs, p, segs))
        }
        val full = out.toByteArray
        val payload = s.cls match {
          case 3 => full.take(full.length - 3) // cut inside the last page
          case 4 => full.updated(full.length - 1,
            (full(full.length - 1) ^ 0x41).toByte) // corrupt AFTER stamping
          case _ => full
        }
        BinaryDoc(s.doc_id, payload)
      }
    }.toDF("doc_id", "payload")
  }

  /** Per-payload Ogg/Vorbis digest. `crc_fail_pages` is the count of
    * pages whose stored CRC differs from the real recompute — a witness
    * only a genuine page-wide CRC pass can produce; `final_granule` and
    * the packet/byte totals witness the lacing walk.
    */
  case class OggMeta(doc_id: Long, n_bytes: Long, status: String,
      err: Option[String], sample_rate: Int, channels: Int,
      bitrate_nominal: Int, n_pages: Long, n_packets: Long,
      payload_bytes: Long, final_granule: Long, crc_fail_pages: Long)

  /** REAL Ogg page walk + Vorbis identification decode: magic/version
    * check per page, lacing-table walk with strict bounds, page CRC
    * recomputed over the zeroed-CRC image and compared to the stored
    * word, page_seq monotonicity, BOS Vorbis id unpack (channels, rate,
    * nominal bitrate). Quarantine fan-out: non-Ogg bytes → unsupported
    * `bad_magic`; non-Vorbis BOS packet → unsupported `not_vorbis`;
    * Vorbis version ≠ 0 → unsupported `version_N`; lacing past the
    * buffer → corrupt `truncated`; any CRC mismatch → corrupt `bad_crc`
    * (with the failing-page count); missing EOS → corrupt `no_eos`;
    * sequence gap → corrupt `bad_sequence`. mapPartitions, zero
    * shuffles, streaming-safe.
    */
  def oggVorbisAudit(spark: SparkSession, binDocs: DataFrame): Dataset[OggMeta] = {
    import spark.implicits._
    val base =
      if (binDocs.isStreaming) binDocs
      else graft.Tables.ensureMinParallelism(binDocs)
    base.as[BinaryDoc].mapPartitions { it =>
      it.map { d =>
        val b = d.payload
        def bad(status: String, reason: String, crcFails: Long = 0L) =
          OggMeta(d.doc_id, b.length.toLong, status, Some(reason),
            0, 0, 0, 0L, 0L, 0L, 0L, crcFails)
        if (b.length < 27 || tag4(b, 0) != "OggS") bad("unsupported", "bad_magic")
        else {
          var o = 0
          var nPages = 0L
          var nPackets = 0L
          var payloadBytes = 0L
          var finalGranule = 0L
          var crcFails = 0L
          var sawEos = false
          var failure: String = null
          var rate = 0; var channels = 0; var nominal = 0; var unsup: String = null
          while (o < b.length && !sawEos && failure == null && unsup == null) {
            // fewer than 27 bytes left is a cut page, not a foreign one
            if (o + 27 > b.length) failure = "truncated"
            else if (tag4(b, o) != "OggS") failure = "bad_page_magic"
            else if (b(o + 4) != 0) failure = "bad_version"
            else {
              val headerType = b(o + 5) & 0xff
              val granule = le32(b, o + 6) | (le32(b, o + 10) << 32)
              val storedCrc = le32(b, o + 22).toInt
              val nSegs = b(o + 26) & 0xff
              if (le32(b, o + 18) != nPages)
                failure = "bad_sequence"
              else if (o + 27 + nSegs > b.length) failure = "truncated"
              else {
                var paySize = 0
                var k = 0
                while (k < nSegs) {
                  val l = b(o + 27 + k) & 0xff
                  paySize += l
                  if (l < 255) nPackets += 1
                  k += 1
                }
                val pageLen = 27 + nSegs + paySize
                if (o + pageLen > b.length) failure = "truncated"
                else {
                  if (oggPageCrc(b, o, pageLen) != storedCrc) crcFails += 1
                  if (nPages == 0L) {
                    // BOS must carry the Vorbis identification header
                    val po = o + 27 + nSegs
                    if ((headerType & 0x02) == 0) failure = "no_bos"
                    else if (paySize < 30 || b(po) != 1 ||
                        new String(b, po + 1, 6,
                          java.nio.charset.StandardCharsets.ISO_8859_1) != "vorbis")
                      unsup = "not_vorbis"
                    else {
                      val ver = le32(b, po + 7)
                      if (ver != 0L) unsup = s"version_$ver"
                      else {
                        channels = b(po + 11) & 0xff
                        rate = le32(b, po + 12).toInt
                        nominal = le32(b, po + 20).toInt
                      }
                    }
                  } else {
                    payloadBytes += paySize
                    finalGranule = granule
                  }
                  if ((headerType & 0x04) != 0) sawEos = true
                  nPages += 1
                  o += pageLen
                }
              }
            }
          }
          if (unsup != null) bad("unsupported", unsup)
          else if (failure != null) bad("corrupt", failure, crcFails)
          else if (crcFails > 0) bad("corrupt", "bad_crc", crcFails)
          else if (!sawEos) bad("corrupt", "no_eos")
          else OggMeta(d.doc_id, b.length.toLong, "ok", None, rate,
            channels, nominal, nPages, nPackets - 1, payloadBytes,
            finalGranule, 0L)
        }
      }
    }
  }

  // ---- FLAC container: REAL metadata-block walk ------------------------
  // xiph.org FLAC format (public spec): `fLaC` magic, then metadata
  // blocks of [1-byte header: bit7 last-flag, bits 0-6 type][24-bit BE
  // length][payload]; type 0 = STREAMINFO (34 bytes) carries the stream
  // geometry in a packed bit layout — 16b min/max block size, 24b
  // min/max frame size, 20b sample rate, 3b channels−1, 5b bits−1,
  // 36b total samples, 128b MD5. Type 127 is invalid per spec.

  /** FLAC fixture spec. `cls` 0 = clean (STREAMINFO + VORBIS_COMMENT);
    * 3 = a block's declared length overruns the payload (corrupt
    * "truncated"); 4 = first block carries the invalid type 127
    * (corrupt "bad_block_type"); 5 = no STREAMINFO (a VORBIS_COMMENT
    * only — corrupt "no_streaminfo": spec requires STREAMINFO first).
    */
  case class FlacSpec(doc_id: Long, sample_rate: Int, channels: Int,
      bits: Int, total_samples: Long, cls: Int)

  def synthesizeFlac(spark: SparkSession, specs: Dataset[FlacSpec]): DataFrame = {
    import spark.implicits._
    graft.Tables.ensureMinParallelism(specs.toDF()).as[FlacSpec].mapPartitions { it =>
      it.map { s =>
        val out = new java.io.ByteArrayOutputStream()
        out.write("fLaC".getBytes)
        def blockHeader(tpe: Int, len: Int, last: Boolean): Unit = {
          out.write((if (last) 0x80 else 0) | tpe)
          out.write((len >> 16) & 0xff); out.write((len >> 8) & 0xff)
          out.write(len & 0xff)
        }
        val si = new Array[Byte](34)
        def put16(o: Int, v: Int): Unit = {
          si(o) = ((v >> 8) & 0xff).toByte; si(o + 1) = (v & 0xff).toByte
        }
        put16(0, 4096); put16(2, 4096)           // min/max block size
        // min/max frame size: 24-bit, deterministic from the spec
        val fsz = 1000 + (s.doc_id % 5000).toInt
        si(4) = ((fsz >> 16) & 0xff).toByte; si(5) = ((fsz >> 8) & 0xff).toByte
        si(6) = (fsz & 0xff).toByte
        si(7) = si(4); si(8) = si(5); si(9) = si(6)
        // packed: sr(20) | ch-1(3) | bits-1(5) | total(36) = 64 bits
        val packed = (s.sample_rate.toLong << 44) |
          ((s.channels - 1).toLong << 41) | ((s.bits - 1).toLong << 36) |
          (s.total_samples & 0xfffffffffL)
        for (i <- 0 until 8)
          si(10 + i) = ((packed >> (56 - 8 * i)) & 0xff).toByte
        // md5: deterministic filler
        for (i <- 0 until 16) si(18 + i) = ((s.doc_id + i) % 256).toByte
        val vc = {
          // minimal VORBIS_COMMENT: 32-bit LE vendor length + vendor
          val vendor = s"graft${s.doc_id}".getBytes
          val bb = java.nio.ByteBuffer
            .allocate(8 + vendor.length)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.putInt(vendor.length).put(vendor).putInt(0) // 0 comments
          bb.array()
        }
        s.cls match {
          case 3 => // STREAMINFO declared but payload cut mid-block
            blockHeader(0, 34, last = true); out.write(si, 0, 20)
          case 4 =>
            blockHeader(127, 34, last = true); out.write(si)
          case 5 =>
            blockHeader(4, vc.length, last = true); out.write(vc)
          case _ =>
            blockHeader(0, 34, last = false); out.write(si)
            blockHeader(4, vc.length, last = true); out.write(vc)
        }
        BinaryDoc(s.doc_id, out.toByteArray)
      }
    }.toDF("doc_id", "payload")
  }

  /** Per-payload FLAC metadata digest; the STREAMINFO bit unpack is the
    * executed decode (every geometry field crosses the packed layout).
    */
  case class FlacMeta(doc_id: Long, n_bytes: Long, status: String,
      err: Option[String], sample_rate: Int, channels: Int, bits: Int,
      total_samples: Long, duration_ms: Long, n_blocks: Int,
      has_vorbis_comment: Boolean)

  /** REAL FLAC metadata-block walk: magic check, block-header walk with
    * strict bounds, STREAMINFO packed-bit unpack (20/3/5/36-bit fields),
    * VORBIS_COMMENT presence. Quarantine fan-out: bad magic →
    * unsupported; overrun block length → corrupt "truncated"; invalid
    * block type 127 → corrupt "bad_block_type"; STREAMINFO absent or not
    * first (both spec violations) → corrupt "no_streaminfo"; sample rate
    * 0 → corrupt "bad_sample_rate" (division guard, per spec 0 is
    * invalid for audio). mapPartitions, zero shuffles, streaming-safe.
    */
  def flacAudit(spark: SparkSession, binDocs: DataFrame): Dataset[FlacMeta] = {
    import spark.implicits._
    val base =
      if (binDocs.isStreaming) binDocs
      else graft.Tables.ensureMinParallelism(binDocs)
    base.as[BinaryDoc].mapPartitions { it =>
      it.map { d =>
        val b = d.payload
        val n = b.length.toLong
        def bad(status: String, reason: String) =
          FlacMeta(d.doc_id, n, status, Some(reason), 0, 0, 0, 0L, 0L, 0,
            has_vorbis_comment = false)
        if (b.length < 4 || tag4(b, 0) != "fLaC") bad("unsupported", "bad_magic")
        else {
          var o = 4
          var nBlocks = 0
          var sawVc = false
          var siOff = -1
          var siFirst = false
          var last = false
          var failure: String = null
          while (!last && failure == null) {
            if (o + 4 > b.length) { failure = "truncated" }
            else {
              val hdr = b(o) & 0xff
              last = (hdr & 0x80) != 0
              val tpe = hdr & 0x7f
              val len = ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) |
                (b(o + 3) & 0xff)
              if (tpe == 127) failure = "bad_block_type"
              else if (o + 4 + len > b.length) failure = "truncated"
              else {
                if (tpe == 0 && siOff < 0) {
                  if (len < 34) failure = "truncated"
                  else { siOff = o + 4; siFirst = nBlocks == 0 }
                }
                if (tpe == 4) sawVc = true
                nBlocks += 1
                o += 4 + len
              }
            }
          }
          if (failure != null) bad("corrupt", failure)
          else if (siOff < 0 || !siFirst) bad("corrupt", "no_streaminfo")
          else {
            var packed = 0L
            for (i <- 0 until 8)
              packed = (packed << 8) | (b(siOff + 10 + i) & 0xffL)
            val sr = ((packed >>> 44) & 0xfffff).toInt
            val ch = (((packed >>> 41) & 0x7) + 1).toInt
            val bits = (((packed >>> 36) & 0x1f) + 1).toInt
            val total = packed & 0xfffffffffL
            if (sr == 0) bad("corrupt", "bad_sample_rate")
            else FlacMeta(d.doc_id, n, "ok", None, sr, ch, bits, total,
              total * 1000L / sr, nBlocks, sawVc)
          }
        }
      }
    }
  }

  /** MP4 fixture synthesis: a minimal REAL ISO-BMFF file — `ftyp` +
    * `moov(mvhd v0, trak(tkhd v0))` — with the given movie timescale/
    * duration and track geometry. 232 bytes total, fixed layout.
    */
  case class Mp4Spec(doc_id: Long, timescale: Int, duration_units: Long,
      w: Int, h: Int)

  def synthesizeMp4(spark: SparkSession, specs: Dataset[Mp4Spec]): DataFrame = {
    import spark.implicits._
    graft.Tables.ensureMinParallelism(specs.toDF()).as[Mp4Spec].mapPartitions { it =>
      it.map { s =>
        val bb = java.nio.ByteBuffer.allocate(232) // big-endian by default
        bb.putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
        bb.putInt(216).put("moov".getBytes)
        // mvhd v0: 108 bytes
        bb.putInt(108).put("mvhd".getBytes)
          .putInt(0)                   // version+flags
          .putInt(0).putInt(0)         // creation, modification
          .putInt(s.timescale)
          .putInt(s.duration_units.toInt)
          .putInt(0x00010000)          // rate 1.0
          .putShort(0x0100.toShort)    // volume 1.0
          .put(new Array[Byte](10))    // reserved
          .put(identityMatrix)
          .put(new Array[Byte](24))    // pre_defined
          .putInt(2)                   // next_track_ID
        // trak: 100 bytes = 8 + tkhd(92)
        bb.putInt(100).put("trak".getBytes)
        bb.putInt(92).put("tkhd".getBytes)
          .putInt(0)                   // version+flags
          .putInt(0).putInt(0)         // creation, modification
          .putInt(1)                   // track_ID
          .putInt(0)                   // reserved
          .putInt(s.duration_units.toInt)
          .put(new Array[Byte](8))     // reserved
          .putShort(0).putShort(0)     // layer, alternate_group
          .putShort(0)                 // volume (video track: 0)
          .putShort(0)                 // reserved
          .put(identityMatrix)
          .putInt(s.w << 16)           // 16.16 fixed
          .putInt(s.h << 16)
        BinaryDoc(s.doc_id, bb.array())
      }
    }.toDF("doc_id", "payload")
  }

  private def identityMatrix: Array[Byte] = {
    val m = java.nio.ByteBuffer.allocate(36)
    m.putInt(0x00010000).putInt(0).putInt(0)
    m.putInt(0).putInt(0x00010000).putInt(0)
    m.putInt(0).putInt(0).putInt(0x40000000)
    m.array()
  }

  /** MP4 fixture synthesis WITH real sample tables: `ftyp` + `moov(mvhd,
    * trak(tkhd, mdia(mdhd, minf(stbl(stsz, stsc, stco, stts,
    * stss)))))` + `mdat`. Sample sizes are per-row data (genuinely
    * non-uniform), samples pack into chunks of `samples_per_chunk` (last
    * chunk may be partial — the ISO 14496-12 shape), and every chunk is
    * preceded by a 4-byte pad inside `mdat` so chunk offsets are NOT
    * inferable from contiguity — a demuxer must actually read `stco`.
    * Sample `i`'s payload is `sample_sizes(i)` bytes of fill value
    * `(fill_seed + 7·i) mod 256`.
    *
    * Timing/sync tables: `mdhd` carries `media_timescale`; `stts` writes
    * TWO runs — the first `ceil(ns/2)` samples at `delta_a` units, the
    * rest at `delta_b` (a run-length table a demuxer must actually
    * expand); `stss` marks every 4th sample (1, 5, 9, …) as a sync
    * sample.
    */
  case class Mp4SampleSpec(doc_id: Long, timescale: Int, duration_units: Long,
      w: Int, h: Int, sample_sizes: Seq[Int], samples_per_chunk: Int,
      fill_seed: Int, media_timescale: Int = 1000, delta_a: Int = 40,
      delta_b: Int = 80)

  def synthesizeMp4Samples(spark: SparkSession,
      specs: Dataset[Mp4SampleSpec]): DataFrame = {
    import spark.implicits._
    graft.Tables.ensureMinParallelism(specs.toDF()).as[Mp4SampleSpec]
      .mapPartitions { it =>
        it.map { s =>
          require(s.samples_per_chunk > 0 && s.sample_sizes.nonEmpty)
          val ns = s.sample_sizes.size
          val nc = (ns + s.samples_per_chunk - 1) / s.samples_per_chunk
          val nk = (ns + 3) / 4 // stss: samples 1, 5, 9, … (1-based)
          val h = (ns + 1) / 2  // stts run split
          val sumS = s.sample_sizes.sum
          val stszSz = 20 + 4 * ns
          val stscSz = 28
          val stcoSz = 16 + 4 * nc
          val sttsSz = 16 + 8 * 2
          val stssSz = 16 + 4 * nk
          val stblSz = 8 + stszSz + stscSz + stcoSz + sttsSz + stssSz
          val minfSz = 8 + stblSz
          val mdiaSz = 8 + 32 + minfSz // mdhd v0 = 32 bytes
          val trakSz = 8 + 92 + mdiaSz
          val moovSz = 8 + 108 + trakSz
          val mdatStart = 16 + moovSz
          val mdatSz = 8 + 4 * nc + sumS
          val bb = java.nio.ByteBuffer.allocate(mdatStart + mdatSz)
          bb.putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
          bb.putInt(moovSz).put("moov".getBytes)
          bb.putInt(108).put("mvhd".getBytes)
            .putInt(0).putInt(0).putInt(0)
            .putInt(s.timescale).putInt(s.duration_units.toInt)
            .putInt(0x00010000).putShort(0x0100.toShort)
            .put(new Array[Byte](10)).put(identityMatrix)
            .put(new Array[Byte](24)).putInt(2)
          bb.putInt(trakSz).put("trak".getBytes)
          bb.putInt(92).put("tkhd".getBytes)
            .putInt(0).putInt(0).putInt(0).putInt(1).putInt(0)
            .putInt(s.duration_units.toInt).put(new Array[Byte](8))
            .putShort(0).putShort(0).putShort(0).putShort(0)
            .put(identityMatrix).putInt(s.w << 16).putInt(s.h << 16)
          bb.putInt(mdiaSz).put("mdia".getBytes)
          bb.putInt(32).put("mdhd".getBytes)
            .putInt(0)                    // version+flags
            .putInt(0).putInt(0)          // creation, modification
            .putInt(s.media_timescale)
            .putInt(0)                    // duration (unused by demux)
            .putShort(0x55c4.toShort)     // language "und"
            .putShort(0)                  // pre_defined
          bb.putInt(minfSz).put("minf".getBytes)
          bb.putInt(stblSz).put("stbl".getBytes)
          bb.putInt(stszSz).put("stsz".getBytes).putInt(0)
            .putInt(0) // sample_size 0 => per-sample entries follow
            .putInt(ns)
          s.sample_sizes.foreach(bb.putInt)
          bb.putInt(stscSz).put("stsc".getBytes).putInt(0)
            .putInt(1).putInt(1).putInt(s.samples_per_chunk).putInt(1)
          bb.putInt(sttsSz).put("stts".getBytes).putInt(0).putInt(2)
            .putInt(h).putInt(s.delta_a)
            .putInt(ns - h).putInt(s.delta_b)
          bb.putInt(stssSz).put("stss".getBytes).putInt(0).putInt(nk)
          for (k <- 0 until nk) bb.putInt(1 + 4 * k)
          bb.putInt(stcoSz).put("stco".getBytes).putInt(0).putInt(nc)
          // chunk j's first sample sits after the per-chunk 4-byte pad
          var off = mdatStart + 8
          var si = 0
          for (j <- 0 until nc) {
            off += 4
            bb.putInt(off)
            var k = 0
            while (k < s.samples_per_chunk && si < ns) {
              off += s.sample_sizes(si); si += 1; k += 1
            }
          }
          bb.putInt(mdatSz).put("mdat".getBytes)
          si = 0
          for (j <- 0 until nc) {
            bb.put("PAD_".getBytes)
            var k = 0
            while (k < s.samples_per_chunk && si < ns) {
              val fill = ((s.fill_seed + 7 * si) % 256).toByte
              val a = new Array[Byte](s.sample_sizes(si))
              java.util.Arrays.fill(a, fill)
              bb.put(a)
              si += 1; k += 1
            }
          }
          BinaryDoc(s.doc_id, bb.array())
        }
      }.toDF("doc_id", "payload")
  }

  /** One demuxed sample's geometry + timing: absolute byte offset, size,
    * decode timestamp in ms (-1 when the container carries no stts/mdhd),
    * and sync-sample (keyframe) flag (absent stss = every sample is sync,
    * per ISO 14496-12 §8.6.2).
    */
  private[graft] case class Mp4Sample(offset: Long, size: Int, ptsMs: Long,
      sync: Boolean)

  /** TRUE frame demux index: walk `moov/trak/mdia/minf/stbl` and expand
    * the ISO 14496-12 sample tables — `stsz` (per-sample or fixed sizes),
    * `stsc` (run-length sample→chunk map: each entry applies from its
    * `first_chunk` until the next entry's), `stco`/`co64` (32/64-bit
    * chunk offsets), `stts` (run-length decode deltas, converted to ms
    * via the `mdhd` media timescale), `stss` (sync-sample numbers) —
    * into absolute per-sample [[Mp4Sample]]s. The first trak carrying a
    * complete stbl wins (audio traks without one are skipped). Every
    * failure is a STABLE reason string; a sample whose bytes overrun the
    * payload (truncated `mdat`) is "truncated" — the index is only
    * returned when every frame it promises is actually readable.
    */
  private[graft] def parseMp4SampleIndex(
      b: Array[Byte]): Either[String, Array[Mp4Sample]] = {
    // (tpe, bodyStart, end) for each box in [from, to); Left on malformed
    def boxes(from: Int, to: Int): Either[String, Seq[(String, Int, Int)]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
      var o = from
      while (o + 8 <= to) {
        val size = be32(b, o)
        if (size < 8) return Left("bad_box")
        if (o + size > to) return Left("truncated")
        out += ((tag4(b, o + 4), o + 8, (o + size).toInt))
        o = (o + size).toInt
      }
      if (o != to) Left("truncated") else Right(out.toSeq)
    }
    def find(bs: Seq[(String, Int, Int)], tpe: String): Option[(Int, Int)] =
      bs.collectFirst { case (t, s, e) if t == tpe => (s, e) }

    // top-level walk stops at moov: mdat's declared size may legitimately
    // overrun a truncated payload — the per-sample bounds check below owns
    // that failure mode (and reports WHICH contract broke)
    var moov: Option[(Int, Int)] = None
    var o = 0
    while (moov.isEmpty && o + 8 <= b.length) {
      val size = be32(b, o)
      if (size < 8) return Left("bad_box")
      if (tag4(b, o + 4) == "moov") {
        if (o + size > b.length) return Left("truncated")
        moov = Some((o + 8, (o + size).toInt))
      } else o += size.toInt
    }
    val (ms, me) = moov.getOrElse(return Left("no_moov"))

    def u32(o: Int, end: Int): Either[String, Long] =
      if (o + 4 > end) Left("truncated") else Right(be32(b, o))

    // mediaTimescale: from the trak's mdhd (v0 offset 12, v1 offset 20),
    // or -1 when absent/unreadable — pts then reports as -1, not an error
    // (geometry-only containers are still demuxable)
    def stblIndex(stS: Int, stE: Int,
        mediaTimescale: Long): Either[String, Array[Mp4Sample]] = for {
      bs <- boxes(stS, stE)
      szB <- find(bs, "stsz").toRight("no_stsz")
      scB <- find(bs, "stsc").toRight("no_stsc")
      coB <- find(bs, "stco").map((_, false))
        .orElse(find(bs, "co64").map((_, true))).toRight("no_stco")
      sizes <- {
        val (s0, e0) = szB
        for {
          fixed <- u32(s0 + 4, e0)
          n <- u32(s0 + 8, e0)
          out <-
            if (n > (b.length.toLong max 4096L)) Left("bad_stsz")
            else if (fixed > 0) Right(Array.fill(n.toInt)(fixed.toInt))
            else if (s0 + 12 + 4 * n > e0) Left("truncated")
            else Right(Array.tabulate(n.toInt)(i => be32(b, s0 + 12 + 4 * i).toInt))
        } yield out
      }
      stsc <- {
        val (s0, e0) = scB
        u32(s0 + 4, e0).flatMap { n =>
          if (s0 + 8 + 12 * n > e0) Left("truncated")
          else {
            val es = Array.tabulate(n.toInt) { i =>
              (be32(b, s0 + 8 + 12 * i), be32(b, s0 + 8 + 12 * i + 4).toInt)
            }
            if (es.isEmpty || es.head._1 != 1L ||
                es.map(_._1).sliding(2).exists(w => w.length == 2 && w(1) <= w(0)) ||
                es.exists(_._2 <= 0)) Left("bad_stsc")
            else Right(es)
          }
        }
      }
      stco <- {
        val ((s0, e0), wide) = coB
        val w = if (wide) 8 else 4
        u32(s0 + 4, e0).flatMap { n =>
          if (s0 + 8 + w * n > e0) Left("truncated")
          else Right(Array.tabulate(n.toInt)(i =>
            if (wide) be64(b, s0 + 8 + 8 * i) else be32(b, s0 + 8 + 4 * i)))
        }
      }
      // stts -> per-sample decode time in MEDIA timescale units, or null
      // when the box (or mdhd) is absent; zero-count runs are skipped
      pts <- find(bs, "stts") match {
        case None => Right(null: Array[Long])
        case Some((s0, e0)) =>
          u32(s0 + 4, e0).flatMap { n =>
            if (s0 + 8 + 8 * n > e0) Left("truncated")
            else {
              val out = new Array[Long](sizes.length)
              var si = 0
              var t = 0L
              var bad = false
              for (i <- 0 until n.toInt if !bad) {
                val cnt = be32(b, s0 + 8 + 8 * i)
                val delta = be32(b, s0 + 8 + 8 * i + 4)
                var k = 0L
                while (k < cnt && si < sizes.length) {
                  out(si) = t; t += delta; si += 1; k += 1
                }
                if (k < cnt) bad = true // run overruns the sample count
              }
              if (bad || si != sizes.length) Left("bad_stts") else Right(out)
            }
          }
      }
      // stss -> 1-based sync sample numbers; absent = ALL samples sync
      sync <- find(bs, "stss") match {
        case None => Right(null: Array[Long])
        case Some((s0, e0)) =>
          u32(s0 + 4, e0).flatMap { n =>
            if (s0 + 8 + 4 * n > e0) Left("truncated")
            else {
              val es = Array.tabulate(n.toInt)(i => be32(b, s0 + 8 + 4 * i))
              if (es.exists(x => x < 1 || x > sizes.length)) Left("bad_stss")
              else Right(es)
            }
          }
      }
      idx <- {
        // expand: chunk c (1-based) takes the samples-per-chunk of the
        // last stsc entry with first_chunk <= c; samples are assigned to
        // chunks in order; within a chunk, offsets accumulate from stco(c)
        val syncSet: java.util.HashSet[Long] =
          if (sync == null) null
          else { val s = new java.util.HashSet[Long](); sync.foreach(s.add); s }
        val out = new Array[Mp4Sample](sizes.length)
        var si = 0
        var c = 0
        var err: String = null
        while (si < sizes.length && err == null) {
          if (c >= stco.length) err = "bad_stco"
          else {
            val spc = stsc.takeWhile(_._1 <= c + 1).lastOption
              .map(_._2).getOrElse(0)
            if (spc <= 0) err = "bad_stsc"
            else {
              var off = stco(c)
              var k = 0
              while (k < spc && si < sizes.length && err == null) {
                if (sizes(si) < 0 || off < 0 ||
                    off + sizes(si) > b.length) err = "truncated"
                else {
                  val ptsMs =
                    if (pts == null || mediaTimescale <= 0) -1L
                    else pts(si) * 1000L / mediaTimescale
                  val isSync =
                    syncSet == null || syncSet.contains(si + 1L)
                  out(si) = Mp4Sample(off, sizes(si), ptsMs, isSync)
                  off += sizes(si); si += 1
                }
                k += 1
              }
            }
          }
          c += 1
        }
        if (err != null) Left(err) else Right(out)
      }
    } yield idx

    (for {
      mbs <- boxes(ms, me)
      traks = mbs.collect { case ("trak", s, e) => (s, e) }
      _ <- if (traks.isEmpty) Left("no_trak") else Right(())
      idx <- {
        // first trak with a complete stbl wins; structural errors inside
        // a trak that HAS one propagate (a video track with a broken
        // sample table is corrupt, not skippable)
        val candidates = traks.map { case (ts, te) =>
          for {
            tbs <- boxes(ts, te)
            md <- find(tbs, "mdia").toRight("no_stbl")
            mdbs <- boxes(md._1, md._2)
            mi <- find(mdbs, "minf").toRight("no_stbl")
            mibs <- boxes(mi._1, mi._2)
            st <- find(mibs, "stbl").toRight("no_stbl")
          } yield {
            // media timescale from the sibling mdhd (v0 body offset 12,
            // v1 offset 20); absent/short mdhd -> -1 (pts reported as -1)
            val ts = find(mdbs, "mdhd").collect {
              case (s0, e0) if s0 + 4 <= e0 =>
                val off = if ((b(s0) & 0xff) == 0) s0 + 12 else s0 + 20
                if (off + 4 <= e0) be32(b, off) else -1L
            }.getOrElse(-1L)
            (st, ts)
          }
        }
        candidates.collectFirst {
          case Right(((s, e), mts)) => stblIndex(s, e, mts)
          case Left(reason) if reason != "no_stbl" => Left(reason)
        }.getOrElse(Left("no_stbl"))
      }
    } yield idx)
  }

  /** One demuxed frame. Quarantine docs (broken/truncated sample tables,
    * truncated mdat) emit ONE row with `frame_idx` = -1, a stable reason
    * in `err`, and zero geometry; payloads that are not MP4 at all are
    * "unsupported". `frame_sum` is the unsigned byte sum of the frame's
    * actual payload slice — reading it proves the demuxed offsets point
    * at real bytes, not arithmetic.
    */
  case class FrameSample(doc_id: Long, frame_idx: Long, byte_offset: Long,
      frame_bytes: Int, frame_sum: Long, pts_ms: Long, is_sync: Boolean,
      status: String, err: Option[String])

  /** TRUE frame sampling over MP4 payloads: demux the container's own
    * sample tables ([[parseMp4SampleIndex]]) and emit every `stride`-th
    * frame's (index, absolute byte offset, size, payload byte sum) —
    * replacing [[sampleFrames]]' fixed-size-slice plumbing with the real
    * per-sample geometry. Same quarantine mapPartitions tier as
    * [[decodeMeta]]: no shuffle, skip-and-account, streaming-safe.
    */
  def frameIndex(spark: SparkSession, binDocs: DataFrame,
      stride: Int): Dataset[FrameSample] = {
    require(stride > 0, s"bad stride $stride")
    import spark.implicits._
    val base =
      if (binDocs.isStreaming) binDocs
      else graft.Tables.ensureMinParallelism(binDocs)
    base.as[BinaryDoc].mapPartitions { it =>
      it.flatMap { d =>
        if (!mp4Claims(d.payload))
          Iterator.single(FrameSample(d.doc_id, -1L, 0L, 0, 0L, -1L, false,
            "unsupported", None))
        else parseMp4SampleIndex(d.payload) match {
          case Left(reason) =>
            Iterator.single(FrameSample(d.doc_id, -1L, 0L, 0, 0L, -1L, false,
              "corrupt", Some(reason)))
          case Right(idx) =>
            (0 until idx.length by stride).iterator.map { i =>
              val s = idx(i)
              var sum = 0L
              var k = 0
              while (k < s.size) {
                sum += (d.payload(s.offset.toInt + k) & 0xff); k += 1
              }
              FrameSample(d.doc_id, i.toLong, s.offset, s.size, sum,
                s.ptsMs, s.sync, "ok", None)
            }
        }
      }
    }
  }

  /** Keyframe-aligned clip extraction (GOP segmentation) over the demuxed
    * frame index: a clip is a sync frame (stss keyframe) plus every frame
    * until the next sync frame — the unit a video-training pipeline can
    * actually decode independently, so it's the natural shard/sampling
    * grain for clip-level datasets. Built ON the verified demux
    * ([[frameIndex]], stride 1): clip assignment is a running sum of sync
    * flags in ONE window partitioned by doc (bounded by frames-per-video,
    * never corpus-wide), aggregation is one keyed agg. Frames before the
    * first keyframe (a container that starts mid-GOP) land in clip -1 —
    * they are not independently decodable and a curation pass must see
    * them accounted, not silently merged into clip 0. Quarantined docs
    * (non-MP4 / corrupt) pass through as one clip_idx=-1 row with their
    * demux status, preserving skip-and-account.
    *
    * Output per clip: first frame index, frame count, absolute byte offset
    * of the clip's first sample, total sample bytes, payload byte-sum
    * (decode-free content check), start pts and pts span in ms.
    */
  def keyframeClips(spark: SparkSession, binDocs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val idx = frameIndex(spark, binDocs, stride = 1).toDF()
    val perDoc = Window.partitionBy("doc_id").orderBy("frame_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ok = idx.filter(col("status") === "ok")
      .withColumn("clip_idx", sum(col("is_sync").cast("long")).over(perDoc) - 1L)
    val clips = ok.groupBy("doc_id", "clip_idx").agg(
      min("frame_idx").as("start_frame"),
      count(lit(1)).as("n_frames"),
      min("byte_offset").as("start_offset"),
      sum("frame_bytes").cast("long").as("clip_bytes"),
      sum("frame_sum").as("clip_sum"),
      min("pts_ms").as("start_ms"),
      (max("pts_ms") - min("pts_ms")).as("span_ms"))
      .withColumn("status", lit("ok"))
      .withColumn("err", lit(null).cast("string"))
    val quarantined = idx.filter(col("status") =!= "ok").select(
      col("doc_id"), lit(-1L).as("clip_idx"), lit(0L).as("start_frame"),
      lit(0L).as("n_frames"), lit(0L).as("start_offset"),
      lit(0L).as("clip_bytes"), lit(0L).as("clip_sum"),
      lit(-1L).as("start_ms"), lit(0L).as("span_ms"),
      col("status"), col("err"))
    clips.unionByName(quarantined)
  }

  /** REAL (non-stub) feature extraction over raw media bytes: a `bins`-bin
    * byte-value histogram per payload — the kind of cheap content feature
    * (entropy proxies, format fingerprints, corruption detection) a media
    * curation pass computes before any codec is involved. Pure column
    * expressions (posexplode over the byte array), one keyed aggregation.
    * Output: (doc_id, bin, n) for non-empty bins.
    */
  def byteHistogram(binDocs: DataFrame, bins: Int): DataFrame = {
    require(256 % bins == 0, s"bins=$bins must divide 256")
    val width = 256 / bins
    binDocs
      // BINARY has no direct byte-array cast: go through the hex form —
      // regexp_extract_all/conv are codegen'd, so this stays a narrow
      // whole-stage pipeline into one keyed aggregation
      .select(col("doc_id"),
        explode(regexp_extract_all(hex(col("payload")),
          lit("[0-9A-F]{2}"), lit(0))).as("bh"))
      .select(col("doc_id"),
        (conv(col("bh"), 16, 10).cast("int") / width).cast("int").as("bin"))
      .groupBy("doc_id", "bin").agg(count(lit(1)).as("n"))
  }

  /** Resize PLANNING: aspect-preserving fit of each decoded image into a
    * `targetW`×`targetH` box — the real geometry every image-resize
    * pipeline computes (the pixel resample itself would live in the
    * stubbed codec layer). Pure column arithmetic over [[decodeMeta]]
    * output: scale = min(targetW/w, targetH/h) capped at 1 (never
    * upscale), output dims floored with a 1-pixel minimum.
    */
  def resizePlan(meta: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0)
    val scale = least(
      lit(targetW.toDouble) / col("width"),
      lit(targetH.toDouble) / col("height"),
      lit(1.0))
    meta.select(col("doc_id"), col("width"), col("height"),
      greatest(floor(col("width") * scale), lit(1)).cast("int").as("out_w"),
      greatest(floor(col("height") * scale), lit(1)).cast("int").as("out_h"))
  }

  /** Patterned image-fixture synthesis: REAL PNGs whose pixel (x, y) is
    * gray value `(x·7 + y·13 + shade) mod 256` — unlike the solid-fill
    * [[synthesizeImages]], a resample of this pattern is sensitive to
    * WHICH source pixel each output pixel reads, so it exercises the
    * resize kernel's pixel addressing, not just its geometry. PNG only:
    * lossless, so the decoded raster is the pattern bit-for-bit and an
    * oracle can recompute every output pixel arithmetically.
    */
  case class PatternImageSpec(doc_id: Long, w: Int, h: Int, shade: Int)

  private def patternRaster(w: Int, h: Int, shade: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 7 + y * 13 + shade) % 256
      img.setRGB(x, y, v * 0x010101)
    }
    img
  }

  def synthesizePatternImages(spark: SparkSession,
      specs: Dataset[PatternImageSpec]): DataFrame = {
    import spark.implicits._
    graft.Tables.ensureMinParallelism(specs.toDF()).as[PatternImageSpec]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { s =>
          val out = new java.io.ByteArrayOutputStream()
          require(javax.imageio.ImageIO.write(patternRaster(s.w, s.h, s.shade),
            "png", out), "no png writer")
          BinaryDoc(s.doc_id, out.toByteArray)
        }
      }.toDF("doc_id", "payload")
  }

  /** Format-parameterized pattern fixtures: same raster arithmetic as
    * [[synthesizePatternImages]], but the container codec is per-row
    * (`fmt` = any ImageIO writer name — "png", "bmp", "jpg") so the
    * EXECUTED resize tier's oracle can cover more than one real decode
    * path. Lossy formats (jpg) break PIXEL-exactness only: rows built
    * from them must gate on decoded geometry + status fan-out (the
    * mm_jpeg_decode pattern), never on gray sums/checksums.
    */
  case class PatternImageFmtSpec(doc_id: Long, w: Int, h: Int, shade: Int,
      fmt: String)

  def synthesizePatternImagesFmt(spark: SparkSession,
      specs: Dataset[PatternImageFmtSpec]): DataFrame = {
    import spark.implicits._
    graft.Tables.ensureMinParallelism(specs.toDF()).as[PatternImageFmtSpec]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { s =>
          val out = new java.io.ByteArrayOutputStream()
          require(javax.imageio.ImageIO.write(patternRaster(s.w, s.h, s.shade),
            s.fmt, out), s"no ImageIO writer for format ${s.fmt}")
          BinaryDoc(s.doc_id, out.toByteArray)
        }
      }.toDF("doc_id", "payload")
  }

  /** One EXECUTED resize: decoded geometry, output raster statistics, and
    * the re-encoded thumbnail bytes. `checksum` is position-weighted —
    * `Σ (gray+1)·(oy·out_w + ox + 1)` — so two rasters with the same
    * pixel multiset but different layouts hash differently. Quarantine
    * rows (`status` "corrupt") carry zero geometry/stats and a STABLE
    * reason; payloads no installed reader claims are "unsupported".
    */
  case class ResizedImage(
      doc_id: Long, n_bytes: Long, in_w: Int, in_h: Int,
      out_w: Int, out_h: Int, n_px: Long, sum_gray: Long,
      min_gray: Int, max_gray: Int, checksum: Long,
      thumb: Array[Byte], status: String, err: Option[String])

  /** Pixel-EXECUTING resize (the step [[resizePlan]] only planned):
    * ImageIO decode → aspect-preserving fit into `targetW`×`targetH`
    * ([[resizePlan]]'s exact geometry arithmetic) → nearest-neighbor
    * resample with pure integer source addressing — output pixel
    * (ox, oy) reads source pixel (ox·in_w div out_w, oy·in_h div out_h),
    * deterministic and engine-reproducible (no filter kernel, no float
    * accumulation) — → gray stats over the RED channel + re-encoded PNG
    * thumbnail. Runs inside the same quarantine mapPartitions tier as
    * [[decodeMeta]]: a truncated payload becomes a "corrupt" row with a
    * stable reason, never a task failure; per-task codec init amortizes
    * across the partition; no shuffle anywhere — partition sizing
    * (spark.sql.files.maxPartitionBytes) bounds peak decode memory.
    */
  def resizeExec(spark: SparkSession, binDocs: DataFrame,
      targetW: Int, targetH: Int): Dataset[ResizedImage] = {
    require(targetW > 0 && targetH > 0)
    import spark.implicits._
    val base =
      if (binDocs.isStreaming) binDocs
      else graft.Tables.ensureMinParallelism(binDocs)
    base.as[BinaryDoc].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { d =>
        val n = d.payload.length.toLong
        def bad(status: String, reason: Option[String]) =
          ResizedImage(d.doc_id, n, 0, 0, 0, 0, 0L, 0L, 0, 0, 0L,
            null, status, reason)
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(d.payload))
        if (iis == null || d.payload.isEmpty) bad("unsupported", None)
        else try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) bad("unsupported", None)
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis, true, true)
              val img = reader.read(0)
              val (w, h) = (img.getWidth, img.getHeight)
              val scale = math.min(math.min(
                targetW.toDouble / w, targetH.toDouble / h), 1.0)
              val outW = math.max(math.floor(w * scale).toInt, 1)
              val outH = math.max(math.floor(h * scale).toInt, 1)
              val thumb = new java.awt.image.BufferedImage(
                outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var sum = 0L; var mn = 255; var mx = 0; var ck = 0L
              var oy = 0
              while (oy < outH) {
                val sy = oy * h / outH
                var ox = 0
                while (ox < outW) {
                  val sx = ox * w / outW
                  val rgb = img.getRGB(sx, sy)
                  thumb.setRGB(ox, oy, rgb)
                  val g = (rgb >> 16) & 0xff
                  sum += g
                  if (g < mn) mn = g
                  if (g > mx) mx = g
                  ck += (g + 1).toLong * (oy.toLong * outW + ox + 1)
                  ox += 1
                }
                oy += 1
              }
              val enc = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(thumb, "png", enc)
              ResizedImage(d.doc_id, n, w, h, outW, outH,
                outW.toLong * outH, sum, mn, mx, ck, enc.toByteArray, "ok", None)
            } catch {
              case scala.util.control.NonFatal(_) =>
                bad("corrupt", Some("decode_failed"))
            } finally reader.dispose()
          }
        } finally iis.close()
      }
    }
  }

  /** One perceptual hash per image: doc_id, decoded geometry, the 64-bit
    * average-hash split into two nonnegative 32-bit halves (`ahash_hi` =
    * grid rows 0-3, `ahash_lo` = rows 4-7 — two BIGINTs so every engine's
    * signed-64 arithmetic stays overflow-free), and the quarantine
    * status/reason channel shared with [[resizeExec]].
    */
  case class PerceptualHash(
      doc_id: Long, n_bytes: Long, in_w: Int, in_h: Int,
      ahash_hi: Long, ahash_lo: Long, status: String, err: Option[String])

  /** Pixel-EXECUTING perceptual average-hash (aHash) — the image
    * counterpart of content-defined text fingerprints: decode, partition
    * the raster into an 8×8 grid (pixel (x, y) falls in cell
    * (x·8 div w, y·8 div h) — pure integer addressing, engine-
    * replayable), and set one bit per cell iff the cell's mean gray is ≥
    * the global mean. The comparison is cross-multiplied
    * (cellSum·(w·h) ≥ totalSum·cellN) so no division, no floats — the
    * hash is bit-for-bit reproducible by any engine that can replay the
    * integer arithmetic, which is what lets a relational oracle gate it.
    *
    * Near-duplicate images (re-encodes, slight brightness shifts, small
    * crops) land within a few bits of Hamming distance; exact re-encodes
    * collide exactly — group by (ahash_hi, ahash_lo) for exact-perceptual
    * dedup, band the halves for Hamming-bounded candidate pairs (the
    * SimHash pigeonhole construction, over pixels instead of shingles).
    *
    * Same quarantine mapPartitions tier as [[resizeExec]]: truncated
    * payloads → "corrupt", unclaimed formats → "unsupported", rasters
    * smaller than the 8×8 grid → "too_small" (a cell would be empty and
    * the mean undefined) — all stable rows, never task failures. No
    * shuffle; partition bytes bound peak decode memory.
    */
  def perceptualHash(spark: SparkSession, binDocs: DataFrame): Dataset[PerceptualHash] = {
    import spark.implicits._
    val base =
      if (binDocs.isStreaming) binDocs
      else graft.Tables.ensureMinParallelism(binDocs)
    base.as[BinaryDoc].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { d =>
        val n = d.payload.length.toLong
        def bad(status: String, reason: Option[String]) =
          PerceptualHash(d.doc_id, n, 0, 0, 0L, 0L, status, reason)
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(d.payload))
        if (iis == null || d.payload.isEmpty) bad("unsupported", None)
        else try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) bad("unsupported", None)
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis, true, true)
              val img = reader.read(0)
              val (w, h) = (img.getWidth, img.getHeight)
              if (w < 8 || h < 8) bad("too_small", None)
              else {
                val cellSum = new Array[Long](64)
                val cellN = new Array[Long](64)
                var total = 0L
                var y = 0
                while (y < h) {
                  val cy = y * 8 / h
                  var x = 0
                  while (x < w) {
                    val g = (img.getRGB(x, y) >> 16) & 0xff
                    val idx = cy * 8 + x * 8 / w
                    cellSum(idx) += g
                    cellN(idx) += 1
                    total += g
                    x += 1
                  }
                  y += 1
                }
                val npx = w.toLong * h
                var hi = 0L; var lo = 0L
                var i = 0
                while (i < 64) {
                  if (cellSum(i) * npx >= total * cellN(i)) {
                    if (i < 32) hi |= 1L << (31 - i)
                    else lo |= 1L << (63 - i)
                  }
                  i += 1
                }
                PerceptualHash(d.doc_id, n, w, h, hi, lo, "ok", None)
              }
            } catch {
              case scala.util.control.NonFatal(_) =>
                bad("corrupt", Some("decode_failed"))
            } finally reader.dispose()
          }
        } finally iis.close()
      }
    }
  }

  /** Hamming-bounded near-duplicate image pairs over [[perceptualHash]]
    * output: the SimHash pigeonhole construction on the 64-bit aHash —
    * four 16-bit bands generate candidates (any pair within Hamming
    * distance ≤ `maxHamming` ≤ 3·16 that also shares a band is found;
    * with 4 bands every pair at distance ≤ 3 is GUARANTEED found, and in
    * practice near-dups at small distance almost always share one), each
    * candidate verified with two popcounts. One exchange on
    * (band_idx, band_value); candidate volume is bounded by bucket sizes,
    * the near-dup analog of LSH banding — no O(n²) anywhere.
    *
    * Contract (both engines): emitted pairs = { id_a < id_b : the hashes
    * share ≥ 1 of the 4 bands AND hamming ≤ maxHamming }.
    */
  def perceptualNearPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64)
    val ok = hashes.filter(col("status") === "ok")
      .select(col("doc_id"), col("ahash_hi"), col("ahash_lo"))
    val banded = ok.select(col("doc_id"), col("ahash_hi"), col("ahash_lo"),
      explode(array(
        struct(lit(0).as("band_idx"), shiftright(col("ahash_hi"), 16).as("band_val")),
        struct(lit(1).as("band_idx"), (col("ahash_hi").bitwiseAND(65535L)).as("band_val")),
        struct(lit(2).as("band_idx"), shiftright(col("ahash_lo"), 16).as("band_val")),
        struct(lit(3).as("band_idx"), (col("ahash_lo").bitwiseAND(65535L)).as("band_val"))
      )).as("band"))
      .select(col("doc_id"), col("ahash_hi"), col("ahash_lo"),
        col("band.band_idx").as("band_idx"), col("band.band_val").as("band_val"))
    val a = banded.select(col("doc_id").as("id_a"),
      col("ahash_hi").as("hi_a"), col("ahash_lo").as("lo_a"),
      col("band_idx"), col("band_val"))
    val b = banded.select(col("doc_id").as("id_b"),
      col("ahash_hi").as("hi_b"), col("ahash_lo").as("lo_b"),
      col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Fixed-stride frame-boundary sampling for payloads with NO container
    * index (raw/unknown byte streams): every `stride`-th `frameBytes`
    * slice as (doc_id, frame_idx, byte_offset, frame). For real MP4
    * payloads use [[frameIndex]], which demuxes the container's own
    * stsz/stsc/stco sample tables into exact per-frame geometry — this
    * fixed-size variant is the fallback when there is no index to read.
    */
  def sampleFrames(binDocs: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    val nFrames = floor(length(col("payload")) / frameBytes).cast("long")
    binDocs
      .select(col("doc_id"), col("payload"), nFrames.as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("n_frames"), col("payload"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * frameBytes).as("byte_offset"),
        // substr on BINARY yields the frame slice (1-based offset)
        col("payload").substr((col("frame_idx") * frameBytes + 1).cast("int"),
          lit(frameBytes)).as("frame"))
  }
}
