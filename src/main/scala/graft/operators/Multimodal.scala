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

  /** Frame-sampling PLUMBING for video-like payloads: every `stride`-th
    * frame boundary as (doc_id, frame_idx, byte_offset, frame_bytes).
    * Deterministic arithmetic over the (stubbed) container geometry —
    * a real demuxer would read the frame index instead; the partition
    * shape (pure projection + generator, no shuffle) is what survives the
    * swap. Frames are fixed-size `frameBytes` slices here.
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
