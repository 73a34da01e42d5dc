package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) travels as opaque
  * `binary` columns with typed metadata alongside. The Spark-side contract —
  * schema, partition-parallel batched decode, stable output shape — is real
  * and tested; the actual codec call is stubbed with a deterministic fake
  * because media libraries aren't available in this environment (marked
  * STUB below). Swapping in a real decoder changes only `decodeStub`.
  *
  * Scale posture: decode runs per-partition with no shuffle; partition
  * sizing (spark.sql.files.maxPartitionBytes) bounds peak memory per task;
  * decoded features are columnar structs so downstream pruning works.
  */
object Multimodal {

  /** Decoded-media metadata produced by the (stubbed) decoder. */
  case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      format: String,
      width: Int,
      height: Int,
      content_hash: String)

  case class BinaryDoc(doc_id: Long, payload: Array[Byte])

  /** STUB decoder: a real implementation would parse the container header
    * (e.g. PNG IHDR / JPEG SOF0) and decode frames. The fake derives
    * deterministic "dimensions" from payload bytes so the full pipeline is
    * testable end-to-end with stable results.
    */
  private def decodeStub(d: BinaryDoc): MediaMeta = {
    val n = d.payload.length.toLong
    val head = if (d.payload.nonEmpty) d.payload(0) & 0xff else 0
    val fmt = head % 3 match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "webp"
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val hash = md.digest(d.payload).map("%02x".format(_)).mkString
    MediaMeta(d.doc_id, n, fmt, 64 + (n % 512).toInt, 64 + (head * 7 % 512), hash)
  }

  /** Attach a binary payload column (here: utf-8 of text — stands in for
    * real media bytes) — the ingest shape a media pipeline would produce.
    */
  def withBinaryPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).cast("binary").as("payload"))

  /** Partition-parallel batched decode: binary column → typed metadata
    * columns. mapPartitions (not per-row UDF) so a real decoder can
    * amortize codec init per task — the Scala analogue of mapInPandas
    * batch semantics.
    */
  def decodeMeta(spark: SparkSession, binDocs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    graft.Tables.ensureMinParallelism(binDocs).as[BinaryDoc].mapPartitions { it =>
      // per-partition decoder init would go here (STUB: none needed)
      it.map(decodeStub)
    }
  }
}
