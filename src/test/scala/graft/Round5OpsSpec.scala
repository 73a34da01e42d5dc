package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Round-5 operators: SemDeDup scale contract (cluster sizing + pair-volume
  * guard).
  */
class Round5OpsSpec extends SparkSpec {

  // ---- SemDeDup scale contract -------------------------------------------

  test("semanticDedupNLists: √n default, n/target when a target is given") {
    assert(Dedup.semanticDedupNLists(10000) == 100)
    assert(Dedup.semanticDedupNLists(1000000) == 1000)
    assert(Dedup.semanticDedupNLists(10000, Some(100L)) == 100)
    assert(Dedup.semanticDedupNLists(1000000, Some(200L)) == 5000)
    // degenerate corpora: at least 1 cluster, never more clusters than rows
    assert(Dedup.semanticDedupNLists(0) == 1)
    assert(Dedup.semanticDedupNLists(3, Some(1L)) == 3)
    assert(Dedup.semanticDedupNLists(5, Some(1000L)) == 1)
    intercept[IllegalArgumentException](Dedup.semanticDedupNLists(10, Some(0L)))
  }

  test("semanticDedup refuses an under-clustered call (pair-volume guard)") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    // nLists=1 puts the whole corpus in one cluster: Σ(cluster²) = n² —
    // exactly the all-pairs-in-disguise shape the guard exists to reject
    val e = intercept[IllegalArgumentException] {
      Dedup.semanticDedup(emb, "vec_id", "embedding",
        nLists = 1, threshold = 0.4, maxPairComparisons = 100L)
    }
    assert(e.getMessage.contains("pair volume"))
    assert(e.getMessage.contains("semanticDedupNLists"))
  }

  // ---- real ImageIO codec ------------------------------------------------

  test("decodeMeta really decodes PNG and JPEG payloads (ImageIO round-trip)") {
    import spark.implicits._
    val specs = Seq(
      Multimodal.ImageSpec(1L, 5, 9, "png", 40),
      Multimodal.ImageSpec(2L, 12, 3, "jpeg", 200),
      Multimodal.ImageSpec(3L, 1, 1, "png", 0)).toDS()
    val bin = Multimodal.synthesizeImages(spark, specs)
    val metas = Multimodal.decodeMeta(spark, bin).collect().sortBy(_.doc_id)
    assert(metas.map(m => (m.doc_id, m.format, m.width, m.height)).toSeq ==
      Seq((1L, "png", 5, 9), (2L, "jpeg", 12, 3), (3L, "png", 1, 1)))
    // the real path hashed the actual container bytes
    val payload1 = bin.filter(col("doc_id") === 1)
      .head().getAs[Array[Byte]]("payload")
    assert(metas.head.n_bytes == payload1.length)
    // PNG pixels survive the round-trip exactly (lossless): decode and
    // check the gray fill
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload1))
    assert((img.getRGB(2, 4) & 0xffffff) == 40 * 0x010101)
  }

  test("decodeMeta falls back to the deterministic stub for non-image payloads") {
    import spark.implicits._
    val bin = Seq((7L, "just some text, no image magic"))
      .toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload").cast("binary"))
    val m = Multimodal.decodeMeta(spark, bin).head()
    // stub shape: dims derived from byte arithmetic, not a decoded raster
    assert(m.n_bytes == 30 && m.width == 64 + 30 && m.height == 64 + ('j' * 7 % 512))
  }

  test("a sniffed-but-corrupt image fails the decode loudly, not silently") {
    import spark.implicits._
    val whole = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val truncated = whole.take(24) // PNG magic + partial IHDR
    val bin = Seq(Tuple1(9L)).toDF("doc_id")
      .select(col("doc_id"), lit(truncated).as("payload"))
    val e = intercept[Exception] {
      Multimodal.decodeMeta(spark, bin).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(_.contains("failed to decode"))))
  }

  test("semanticDedupAuto sizes the quantizer from the corpus and runs") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val n = emb.count()
    val survivors = Dedup.semanticDedupAuto(emb, "vec_id", "embedding",
      threshold = 0.4)
    val rows = survivors.count()
    assert(rows > 0 && rows <= n)
    // centroid ids must span the √n-sized codebook, not a pinned constant
    val k = Dedup.semanticDedupNLists(n)
    val maxCentroid = survivors.agg(max(col("centroid"))).head().getInt(0)
    assert(maxCentroid < k)
  }
}
