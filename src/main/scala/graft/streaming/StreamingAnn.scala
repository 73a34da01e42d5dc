package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Ann

/** Streaming ANN ingest — the embeddings counterpart of the incremental
  * near-dup gate's serve shape (VERDICT r12 #6): new vectors arriving on
  * a staging drop are assigned to their IVF cell against the FROZEN
  * coarse centroids and PQ-coded with the FROZEN books, then appended to
  * the standing code table. The quantizers never retrain in-stream, so
  * every emitted row is bit-identical to what [[Ann.ivfPqAppend]] would
  * produce for the same vector in any batch split (append is associative
  * — Round11bOpsSpec; stream≡append — Round13OpsSpec + StreamingSpec).
  *
  * Plan shape: the whole transform is [[Ann.ivfPqCodeProjection]] — a
  * pure literal-expression projection (centroids/books are
  * driver-bounded), so the stream carries NO join, NO aggregation, NO
  * state store; at 100 TB the ingest cost is exactly one codegen'd
  * projection per arriving vector, and the parquet append in
  * [[ivfPqIngestToParquet]] is the only I/O.
  */
object StreamingAnn {

  /** NDJSON staging schema for embedding drops. */
  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(DoubleType)),
    StructField("ingest_ts", LongType)))

  /** Streaming (id, codes, centroid) rows for every vector landing in
    * `stagingDir` — the unsunk transform, composable with any sink.
    */
  def ivfPqIngestStream(spark: SparkSession, stagingDir: String,
      index: Ann.IvfPqIndex): DataFrame =
    Ann.ivfPqCodeProjection(index,
      spark.readStream.schema(embSchema).json(stagingDir),
      "vec_id", "embedding")

  /** Deployment sink: append the code rows to `indexDir` as parquet (the
    * standing serve table [[Ann.IvfPqIndex.encoded]] reads). Returns the
    * started query; callers own `processAllAvailable`/`stop`.
    */
  def ivfPqIngestToParquet(spark: SparkSession, stagingDir: String,
      index: Ann.IvfPqIndex, indexDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    ivfPqIngestStream(spark, stagingDir, index)
      .writeStream.format("parquet")
      .option("path", indexDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()

  /** Streaming NSW graph maintenance (VERDICT r13 #3): vectors landing in
    * `stagingDir` are inserted into the standing graph index by the NSW
    * insert rule — each micro-batch SEARCHES the current adjacency for
    * its members' top-`kLink` neighbors ([[Ann.graphInsertEdges]], the
    * corpus-size-insensitive walk) and APPENDS the bidirectional edges
    * to `adjDir` and the vectors to `corpusDir`. The graph therefore
    * grows in arrival order: later micro-batches link to earlier inserts
    * exactly as a sequential [[Ann.graphInsert]] fold over the same
    * splits would — stream ≡ batch-fold, edge-for-edge
    * (Round14GraphSpec). No state store: the standing index IS the
    * state, and each micro-batch's work is one bounded walk plus two
    * appends.
    *
    * `foreachBatch` is the right sink shape because the batch must read
    * the CURRENT index (self-referential append — the read's file
    * listing happens before the write lands, and the edge set is
    * checkpoint-cut first so the append never scans its own output).
    */
  def graphIngestToParquet(spark: SparkSession, stagingDir: String,
      adjDir: String, corpusDir: String, checkpointDir: String,
      kLink: Int = 4, entryIds: Seq[Long] = Seq(0L), beamWidth: Int = 16,
      hops: Int = 2, expandHops: Int = 2,
      maxFilesPerTrigger: Option[Int] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream.schema(embSchema)
    maxFilesPerTrigger.foreach(m =>
      reader.option("maxFilesPerTrigger", m.toString))
    reader.json(stagingDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
          .localCheckpoint()
        if (!b.isEmpty) {
          val adj = spark.read.parquet(adjDir)
          val corpus = spark.read.parquet(corpusDir)
          val edges = Ann.graphInsertEdges(adj, corpus, b,
              "vec_id", "embedding", kLink, entryIds, beamWidth, hops,
              expandHops)
            .localCheckpoint() // materialize BEFORE appending to adjDir
          edges.write.mode("append").parquet(adjDir)
          b.write.mode("append").parquet(corpusDir)
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** [[graphIngestToParquet]] for the LAYERED (HNSW) index: each
    * micro-batch runs [[Ann.layeredInsertEdges]] — new vectors draw their
    * deterministic level and link into every layer ≤ level — and appends
    * the (layer, src, dst) edges to the layer-partitioned standing
    * adjacency plus the vectors to the corpus. Same stream ≡ batch-fold
    * contract as the flat maintainer (arrival-order growth; within a
    * micro-batch inserts never link to each other).
    */
  def layeredIngestToParquet(spark: SparkSession, stagingDir: String,
      layersDir: String, corpusDir: String, checkpointDir: String,
      maxLevel: Int, p: Int = 4, kLink: Int = 4, beamWidth: Int = 16,
      hops: Int = 2, expandHops: Int = 2,
      maxFilesPerTrigger: Option[Int] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream.schema(embSchema)
    maxFilesPerTrigger.foreach(m =>
      reader.option("maxFilesPerTrigger", m.toString))
    reader.json(stagingDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
          .localCheckpoint()
        if (!b.isEmpty) {
          val layers = spark.read.parquet(layersDir)
          val corpus = spark.read.parquet(corpusDir)
          val edges = Ann.layeredInsertEdges(layers, corpus, b,
              "vec_id", "embedding", maxLevel, p, kLink, beamWidth, hops,
              expandHops)
            .localCheckpoint() // materialize BEFORE appending to layersDir
          edges.write.mode("append").partitionBy("layer").parquet(layersDir)
          b.write.mode("append").parquet(corpusDir)
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()
  }
}
