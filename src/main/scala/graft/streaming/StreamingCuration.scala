package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Fns
import graft.operators.TextAnalysis

/** Incremental corpus curation: the batch curation gates (quality score,
  * Gopher rule battery, repetition filters, PII redaction, contamination
  * probe, exact dedup) applied to a DOCUMENT STREAM — new corpus drops
  * curate as they land instead of waiting for the next batch sweep.
  *
  * Every gate here is deliberately a pure per-row column expression (the
  * batch operators were already built that way), so the streaming plan has
  * no stream-unsupported construct: no window-over-doc, no stream-stream
  * join. The only stateful pieces are `dropDuplicatesWithinWatermark`
  * (bounded by the watermark) and the file-source offset log.
  */
object StreamingCuration {

  /** NDJSON document-drop schema: content + an ingest timestamp (epoch
    * seconds) that drives the dedup watermark.
    */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("ingest_ts", LongType)))

  /** Document stream from an NDJSON staging dir, watermarked on ingest
    * time and exact-deduped on the full-text rolling-hash fingerprint
    * within the watermark window (re-drops of the same document are
    * suppressed; state is bounded by the watermark — the streaming
    * rendering of `dd_exact_dedup`'s first-wins contract).
    */
  def documentStream(spark: SparkSession, stagingDir: String,
      watermark: String = "1 hour"): DataFrame =
    spark.readStream
      .schema(docSchema)
      .json(stagingDir)
      .withColumn("event_time", to_timestamp(from_unixtime(col("ingest_ts"))))
      .withColumn("fingerprint", Fns.rollingHash(col("text")))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Quality gate chain: composite quality score, Gopher-style repetition
    * gate, and PII redaction — identical semantics to the batch
    * `pipeline_corpus_curation` stages, as stream-safe projections.
    */
  def curate(docs: DataFrame, minQuality: Double = 0.5): DataFrame =
    docs
      .filter(TextAnalysis.qualityScore(col("text")) >= minQuality)
      .filter(!TextAnalysis.repetitive(col("text")))
      .withColumn("text", TextAnalysis.redactPii(col("text")))

  /** Streaming decontamination: drop any document sharing a word-n-gram
    * with the benchmark set. The bench side is a STATIC eval suite —
    * small by construction — so its distinct n-gram hashes are collected
    * once and inlined as an array literal; the stream-side check is a
    * codegen'd `arrays_overlap` per row, no join and no state. (At
    * batch scale the same contract is the broadcast semi-join in
    * [[graft.operators.Contamination]]; an eval set too large to inline
    * here is too large to be an eval set.)
    */
  def decontaminate(docs: DataFrame, bench: DataFrame, textCol: String,
      n: Int): DataFrame = {
    val benchHashes: Array[Long] = bench
      .select(explode(Fns.shingles(col(textCol), n)).as("s"))
      .select(Fns.rollingHash(col("s")).as("gh"))
      .distinct()
      .collect().map(_.getLong(0))
    val streamGrams = transform(Fns.shingles(col(textCol), n),
      s => Fns.rollingHash(s))
    docs.filter(!arrays_overlap(streamGrams, lit(benchHashes)))
  }
}
