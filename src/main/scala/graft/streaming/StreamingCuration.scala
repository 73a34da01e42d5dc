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

  /** Adds the exploded MinHash-LSH band-bucket column — ONE shared
    * definition for the stream and its batch replica, so the
    * stream ≡ batch identity proof is over the identical hash family and
    * key format by construction. Per-row HOF fold (min of each permuted
    * rolling hash over the shingle array) — a pure projection, NOT the
    * batch explode+groupBy (stream-safe, zero shuffle; min over the raw
    * shingle array equals min over the distinct set, so it also agrees
    * with [[graft.operators.Dedup.minhashSignatures]]). A doc too short
    * to shingle gets a per-doc unique bucket (collides with nothing).
    */
  private[graft] def withBandBuckets(df: DataFrame, n: Int,
      numHashes: Int, bandSize: Int): DataFrame = {
    require(numHashes % bandSize == 0, "numHashes must be divisible by bandSize")
    val numBands = numHashes / bandSize
    val hs = transform(Fns.shingles(col("text"), n), s => Fns.rollingHash(s))
    val sigs = (0 until numHashes).map(i =>
      array_min(transform(col("hs"), h => Fns.permuteHash(h, i))))
    val bandCols = (0 until numBands).map { b =>
      concat_ws("|", lit(b) +: (0 until bandSize).map(i => sigs(b * bandSize + i)): _*)
    }
    df.withColumn("hs", hs)
      .withColumn("bucket",
        explode(when(size(col("hs")) > 0, array(bandCols: _*))
          .otherwise(array(concat(lit("short|"), col("doc_id"))))))
      .drop("hs")
  }

  /** The stream's band buckets computed with the BATCH-scale plan shape
    * (shingle explode → one map-side-combined k-min aggregate — all
    * codegen'd, vs the stream's interpreted per-row HOF fold, which is
    * stream-mandatory but ~4× slower per row): same (doc_id, bucket)
    * SET by construction — min over the raw shingle multiset equals min
    * over its distinct set, and the key format is restated identically.
    * Round12OpsSpec pins the two constructions equal on a fixture.
    * Docs too short to shingle fall out of the explode and are restored
    * with their per-doc unique bucket.
    */
  private[graft] def bandBucketsRelational(docs: DataFrame, n: Int,
      numHashes: Int, bandSize: Int): DataFrame = {
    require(numHashes % bandSize == 0, "numHashes must be divisible by bandSize")
    val numBands = numHashes / bandSize
    // relational shingles (Dedup.shingleIndex) — Fns.shingles' HOF
    // lambdas run interpreted per row, the known corpus-scale pathology;
    // min over the DISTINCT shingle set equals min over the multiset,
    // so the signatures are unchanged
    val sh = graft.operators.Dedup
      .shingleIndex(docs, "doc_id", "text", n)
      .withColumnRenamed("doc", "doc_id")
      .withColumn("h", Fns.rollingHash(col("s")))
    val aggs = (0 until numHashes).map(i =>
      min(Fns.permuteHash(col("h"), i)).as(s"sig_$i"))
    val sig = sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val bandCols = (0 until numBands).map { b =>
      concat_ws("|",
        lit(b) +: (0 until bandSize).map(i => col(s"sig_${b * bandSize + i}")): _*)
    }
    val bucketed = sig.select(col("doc_id"),
      explode(array(bandCols: _*)).as("bucket"))
    // short docs never enter the shingle explode; detect them from the
    // token count DIRECTLY (a cheap second scan of docs) instead of an
    // anti join against sig — which would hang the whole signature
    // pipeline off a second consumer and (AQE willing or not) recompute
    // it. size(tokens) < n ⟺ empty shingle array ⟺ the stream
    // expression's short branch.
    val short = docs.filter(size(Fns.tokens(col("text"))) < n)
      .select(col("doc_id"), concat(lit("short|"), col("doc_id")).as("bucket"))
    bucketed.unionByName(short)
  }

  /** Batch replica of [[nearDupDocumentStream]]'s keep-rule on a STATIC
    * corpus: a doc is kept iff it is the (event_time, doc_id)-earliest
    * claimant of EVERY one of its band buckets. This is provably the
    * stream's decision when rows arrive in event-time order: claimBucket
    * marks a bucket claimed by its first-processed row (kept or not) and
    * drops every later claimant, and the stream sorts each bucket's rows
    * by (event_time, doc_id) within a trigger — so across any batch
    * split, bucket ownership is exactly "earliest (event_time, doc_id)".
    * StreamingSpec pins the identity; the oracle row
    * `dd_stream_neardup_batch` gates the replica itself.
    * Buckets come from [[bandBucketsRelational]] (the codegen'd batch
    * shape); then two keyed aggregations + one keyed join — no
    * all-pairs anywhere.
    */
  def nearDupBatchReplica(docs: DataFrame, timeCol: String, n: Int = 3,
      numHashes: Int = 8, bandSize: Int = 2): DataFrame = {
    val banded = bandBucketsRelational(docs, n, numHashes, bandSize)
      .join(docs.select(col("doc_id"), col(timeCol).as("__t")), "doc_id")
      .select(col("bucket"), col("doc_id"), col("__t"))
    // SINGLE-LINEAGE first-claimant resolution (the minhashLshPairs
    // grouped-bucket trick): one aggregation computes each bucket's
    // winner AND carries its members, so the expensive signature
    // pipeline has exactly one consumer — a winner-join formulation
    // hangs it off two-to-four consumers and recomputes it whenever
    // AQE's broadcast choice defeats exchange reuse (measured 37 s vs
    // 12 s at sf1 on the copyvar corpus). Bucket member lists are
    // bounded in expectation by the band width (the LSH dial).
    banded.groupBy("bucket")
      .agg(min(struct(col("__t"), col("doc_id"))).as("__f"),
        collect_list(col("doc_id")).as("members"))
      .select(col("__f.doc_id").as("first_doc"),
        explode(col("members")).as("doc_id"))
      .groupBy("doc_id")
      .agg(min(when(col("doc_id") === col("first_doc"), 1).otherwise(0))
        .as("all_first"))
      .filter(col("all_first") === 1)
      .select("doc_id")
  }

  /** A document's band-bucket row headed into the near-dup state store. */
  case class BandRow(bucket: String, doc_id: Long, text: String, lang: String,
      source: String, event_time: java.sql.Timestamp)

  /** Per-band freshness verdict out of the state function. */
  case class BandVerdict(doc_id: Long, text: String, lang: String,
      source: String, event_time: java.sql.Timestamp, fresh: Boolean)

  /** Streaming NEAR-dup dedup: the incremental counterpart of the batch
    * [[graft.operators.Dedup.minhashLshPairs]] path. A new document is
    * dropped when ANY of its MinHash-LSH band buckets was already claimed
    * by an earlier document inside the dedup horizon — so a lightly-edited
    * re-drop (not byte-identical, which [[documentStream]]'s exact
    * fingerprint would miss) is suppressed.
    *
    * Stream shape, stage by stage:
    *  1. signature: per-row HOF fold over the shingle array (min of each
    *     permuted hash) — a pure projection, NOT the batch explode+groupBy
    *     (stream-safe, zero shuffle, same hash family so batch and stream
    *     agree on what is a near-dup);
    *  2. band explode: numHashes/bandSize rows per doc;
    *  3. [[org.apache.spark.sql.streaming.GroupState]] keyed on the BAND
    *     BUCKET with event-time timeout: first claimant of a bucket is
    *     fresh, later claimants are not; state is one timestamp per live
    *     bucket and the watermark retires it — bounded state, no
    *     stream-stream join;
    *  4. append-mode per-(doc, event_time) aggregation: keep iff EVERY
    *     band was fresh (bool_and) — LSH's any-collision-drops rule.
    *
    * Docs too short to shingle get a per-doc unique bucket (no signature →
    * nothing to collide with → kept; the quality gate is where shorties
    * die). LSH false positives (unrelated docs sharing a band) drop a doc
    * without a verify pass — the price of bounded state; the batch sweep
    * with exact-Jaccard verification remains the ground truth.
    */
  def nearDupDocumentStream(spark: SparkSession, stagingDir: String,
      n: Int = 3, numHashes: Int = 8, bandSize: Int = 2,
      watermark: String = "1 hour"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val horizonMs = {
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(watermark))
      require(iv.months == 0, "near-dup horizon must be a fixed-length interval")
      iv.days * 86400000L + iv.microseconds / 1000
    }

    val banded = withBandBuckets(
        spark.readStream
          .schema(docSchema)
          .json(stagingDir)
          .withColumn("event_time", to_timestamp(from_unixtime(col("ingest_ts"))))
          .withWatermark("event_time", watermark),
        n, numHashes, bandSize)
      .select(col("bucket"), col("doc_id"), col("text"), col("lang"),
        col("source"), col("event_time"))
      .as[BandRow]

    def claimBucket(bucket: String, rows: Iterator[BandRow],
        state: GroupState[Long]): Iterator[BandVerdict] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val sorted = rows.toSeq.sortBy(r => (r.event_time.getTime, r.doc_id))
        var claimed = state.exists
        val out = sorted.map { r =>
          val v = BandVerdict(r.doc_id, r.text, r.lang, r.source, r.event_time,
            fresh = !claimed)
          claimed = true
          v
        }
        if (sorted.nonEmpty) {
          if (!state.exists) state.update(sorted.head.event_time.getTime)
          state.setTimeoutTimestamp(
            sorted.map(_.event_time.getTime).max + horizonMs)
        }
        out.iterator
      }
    }

    // Spark's global-watermark check flags ANY aggregation downstream of
    // flatMapGroupsWithState because the state function COULD emit rows
    // with arbitrary old timestamps. claimBucket cannot: every verdict is
    // emitted in the same trigger as its input row and carries that row's
    // own event_time unchanged, so its output is never later-than-input
    // and the flagged hazard is structurally impossible here. Disabling
    // the check (the documented opt-out for exactly this situation)
    // downgrades it to a logged warning session-wide.
    spark.conf.set(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val verdicts = banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(claimBucket)

    verdicts.toDF()
      .withWatermark("event_time", watermark)
      .groupBy(col("event_time"), col("doc_id"))
      .agg(
        min(when(col("fresh"), 1).otherwise(0)).as("all_fresh"),
        first(col("text")).as("text"),
        first(col("lang")).as("lang"),
        first(col("source")).as("source"))
      .filter(col("all_fresh") === 1)
      .select("doc_id", "text", "lang", "source", "event_time")
  }

  /** Ceiling on the inlined eval-suite n-gram array: 4M longs = 32 MB of
    * literal per microbatch plan — already past where inlining is wise;
    * the guard turns a silently bloating plan into a loud failure with a
    * prescription (every driver materialization in this repo carries one).
    */
  val MaxInlineBenchHashes: Int = 4 << 20

  /** Streaming decontamination: drop any document sharing a word-n-gram
    * with the benchmark set. The bench side is a STATIC eval suite —
    * small by construction — so its distinct n-gram hashes are collected
    * once and inlined as an array literal; the stream-side check is a
    * codegen'd `arrays_overlap` per row, no join and no state. (At
    * batch scale the same contract is the broadcast semi-join in
    * [[graft.operators.Contamination]].)
    *
    * The collect is BOUNDED-OR-LOUD: past [[MaxInlineBenchHashes]] the
    * call refuses with sizing guidance instead of silently building a
    * multi-MB literal into every microbatch plan — run the batch
    * decontaminate per microbatch via foreachBatch at that size.
    */
  def decontaminate(docs: DataFrame, bench: DataFrame, textCol: String,
      n: Int, maxInline: Int = MaxInlineBenchHashes): DataFrame = {
    // LIMIT rides below the collect: an over-budget eval set is refused
    // after materializing at most ceiling+1 rows, not the whole set
    val benchHashes: Array[Long] = bench
      .select(explode(Fns.shingles(col(textCol), n)).as("s"))
      .select(Fns.rollingHash(col("s")).as("gh"))
      .distinct()
      .limit(maxInline + 1)
      .collect().map(_.getLong(0))
    require(benchHashes.length <= maxInline,
      s"eval suite yields > $maxInline distinct $n-gram hashes — " +
        "too large to inline into a streaming plan literal; decontaminate " +
        "per microbatch with Contamination.decontaminate (broadcast " +
        "semi-join) inside foreachBatch instead")
    val streamGrams = transform(Fns.shingles(col(textCol), n),
      s => Fns.rollingHash(s))
    docs.filter(!arrays_overlap(streamGrams, lit(benchHashes)))
  }
}
