package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-run construction: lay documents out into
  * fixed token-budget sequences.
  *
  * Documents are packed CONTIGUOUSLY in ascending id order within each
  * bucket: a document's sequence index is `floor(exclusive-prefix-token-sum
  * / budget)`. A sequence can overflow the budget by at most one document
  * (the standard contiguous-packing trade — splitting at the boundary
  * would slice documents across sequences).
  *
  * The BUCKET is the distributed packing unit: one window per bucket, so
  * parallelism scales with bucket count and no global sort exists (a
  * bucketless global packing would funnel the corpus through one window
  * partition — the classic scale-killer). Derive buckets from a hash of
  * the id ([[Sampling.unitHash]]), a language/domain column, or any other
  * sharding key; packing is deterministic per (bucket, id order).
  */
object Packing {

  /** Adds `seq`: the document's sequence index within its bucket.
    * `tokenCol` is the per-document token count; `budget` the per-sequence
    * token target.
    */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
      bucketCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(bucketCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__cum", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("seq", floor(col("__cum") / budget).cast("long"))
      .drop("__cum")
  }

  /** Length-bucketed batch assembly — the dynamic-batching op every
    * trainer runs to cut padding: docs are banded by length
    * (`bandWidth`-token bands within each `bucketCol` shard), each band
    * is sliced into `batchSize`-doc batches in (length, id) order, and
    * the report measures the padding a rectangular batch tensor wastes:
    * waste = Σ(batch_max·batch_n − batch_tokens) / Σ(batch_max·batch_n),
    * integer ppm. Tight bands ⇒ near-zero waste; one giant band ⇒ the
    * unbatched baseline.
    *
    * Windows partition on (shard, band) — parallelism scales with
    * shard×band count, the [[packSequences]] posture; batch metrics are
    * one keyed aggregation.
    */
  def lengthBatchedWaste(df: DataFrame, idCol: String, tokenCol: String,
      bucketCol: String, bandWidth: Long, batchSize: Int): DataFrame = {
    require(bandWidth > 0 && batchSize > 0)
    val banded = df.withColumn("band",
      expr(s"$tokenCol div ${bandWidth}L"))
    val w = Window.partitionBy(bucketCol, "band")
      .orderBy(col(tokenCol), col(idCol))
    val batched = banded
      .withColumn("batch",
        ((row_number().over(w) - 1) / batchSize).cast("long"))
      .groupBy(col(bucketCol), col("band"), col("batch"))
      .agg(count(lit(1)).as("n"), max(col(tokenCol)).as("mx"),
        sum(col(tokenCol)).as("toks"))
    batched.groupBy(col(bucketCol), col("band"))
      .agg(count(lit(1)).as("n_batches"), sum("n").as("n_docs"),
        sum(col("mx") * col("n")).as("padded"), sum("toks").as("toks"))
      .select(col(bucketCol), col("band"), col("n_batches"), col("n_docs"),
        expr("((padded - toks) * 1000000) div padded").as("waste_ppm"))
  }

  /** WebDataset/tar-style shard byte layout — the storage-manifest step
    * of a multimodal training corpus (Beaumont et al.'s webdataset
    * convention: records live in tar shards; a reader needs each
    * member's byte offset to seek without scanning). Every record costs
    * one `blockBytes` header plus its payload rounded UP to a block
    * multiple; `byte_offset` is the exclusive prefix sum of those entry
    * sizes within the record's deterministic shard ([[Sampling.shardOf]]
    * hash contract), in ascending id order.
    *
    * One shard-partitioned window — parallelism scales with shard count
    * and no global sort exists, the [[packSequences]] posture. All
    * positive-integer arithmetic (`div` ≡ SQL `//`).
    */
  def shardLayout(df: DataFrame, idCol: String, sizeCol: org.apache.spark.sql.Column,
      nShards: Int, blockBytes: Int = 512): DataFrame = {
    require(blockBytes > 0, s"blockBytes $blockBytes")
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", Sampling.shardOf(col(idCol), nShards))
      .withColumn("payload_bytes", sizeCol.cast("long"))
      .withColumn("entry_bytes",
        expr(s"((payload_bytes + ${blockBytes - 1}) div $blockBytes) * $blockBytes" +
          s" + $blockBytes"))
      .withColumn("byte_offset",
        coalesce(sum(col("entry_bytes")).over(w), lit(0L)))
  }

  /** Sliding-window chunking with overlap — the long-document training
    * prep that [[graft.operators.TextAnalysis.chunkByTokens]]' disjoint
    * chunks cannot express: windows of `window` tokens every `stride`
    * tokens (stride < window ⇒ overlap carries context across chunk
    * boundaries, the standard long-context recipe).
    *
    * Window-count contract (identical in the oracle): a doc with n ≥ 1
    * tokens emits `1 + max(ceil((n − window) / stride), 0)` windows;
    * window k starts at token k·stride and takes `min(window, n − start)`
    * tokens — only the LAST window may be short. Zero-token docs emit
    * nothing. Pure projection + per-row generator: no shuffle, no state,
    * linear in output volume.
    */
  def slidingWindows(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"slidingWindows needs 0 < stride <= window, got window=$window stride=$stride")
    val toks = graft.functions.Fns.tokens(col(textCol))
    df.select(col(idCol), toks.as("__t"))
      .withColumn("__n", size(filter(col("__t"), t => t =!= "")))
      .filter(col("__n") > 0)
      .withColumn("__nw",
        lit(1) + greatest(lit(0L),
          expr(s"(__n - $window + ${stride - 1}) div $stride")))
      .select(col(idCol), col("__t"), col("__n"),
        explode(sequence(lit(0L), col("__nw") - 1)).as("win_idx"))
      .select(col(idCol), col("win_idx"),
        (col("win_idx") * stride).as("start_tok"),
        least(lit(window), col("__n") - col("win_idx") * stride)
          .cast("int").as("n_tokens"),
        concat_ws(" ", slice(col("__t"),
          (col("win_idx") * stride + 1).cast("int"),
          least(lit(window), col("__n") - col("win_idx") * stride).cast("int")))
          .as("window_text"))
  }

  /** Deterministic span-corruption masks (the T5 denoising objective's
    * data-prep step, Raffel et al. 2020 §3.1.4): every `every`-th token
    * position starts a masked span of `spanLen` tokens, phase-shifted per
    * doc by `doc_id mod every` so spans do not align across documents.
    * The published recipe samples spans at random; this is the engine's
    * REPRODUCIBLE analog (the deterministic-hash-keep precedent from
    * [[Sampling]]) — rerunning the prep yields byte-identical masks, and
    * a relational oracle can replay every span.
    *
    * Emits one row per span: (id, span_idx, start_tok, span_tokens,
    * sentinel_id) with sentinel_id = span_idx (the <extra_id_k>
    * numbering); spans clip at the doc end, zero-length clips drop.
    * `every > spanLen` keeps spans disjoint. Projection + generator,
    * no shuffle.
    */
  def spanCorruptionMask(df: DataFrame, idCol: String, textCol: String,
      spanLen: Int, every: Int): DataFrame = {
    require(spanLen > 0 && every > spanLen,
      s"spanCorruptionMask needs every > spanLen > 0, got span=$spanLen every=$every")
    val toks = graft.functions.Fns.tokens(col(textCol))
    df.select(col(idCol), size(filter(toks, t => t =!= "")).as("__n"))
      .filter(col("__n") > 0)
      .withColumn("__phase", (col(idCol) % every).cast("long"))
      // span starts: phase, phase+every, ... while < n
      .withColumn("__ns",
        greatest(lit(0L),
          expr(s"(__n - __phase + ${every - 1}) div $every")))
      .filter(col("__ns") > 0)
      .select(col(idCol), col("__n"), col("__phase"),
        explode(sequence(lit(0L), col("__ns") - 1)).as("span_idx"))
      .select(col(idCol), col("span_idx"),
        (col("__phase") + col("span_idx") * every).as("start_tok"),
        least(lit(spanLen),
          col("__n") - (col("__phase") + col("span_idx") * every))
          .cast("int").as("span_tokens"),
        col("span_idx").cast("int").as("sentinel_id"))
      .filter(col("span_tokens") > 0)
  }
}
