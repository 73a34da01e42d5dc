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
}
