package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Runtime semi-join pruning as a first-class operator: build a bloom
  * bitset over the small side's join keys, prefilter the big side with a
  * codegen'd membership probe, then run the exact join. The exact join
  * removes bloom false positives, so results are identical to the plain
  * join — the bloom only reduces how many big-side rows reach the
  * join's exchange.
  *
  * This is the same idea as Spark's own `InjectRuntimeFilter` rewrite
  * (spark.sql.optimizer.runtime.bloomFilter.enabled), exposed as an
  * operator so pipelines can apply it where the optimizer's heuristics
  * don't reach (e.g. keys that arrive through a non-equi path, or a
  * pre-aggregated dimension).
  *
  * 100 TB posture: the build aggregate shuffles exactly numBits/8 bytes
  * per map-side partial (one buffer per task, merged by word-wise OR);
  * the materialized bitset is bounded driver state — the same contract as
  * broadcast-join key materialization, NOT an O(rows) collect. The probe
  * runs inside whole-stage codegen on the scan side of the big table, so
  * non-joining rows are dropped before the join exchange. Useful exactly
  * when the dimension is too big to broadcast but still selective.
  */
object BloomPrefilterJoin {

  val DefaultNumBits: Int = 1 << 20 // 128 KiB bitset
  val DefaultNumHashes: Int = 5

  /** Materialize the small side's key bloom (bounded: numBits/8 bytes). */
  def buildBloom(small: DataFrame, key: String,
      numBits: Int = DefaultNumBits, numHashes: Int = DefaultNumHashes): Array[Byte] =
    small.agg(Fns.bloomFilterBuild(col(key).cast("long"), numBits, numHashes))
      .head().getAs[Array[Byte]](0)

  /** Exact inner join of `big` and `small` on bigKey = smallKey, with the
    * big side bloom-prefiltered before the join.
    */
  def join(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      numBits: Int = DefaultNumBits, numHashes: Int = DefaultNumHashes): DataFrame = {
    val bloom = buildBloom(small, smallKey, numBits, numHashes)
    prefilter(big, col(bigKey), bloom, numHashes)
      .join(small, col(bigKey) === col(smallKey))
  }

  /** The probe-side half on its own, for callers composing manually. */
  def prefilter(big: DataFrame, bigKey: Column, bloom: Array[Byte],
      numHashes: Int = DefaultNumHashes): DataFrame =
    big.filter(Fns.bloomMightContain(bigKey.cast("long"), bloom, numHashes))
}
