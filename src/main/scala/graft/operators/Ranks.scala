package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT rank normalization — the scale-safe replacement for
  * `ntile(k).over(Window.orderBy(...))` with no partition clause, which
  * funnels the entire relation through ONE task (Spark itself WARNs
  * "Moving all data to a single partition"). Correct at any size, the
  * textbook single-partition sort bottleneck at 100×.
  *
  * Shape (the same bucket-histogram rank as [[Sampling.globalShuffle]],
  * generalized from hash order to an arbitrary sort order):
  *
  *   1. assign each row a BUCKET that is monotone non-decreasing in the
  *      leading sort column — bucket boundaries come from approxQuantile
  *      cutpoints (a driver materialization bounded by `buckets`, the
  *      repo's IVF-centroid contract) or from any caller-supplied
  *      monotone expression (e.g. `zval >> 8` when the domain is known);
  *   2. one keyed count-aggregation builds the ≤`buckets`-row histogram;
  *      its exclusive prefix sum (an unpartitioned window over a
  *      CONSTANT-bounded post-aggregate relation — never the corpus) and
  *      grand total come back via a broadcast join;
  *   3. rows rank WITHIN their bucket (`Window.partitionBy(bucket)`,
  *      distributed, ~n/buckets rows per partition); global rank =
  *      bucket offset + within-bucket row_number.
  *
  * EXACTNESS does not depend on boundary quality: any bucketing monotone
  * in the total order yields the same global rank — quantile precision
  * only balances load. ntile is then pure arithmetic on (rank, n): with
  * base = n div k and rem = n mod k, the first `rem` tiles hold base+1
  * rows — `tile(r) = (r-1) div (base+1) + 1` for r ≤ rem·(base+1), else
  * `rem + (r-1-rem·(base+1)) div base + 1` — bit-identical to the SQL
  * ntile of Spark and DuckDB, so oracle hashes survive the rewrite.
  *
  * Contract: the leading order column must be numeric and non-null (null
  * keys would bucket last but sort first, breaking monotonicity); the
  * full `orderCols` list must be a total order (include a unique
  * tiebreaker) for a deterministic result. Each call re-derives its
  * histogram from `df`'s lineage — chained calls recompute upstream
  * narrow stages a constant number of times; at extreme scale, caller
  * may checkpoint between calls.
  */
object Ranks {

  /** Max cutpoints materialized to the driver — 4096 doubles ≈ 32 KB,
    * far below any broadcast concern; more buckets than tasks buys
    * nothing.
    */
  val MaxRankBuckets = 4096

  /** A bucket expression monotone in numeric column `colName`, built from
    * approxQuantile cutpoints of `df` (driver-bounded at `buckets-1`
    * doubles). Usable on ANY DataFrame carrying `colName` with the same
    * distribution — boundary precision affects only load balance, never
    * rank exactness, so computing boundaries on a cheap base scan and
    * applying them after joins/windows is sound.
    */
  def quantileBucket(df: DataFrame, colName: String, buckets: Int = 256): Column = {
    require(buckets >= 2 && buckets <= MaxRankBuckets,
      s"buckets must be in [2, $MaxRankBuckets], got $buckets — the cutpoint " +
        "array is a driver materialization; size it like an IVF centroid table")
    val cuts = df.stat
      .approxQuantile(colName, (1 until buckets).map(_.toDouble / buckets).toArray, 0.01)
      .distinct.sorted
    val v = col(colName).cast("double")
    cuts.zipWithIndex.foldRight(lit(cuts.length): Column) {
      case ((b, i), els) => when(v <= lit(b), lit(i)).otherwise(els)
    }
  }

  /** Exact distributed `ntile(k) OVER (ORDER BY orderCols)` appended as
    * IntegerType column `out` (1-based, matching SQL ntile). `bucketOf`
    * overrides the quantile bucketer with a caller-known monotone
    * expression in the leading order column (zero extra passes).
    *
    * The bucket histogram is ONE map-side-combined count aggregation
    * materialized to the driver — ≤`MaxRankBuckets` rows, loudly guarded
    * — and the bucket offsets come back inlined as a literal when-chain
    * (the domainMix/IVF-centroid contract), so the corpus pass is a pure
    * projection plus ONE bucket-partitioned rank window: no join, no
    * offset-table window at all. Eager like the other histogram-driven
    * operators: constructing the frame runs the histogram job.
    */
  def ntile(df: DataFrame, k: Int, orderCols: Seq[String], out: String,
      bucketOf: Option[Column] = None): DataFrame = {
    require(k >= 1, s"ntile needs k >= 1, got $k")
    require(orderCols.nonEmpty, "ntile needs at least one order column")
    val b = s"__rb_$out"; val rk = s"__rk_$out"
    val bucket = bucketOf.getOrElse(quantileBucket(df, orderCols.head))
    val withB = df.withColumn(b, bucket)
    val hist = withB.groupBy(b).agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getAs[Number](b).longValue(), r.getAs[Long]("n")))
      .sortBy(_._1)
    require(hist.length <= MaxRankBuckets,
      s"bucket expression produced ${hist.length} distinct buckets " +
        s"(max $MaxRankBuckets) — the offset table is a driver " +
        "materialization; supply a coarser monotone bucketOf")
    if (hist.isEmpty) return df.withColumn(out, lit(null).cast("int"))
    val total = hist.map(_._2).sum
    val offs = hist.map(_._1).zip(hist.map(_._2).scanLeft(0L)(_ + _).init)
    // bucket → exclusive-prefix-sum offset, inlined as a literal chain
    val offCol = offs.tail.foldLeft(
      when(col(b) === lit(offs.head._1), lit(offs.head._2))) {
      case (acc, (v, o)) => acc.when(col(b) === lit(v), lit(o))
    }
    // ntile is pure arithmetic on (rank, total) — computed driver-side in
    // exact Long math (double division would lose exactness past 2^53)
    val base = total / k; val rem = total % k
    val boundary = rem * (base + 1)
    val wIn = Window.partitionBy(b).orderBy(orderCols.map(col): _*)
    withB
      .withColumn(rk, offCol + row_number().over(wIn))
      .withColumn(out, expr(
        s"""CAST(CASE WHEN $rk <= ${boundary}L
           |  THEN ($rk - 1) div ${base + 1}L + 1
           |  ELSE ${rem}L + ($rk - 1 - ${boundary}L)
           |    div ${math.max(base, 1L)}L + 1
           |END AS INT)""".stripMargin))
      .drop(b, rk)
  }
}
