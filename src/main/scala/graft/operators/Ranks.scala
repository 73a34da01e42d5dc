package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{DenseOffsetLookup, Fns, LowerBoundCount}

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
  *      its exclusive prefix sum comes back inlined as a map literal, so
  *      the corpus pass is a pure projection — no offset join, no
  *      offset-table window;
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
  * Fixed-cost shape (the part that shows up at bench scale): cutpoint
  * bucketing and offset lookup are FLAT expressions — a lambda count
  * over an array literal and a map-literal `element_at` — not nested
  * when-chains, whose 256-deep generated code is what dominates codegen
  * compile time; multiple ntiles over one relation share ONE histogram
  * job via [[ntiles]] (grouping sets), and multiple quantile bucketers
  * share ONE approxQuantile pass via [[quantileBuckets]].
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

  /** One exact-ntile request for [[ntiles]]: `ntile(k) OVER (ORDER BY
    * orderCols)` appended as column `out`, with an optional caller-known
    * monotone bucket expression (see [[ntile]]).
    */
  final case class NtileSpec(k: Int, orderCols: Seq[String], out: String,
      bucketOf: Option[Column] = None)

  /** A bucket expression monotone in numeric column `colName`, built from
    * approxQuantile cutpoints of `df` (driver-bounded at `buckets-1`
    * doubles). Usable on ANY DataFrame carrying `colName` with the same
    * distribution — boundary precision affects only load balance, never
    * rank exactness, so computing boundaries on a cheap base scan and
    * applying them after joins/windows is sound.
    */
  def quantileBucket(df: DataFrame, colName: String, buckets: Int = 256): Column =
    quantileBuckets(df, Seq(colName), buckets).head

  /** [[quantileBucket]] for several columns in ONE approxQuantile pass
    * over `df` (one job instead of one per column). Returns the bucket
    * expressions in `colNames` order.
    */
  def quantileBuckets(df: DataFrame, colNames: Seq[String],
      buckets: Int = 256): Seq[Column] = {
    require(buckets >= 2 && buckets <= MaxRankBuckets,
      s"buckets must be in [2, $MaxRankBuckets], got $buckets — the cutpoint " +
        "array is a driver materialization; size it like an IVF centroid table")
    require(colNames.nonEmpty, "need at least one column to bucket")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val allCuts = df.stat.approxQuantile(colNames.toArray, probs, 0.01)
    colNames.zip(allCuts).map { case (c, raw) =>
      val cuts = raw.distinct.sorted
      // bucket = #cutpoints strictly below v — a codegen'd binary search
      // ([[LowerBoundCount]]): O(log buckets)/row, allocation-free, and
      // constant compile time regardless of cutpoint count (a when-chain
      // is 256 deep; the HOF filter alternative runs interpreted with a
      // per-row array allocation)
      Fns.ofExpr(LowerBoundCount(Fns.toExpr(col(c).cast("double")), cuts))
    }
  }

  /** Bucket→offset column for a collected histogram prefix-sum: an O(1)
    * codegen'd dense-array lookup when the bucket domain is small and
    * non-negative (every in-repo bucketer: cutpoint index, hash byte,
    * `zval >> 8`), else a map-literal `element_at`. Shared with
    * [[Sampling.globalShuffle]].
    */
  def offsetLookup(bucketCol: Column, offs: Map[Long, Long]): Column = {
    val maxB = offs.keys.max
    if (offs.keys.min >= 0L && maxB < 65536L) {
      val table = Array.fill(maxB.toInt + 1)(0L)
      offs.foreach { case (b, o) => table(b.toInt) = o }
      Fns.ofExpr(DenseOffsetLookup(Fns.toExpr(bucketCol.cast("long")), table))
    } else element_at(typedLit(offs), bucketCol.cast("long"))
  }

  /** Exact distributed `row_number() OVER (ORDER BY orderCols) - 1`
    * (0-based global rank) appended as LongType `out`, plus the
    * relation's total row count — read off the same histogram job, so
    * callers that need n (every iterative ranker does) pay zero extra
    * jobs. Same bucket-histogram shape as [[ntiles]], exposing the rank
    * itself instead of its ntile summary: one ≤[[MaxRankBuckets]]-row
    * driver histogram, offsets inlined, one bucket-partitioned window.
    * `bucketOf` must be monotone non-decreasing in the leading order
    * column; `orderCols` must be a total order for determinism.
    */
  def globalRowNumberWithCount(df: DataFrame, orderCols: Seq[String],
      bucketOf: Column, out: String): (DataFrame, Long) = {
    require(orderCols.nonEmpty, "need at least one order column")
    val b = s"__grn_$out"
    val withB = df.withColumn(b, bucketOf.cast("long"))
    val hist = withB.groupBy(col(b)).agg(count(lit(1)).as("__n")).collect()
      .map(r => (r.getAs[Long](b), r.getAs[Long]("__n"))).sortBy(_._1)
    require(hist.length <= MaxRankBuckets,
      s"bucket expression produced ${hist.length} distinct buckets (max " +
        s"$MaxRankBuckets) — the offset table is a driver materialization; " +
        "supply a coarser monotone bucketOf")
    if (hist.isEmpty) (df.withColumn(out, lit(null).cast("long")), 0L)
    else {
      val total = hist.map(_._2).sum
      val offs = hist.map(_._1).zip(hist.map(_._2).scanLeft(0L)(_ + _).init).toMap
      val wIn = Window.partitionBy(b).orderBy(orderCols.map(col): _*)
      (withB
        .withColumn(out,
          offsetLookup(col(b), offs) + row_number().over(wIn) - 1L)
        .drop(b), total)
    }
  }

  /** [[globalRowNumberWithCount]] discarding the count. */
  def globalRowNumber(df: DataFrame, orderCols: Seq[String],
      bucketOf: Column, out: String): DataFrame =
    globalRowNumberWithCount(df, orderCols, bucketOf, out)._1

  /** Exact distributed `ntile(k) OVER (ORDER BY orderCols)` appended as
    * IntegerType column `out` (1-based, matching SQL ntile). `bucketOf`
    * overrides the quantile bucketer with a caller-known monotone
    * expression in the leading order column (zero extra passes).
    */
  def ntile(df: DataFrame, k: Int, orderCols: Seq[String], out: String,
      bucketOf: Option[Column] = None): DataFrame =
    ntiles(df, Seq(NtileSpec(k, orderCols, out, bucketOf)))

  /** Several exact ntiles over ONE relation sharing ONE histogram job.
    *
    * The bucket histograms for every spec come from a single
    * grouping-sets count aggregation materialized to the driver —
    * ≤`MaxRankBuckets` rows per spec, loudly guarded — and each spec's
    * bucket→offset table comes back inlined as a map literal (the
    * domainMix/IVF-centroid contract), so the corpus pass is a pure
    * projection plus one bucket-partitioned rank window per spec: no
    * join, no offset-table window at all. Eager like the other
    * histogram-driven operators: constructing the frame runs the
    * histogram job.
    */
  def ntiles(df: DataFrame, specs: Seq[NtileSpec]): DataFrame = {
    require(specs.nonEmpty, "need at least one ntile spec")
    specs.foreach { sp =>
      require(sp.k >= 1, s"ntile needs k >= 1, got ${sp.k}")
      require(sp.orderCols.nonEmpty, "ntile needs at least one order column")
    }
    require(specs.map(_.out).distinct.length == specs.length,
      "ntile output column names must be distinct")
    val bNames = specs.map(sp => s"__rb_${sp.out}")
    val withB = specs.zip(bNames).foldLeft(df) { case (d, (sp, b)) =>
      d.withColumn(b,
        sp.bucketOf.getOrElse(quantileBucket(df, sp.orderCols.head)).cast("long"))
    }
    // ONE job: per-spec bucket histograms via grouping sets (gid bit i set
    // = bNames(i) aggregated away; each row belongs to exactly one spec)
    val gidOf = bNames.indices.map(i =>
      bNames.indices.map(j => if (j == i) 0L else 1L << (bNames.length - 1 - j)).sum)
    val rows = withB
      .groupingSets(bNames.map(b => Seq(col(b))), bNames.map(col): _*)
      .agg(grouping_id().as("__gid"), count(lit(1)).as("__n"))
      .collect()
    require(rows.length <= specs.length * MaxRankBuckets,
      s"bucket expressions produced ${rows.length} total distinct buckets " +
        s"(max $MaxRankBuckets per ntile) — the offset table is a driver " +
        "materialization; supply a coarser monotone bucketOf")
    specs.indices.foldLeft(withB) { case (acc, i) =>
      val sp = specs(i); val b = bNames(i); val rk = s"__rk_${sp.out}"
      val hist = rows.filter(_.getAs[Long]("__gid") == gidOf(i))
        .map(r => (r.getAs[Long](b), r.getAs[Long]("__n"))).sortBy(_._1)
      require(hist.length <= MaxRankBuckets,
        s"bucket expression for '${sp.out}' produced ${hist.length} distinct " +
          s"buckets (max $MaxRankBuckets) — supply a coarser monotone bucketOf")
      if (hist.isEmpty) acc.withColumn(sp.out, lit(null).cast("int"))
      else {
        val total = hist.map(_._2).sum
        // bucket → exclusive-prefix-sum offset, inlined in the plan
        val offs = hist.map(_._1).zip(hist.map(_._2).scanLeft(0L)(_ + _).init).toMap
        val offCol = offsetLookup(col(b), offs)
        // ntile is pure arithmetic on (rank, total) — computed driver-side
        // in exact Long math (double division loses exactness past 2^53)
        val base = total / sp.k; val rem = total % sp.k
        val boundary = rem * (base + 1)
        val wIn = Window.partitionBy(b).orderBy(sp.orderCols.map(col): _*)
        acc
          .withColumn(rk, offCol + row_number().over(wIn))
          .withColumn(sp.out, expr(
            s"""CAST(CASE WHEN $rk <= ${boundary}L
               |  THEN ($rk - 1) div ${base + 1}L + 1
               |  ELSE ${rem}L + ($rk - 1 - ${boundary}L)
               |    div ${math.max(base, 1L)}L + 1
               |END AS INT)""".stripMargin))
          .drop(rk)
      }
    }.drop(bNames: _*)
  }
}
