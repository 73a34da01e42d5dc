package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Static kernels for the distributed-rank primitives ([[graft.operators.Ranks]],
  * [[graft.operators.Sampling.globalShuffle]]): cutpoint bucketing and
  * histogram-offset lookup as tiny codegen'd expressions.
  *
  * Why not builtins: the flat alternatives are either higher-order
  * functions (`size(filter(lit(cuts), _ < v))`), which Spark evaluates
  * INTERPRETED with a per-row result-array allocation, or deep
  * when-chains, whose 256-deep generated code dominates Janino compile
  * time on every re-planned job. A binary search over a referenced
  * `double[]` is O(log n) per row, allocation-free, stays inside
  * whole-stage codegen, and compiles in constant time regardless of the
  * cutpoint count.
  */
object BucketRank {

  /** Count of elements strictly below `v` in sorted-distinct `cuts` —
    * the bucket index. `Arrays.binarySearch` insertion-point arithmetic:
    * found at i → i elements below (distinct); not found → -(ip)-1 where
    * ip IS the count below.
    */
  def lowerBound(cuts: Array[Double], v: Double): Long = {
    val i = java.util.Arrays.binarySearch(cuts, v)
    if (i >= 0) i.toLong else (-i - 1).toLong
  }

  /** Bounds-checked dense table lookup. Buckets outside the table cannot
    * occur by construction (the table is built from the same expression's
    * own histogram); fail loudly rather than mis-rank if they somehow do.
    */
  def lookup(table: Array[Long], bucket: Long): Long = {
    if (bucket < 0 || bucket >= table.length)
      throw new IllegalStateException(
        s"bucket $bucket outside histogram range [0, ${table.length}) — " +
          "the bucket expression changed between the histogram job and the " +
          "rank pass; bucketOf must be deterministic")
    table(bucket.toInt)
  }
}

/** Bucket index of DOUBLE `child` against sorted-distinct cutpoints:
  * `#{c in cuts : c < child}`, a monotone non-decreasing function of the
  * input — the [[graft.operators.Ranks.quantileBucket]] kernel.
  */
case class LowerBoundCount(child: Expression, cuts: Array[Double])
  extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lower_bound_count needs DOUBLE input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    BucketRank.lowerBound(cuts, input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cutsRef = ctx.addReferenceObj("cuts", cuts, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BucketRank.lowerBound($cutsRef, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): LowerBoundCount =
    copy(child = newChild)

  override def prettyName: String = "lower_bound_count"
}

/** O(1) dense-array lookup `table[child]` for LONG bucket ids in
  * `[0, table.length)` — the bucket→prefix-sum-offset step of the
  * distributed rank, held as a reference object exactly like a broadcast
  * bloom bitset ([[BloomMightContain]]).
  */
case class DenseOffsetLookup(child: Expression, table: Array[Long])
  extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dense_offset_lookup needs BIGINT input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    BucketRank.lookup(table, input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("offsets", table, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BucketRank.lookup($tableRef, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): DenseOffsetLookup =
    copy(child = newChild)

  override def prettyName: String = "dense_offset_lookup"
}
