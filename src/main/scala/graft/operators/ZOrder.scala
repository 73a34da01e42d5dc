package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for data-skipping-friendly layout.
  *
  * Writing 100 TB sorted by ONE column gives perfect min/max pruning on
  * that column and none on any other; interleaving the bit patterns of
  * two dimensions onto a space-filling curve gives useful min/max spans
  * on BOTH — the standard layout trick for multi-dimension scan pruning
  * (Morton 1966; used by every modern lakehouse format).
  *
  * The z-value here is a flat, codegen-friendly arithmetic expression
  * (2·bits shift/mask/add terms, no UDF, no HOF), so it rides inside
  * whole-stage codegen on the write path. Dimensions should be rank/
  * quantile-normalized to `bits`-bit space first — raw keys with skewed
  * ranges waste curve resolution (at scale, use approxQuantile cutpoints;
  * the exact ntile path below is the deterministic small-data variant).
  */
object ZOrder {

  /** Morton z-value interleaving the low `bits` bits of two non-negative
    * long columns: x occupies even bit positions, y odd.
    */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftright(x.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Cluster `df` on the z-order of two columns: range-repartition on the
    * z-value (distributed sample-based boundaries — no global sort
    * bottleneck) and sort within partitions, so each written file covers a
    * compact z-range ⇒ narrow min/max spans on both dimensions.
    */
  def cluster(df: DataFrame, x: Column, y: Column, bits: Int,
      numPartitions: Int): DataFrame = {
    val withZ = df.withColumn("_zval", zValue2(x, y, bits))
    withZ.repartitionByRange(numPartitions, col("_zval"))
      .sortWithinPartitions("_zval")
      .drop("_zval")
  }
}
