package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, TimestampType, TimestampNTZType}

/** Dataset-health operators: exact one-pass column profiling and robust
  * (median/MAD) outlier detection — the audits a curation pipeline runs
  * before and after every transform tier.
  *
  * Scale posture: profiling is ONE scan + one aggregate (the exact
  * count-distinct expand is map-side partial-aggregated; #columns is a
  * schema constant, not data-sized); the row-ification of the 1-row
  * aggregate is a driver-free explode. MAD windows are group-partitioned
  * order statistics — no partition-less window, no global sort.
  */
object DataQuality {

  /** Exact per-column profile of `cols`: row count, null count, exact
    * distinct count, and min/max as double for numeric and timestamp
    * (epoch-seconds) columns — null min/max for other types.
    *
    * Output: (col_name, n_nulls, n_distinct, min_val, max_val), one row
    * per profiled column, from a single aggregate over a single scan.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.foreach(c => require(types.contains(c), s"profile: no column '$c'"))

    def numericView(c: String): Option[Column] = types(c) match {
      case _: NumericType => Some(col(c).cast("double"))
      case TimestampType | TimestampNTZType =>
        Some(unix_seconds(col(c).cast("timestamp")).cast("double"))
      case _ => None
    }

    val aggs = cols.flatMap { c =>
      val mm = numericView(c) match {
        case Some(v) => Seq(min(v).as(s"mn_$c"), max(v).as(s"mx_$c"))
        case None => Seq(first(lit(null).cast("double")).as(s"mn_$c"),
          first(lit(null).cast("double")).as(s"mx_$c"))
      }
      Seq(count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c")) ++ mm
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"),
        (col("n_rows") - col(s"nn_$c")).as("n_nulls"),
        col(s"nd_$c").as("n_distinct"),
        col(s"mn_$c").as("min_val"),
        col(s"mx_$c").as("max_val"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Robust outlier report per group: the lower median (exact order
    * statistic, rank ⌈n/2⌉ in (value, tie) order), the MAD (lower median
    * of |value − median| in (dev, value, tie) order), and the count of
    * rows with dev > `k`·MAD.
    *
    * Output: (group, med, mad, n_rows, n_outliers), one row per group.
    * The median/MAD picks are deterministic element selections (no
    * interpolation), so the result is partitioning-invariant; both join
    * backs are broadcasts of #groups-sized frames.
    */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String,
      tieCol: String, k: Double = 3.0): DataFrame = {
    val base = df.select(col(groupCol).as("g"), col(valCol).as("v"),
      col(tieCol).as("tie"))
    val wOrd = Window.partitionBy("g").orderBy("v", "tie")
    val wAll = Window.partitionBy("g")
    val med = base
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .filter(col("rn") === expr("(n+1) div 2"))
      .select(col("g"), col("v").as("med"))
    val dv = base.join(broadcast(med), "g")
      .withColumn("dev", abs(col("v") - col("med")))
    val wDev = Window.partitionBy("g").orderBy("dev", "v", "tie")
    val mad = dv
      .withColumn("rn", row_number().over(wDev))
      .withColumn("n", count(lit(1)).over(wAll))
      .filter(col("rn") === expr("(n+1) div 2"))
      .select(col("g"), col("dev").as("mad"))
    dv.join(broadcast(mad), "g")
      .groupBy(col("g"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("dev") > lit(k) * col("mad"), 1)).as("n_outliers"))
  }

  /** 2×2 chi-square independence test in exact integer arithmetic — the
    * A/B experiment gate. Input: one row per unit with a binary
    * `groupCol` (0/1 variant) and binary `flagCol` (0/1 outcome). Uses
    * the contingency form χ² = N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)),
    * evaluated as staged ppm floor divisions (identical association
    * order on both engines); degenerate margins yield 0 instead of
    * dividing by zero. Documented bound: per-cell counts ≲ 10⁵ keep
    * every intermediate in a long.
    *
    * Returns one row: (conv_a, noconv_a, conv_b, noconv_b, chi2_ppm).
    */
  def chiSquare2x2(df: DataFrame, groupCol: String, flagCol: String): DataFrame = {
    val g = col(groupCol)
    val f = col(flagCol)
    df.agg(
        sum(when(g === 0 && f === 1, 1).otherwise(0)).as("a"),
        sum(when(g === 0 && f === 0, 1).otherwise(0)).as("b"),
        sum(when(g === 1 && f === 1, 1).otherwise(0)).as("c"),
        sum(when(g === 1 && f === 0, 1).otherwise(0)).as("d"))
      .select(col("a").as("conv_a"), col("b").as("noconv_a"),
        col("c").as("conv_b"), col("d").as("noconv_b"),
        expr("""CASE WHEN (a+b)*(c+d)*(a+c)*(b+d) = 0 THEN CAST(0 AS BIGINT) ELSE
          ((((a*d - b*c)*(a*d - b*c) * 1000000) div ((a+b)*(c+d))) * (a+b+c+d))
            div ((a+c)*(b+d)) END""").as("chi2_ppm"))
  }

  /** One referential-integrity check: child rows whose key tuple has no
    * match in the parent — a keyed LEFT ANTI join (no correlated probe,
    * one shuffle on the FK; broadcast when the parent is a dim).
    * Returns one row: (n_rows, n_violations).
    *
    * NULL-FK contract (= SQL `NOT EXISTS`): a NULL in any FK component is
    * a violation — it references nothing, regardless of whether the parent
    * has NULL keys. Plain equality in the anti-join condition gives exactly
    * these semantics (NULL never equi-matches, so the row survives the
    * anti join); null-safe `<=>` would instead let a NULL FK "match" a
    * NULL parent key, which is not referential integrity.
    */
  def orphanCount(child: DataFrame, childCols: Seq[String],
      parent: DataFrame, parentCols: Seq[String]): DataFrame = {
    require(childCols.nonEmpty && childCols.length == parentCols.length,
      "orphanCount: key arity mismatch")
    val p = parent.select(parentCols.zipWithIndex.map {
      case (c, i) => col(c).as(s"__pk$i") }: _*)
    val cond = childCols.zipWithIndex
      .map { case (c, i) => col(c) === col(s"__pk$i") }
      .reduce(_ && _)
    val total = child.agg(count(lit(1)).as("n_rows"))
    val orphans = child.join(p, cond, "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    total.crossJoin(orphans)
  }

  /** Key-uniqueness check: violations = rows beyond the first per
    * distinct key tuple (0 when the key is unique). One aggregate.
    * Returns one row: (n_rows, n_violations).
    */
  def dupKeyCount(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "dupKeyCount: no key columns")
    df.agg(count(lit(1)).as("n_rows"),
      (count(lit(1)) - countDistinct(col(keyCols.head),
        keyCols.tail.map(col): _*)).as("n_violations"))
  }
}
