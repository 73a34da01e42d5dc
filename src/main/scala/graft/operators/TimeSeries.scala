package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series reshaping over keyed event streams: fixed-bucket resampling
  * with last-observation-carried-forward gap fill, and run-length state
  * collapse (the SCD-2 dimension-history builder).
  *
  * Scale posture: every window is key-partitioned (no partition-less
  * window anywhere); the bucket grid is generated per key from that key's
  * own [min, max] span, so grid volume is Σ_key span_k — never
  * #keys × global-span; all joins are keyed equi-joins on (key, bucket).
  */
object TimeSeries {

  /** Resample to `bucketSeconds`-wide buckets and LOCF-fill interior gaps.
    *
    * Input columns: `keyCol` (series key), `tCol` (epoch seconds, long),
    * `tieCol` (unique per row — deterministic last-in-bucket pick), and
    * `valCol` (double). Returns the filled grid:
    * (key, bucket, value, filled) where `value` is the last observation
    * in the bucket (null on gap buckets) and `filled` carries it forward
    * from the most recent observed bucket.
    *
    * "Last in bucket" is the row with max (t, tie) — a lexicographic
    * struct max inside the one (key, bucket) aggregate, not a sort.
    */
  def gapFillLocf(df: DataFrame, keyCol: String, tCol: String,
      tieCol: String, valCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"gapFillLocf: bucketSeconds must be positive, got $bucketSeconds")
    val obs = df
      .select(col(keyCol).as("key"),
        expr(s"$tCol div $bucketSeconds").as("bucket"),
        col(tCol).as("t"), col(tieCol).as("tie"), col(valCol).as("v"))
      .groupBy("key", "bucket")
      .agg(max(struct(col("t"), col("tie"), col("v"))).as("last"))
      .select(col("key"), col("bucket"), col("last.v").as("value"))
    val grid = obs.groupBy("key")
      .agg(min("bucket").as("lo"), max("bucket").as("hi"))
      .select(col("key"), explode(sequence(col("lo"), col("hi"))).as("bucket"))
    val locf = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("key", "bucket"), "left")
      .withColumn("filled", last(col("value"), ignoreNulls = true).over(locf))
  }

  /** Collapse a keyed state stream to its change points (run-length
    * encoding of `stateCol` per key in (t, tie) order) — the rows an
    * SCD-2 dimension history keeps: one row per version, effective from
    * its `t` until the next change.
    *
    * Returns (key, t, tie, state) — the first row of every run.
    */
  def runLengthVersions(df: DataFrame, keyCol: String, tCol: String,
      tieCol: String, stateCol: String): DataFrame = {
    df.select(col(keyCol).as("key"), col(tCol).as("t"),
        col(tieCol).as("tie"), col(stateCol).as("state"))
      .withColumn("prev", lag(col("state"), 1).over(
        Window.partitionBy("key").orderBy("t", "tie")))
      .filter(col("prev").isNull || col("state") =!= col("prev"))
      .drop("prev")
  }

  /** Exact least-squares trend slope per key over integer points:
    * `slope_micro = ((n·Σxy − Σx·Σy) · 10⁶) div (n·Σx² − (Σx)²)` — the
    * closed form in pure long arithmetic (callers pre-scale `y` to an
    * integer, e.g. decimal·10⁴, and zero-base `x` to keep the products
    * small). Keys with fewer than 2 points are dropped (degenerate
    * denominator). One keyed aggregate — no window, no per-key fit loop.
    *
    * Returns (key, n, slope_micro).
    */
  def trendSlope(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame =
    df.select(col(keyCol).as("key"), col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x*y")).as("sxy"), sum(expr("x*x")).as("sxx"))
      .filter(col("n") >= 2)
      .select(col("key"), col("n"),
        expr("((n*sxy - sx*sy) * 1000000) div (n*sxx - sx*sx)").as("slope_micro"))
}
