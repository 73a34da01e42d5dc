package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-analytics aggregates over the event stream: ordered funnel
  * conversion and cohort retention — the two reports every event-ETL
  * deployment (the reference's domain) feeds its dashboard from.
  */
object Funnels {

  /** Ordered funnel with first-qualifying semantics: step 1's time is a
    * user's earliest `steps(0)` event; step i's time is the earliest
    * `steps(i)` event STRICTLY AFTER the user's step-(i−1) time. Emits
    * one row per step: (step_idx, step, n_users, conv_ppm) with
    * conv_ppm = n_users·1e6 div n_users(step 1) — integer-exact.
    *
    * Plan shape: one filtered aggregation per step, each joined to the
    * previous step's (user, time) table on the user key — k−1 keyed
    * joins on per-user rows (never event×event). Step counts assemble
    * via 1-row broadcast scalars + explode (no partition-less window,
    * no cartesian — the sketch-scalar pattern).
    */
  def funnelCounts(events: DataFrame, userCol: String, typeCol: String,
      ts: Column, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2 && steps.size <= 8, "funnel needs 2..8 steps")
    val base = events.select(col(userCol).as("u"), col(typeCol).as("et"),
      ts.cast("long").as("t"))
    val stepFrames = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val mine = base.filter(col("et") === step)
        Some(prev match {
          case None => mine.groupBy("u").agg(min("t").as("t"))
          case Some(p) =>
            mine.join(p.select(col("u"), col("t").as("tp")), "u")
              .filter(col("t") > col("tp"))
              .groupBy("u").agg(min("t").as("t"))
        })
    }.flatten
    val counts = stepFrames.zipWithIndex.map { case (df, i) =>
      broadcast(df.agg(count(lit(1)).cast("long").as(s"n$i")))
    }
    val one = counts.tail.foldLeft(counts.head)(_.crossJoin(_))
    val rows = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i + 1).as("step_idx"), lit(step).as("step"),
        col(s"n$i").as("n_users"),
        expr(s"(n$i * 1000000) div n0").as("conv_ppm"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.step_idx").as("step_idx"), col("r.step").as("step"),
        col("r.n_users").as("n_users"), col("r.conv_ppm").as("conv_ppm"))
  }

  /** Per-user windowed funnel progression: step 1 at the user's earliest
    * `steps(0)` event (t0); step i at the earliest `steps(i)` event
    * strictly after step i−1 AND within `windowSec` of t0 — the
    * conversion-window semantics of product-analytics funnels (a purchase
    * eight days after the view does NOT convert a 7-day funnel).
    * Returns the completers' (user, t0, t_last). Same plan shape as
    * [[funnelCounts]]: k−1 keyed joins on per-user rows, t0 carried
    * through the chain as a column (no re-join to step 1).
    */
  def funnelCompletions(events: DataFrame, userCol: String, typeCol: String,
      ts: Column, steps: Seq[String], windowSec: Long): DataFrame = {
    require(steps.size >= 2 && steps.size <= 8, "funnel needs 2..8 steps")
    require(windowSec > 0, s"windowSec must be positive, got $windowSec")
    val base = events.select(col(userCol).as("u"), col(typeCol).as("et"),
      ts.cast("long").as("t"))
    steps.zipWithIndex.foldLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val mine = base.filter(col("et") === step)
        Some(prev match {
          case None => mine.groupBy("u").agg(min("t").as("t"))
            .withColumn("t0", col("t"))
          case Some(p) =>
            mine.join(p.select(col("u"), col("t").as("tp"), col("t0")), "u")
              .filter(col("t") > col("tp") &&
                col("t") <= col("t0") + lit(windowSec))
              .groupBy("u", "t0").agg(min("t").as("t"))
        })
    }.get.select(col("u"), col("t0"), col("t").as("t_last"))
  }

  /** Windowed funnel step counts (the [[funnelCounts]] report under a
    * conversion window): one row per step with n_users and conv_ppm
    * relative to step 1.
    */
  def funnelCountsWindowed(events: DataFrame, userCol: String,
      typeCol: String, ts: Column, steps: Seq[String],
      windowSec: Long): DataFrame = {
    require(steps.size >= 2 && steps.size <= 8, "funnel needs 2..8 steps")
    val base = events.select(col(userCol).as("u"), col(typeCol).as("et"),
      ts.cast("long").as("t"))
    val stepFrames = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val mine = base.filter(col("et") === step)
        Some(prev match {
          case None => mine.groupBy("u").agg(min("t").as("t"))
            .withColumn("t0", col("t"))
          case Some(p) =>
            mine.join(p.select(col("u"), col("t").as("tp"), col("t0")), "u")
              .filter(col("t") > col("tp") &&
                col("t") <= col("t0") + lit(windowSec))
              .groupBy("u", "t0").agg(min("t").as("t"))
        })
    }.flatten
    val counts = stepFrames.zipWithIndex.map { case (df, i) =>
      broadcast(df.agg(count(lit(1)).cast("long").as(s"n$i")))
    }
    val one = counts.tail.foldLeft(counts.head)(_.crossJoin(_))
    val rows = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i + 1).as("step_idx"), lit(step).as("step"),
        col(s"n$i").as("n_users"),
        expr(s"(n$i * 1000000) div n0").as("conv_ppm"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.step_idx").as("step_idx"), col("r.step").as("step"),
        col("r.n_users").as("n_users"), col("r.conv_ppm").as("conv_ppm"))
  }

  /** Cohort retention: a user's cohort is the bucket (e.g. epoch-day =
    * epoch div `bucketSeconds`) of their first event; a (cohort, offset)
    * cell counts users active in bucket cohort+offset. One distinct
    * (user, bucket) projection, one per-user min, one keyed join, one
    * keyed agg — retention matrices at any scale are two aggregations.
    */
  def cohortRetention(events: DataFrame, userCol: String, ts: Column,
      bucketSeconds: Long = 86400L): DataFrame = {
    require(bucketSeconds > 0)
    // integer div, not double `/` (a double quotient that lands a hair
    // under the boundary would truncate to the wrong bucket)
    val act = events.select(col(userCol).as("u"), ts.cast("long").as("t"))
      .select(col("u"), expr(s"t div ${bucketSeconds}L").as("bucket"))
      .distinct()
    val cohort = act.groupBy("u").agg(min("bucket").as("cohort"))
    act.join(cohort, "u")
      .groupBy(col("cohort"), (col("bucket") - col("cohort")).as("bucket_offset"))
      .agg(count(lit(1)).cast("long").as("n_users"))
  }
}
