package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream correlation: the attribution shape (click ↔ purchase,
  * impression ↔ conversion) as a watermarked event-time interval join.
  */
object StreamJoins {

  /** One user's funnel progress: the highest step reached so far (0 =
    * none), the event time at which each step was reached (ascending —
    * the strict-ordering invariant), and the observed-event count.
    */
  case class FunnelProgress(user: Long, step_reached: Int,
      step_times: Seq[Long], n_events: Long)

  /** INCREMENTAL funnel tracking over a stream — the stateful sibling of
    * [[graft.operators.Funnels.funnelCounts]]: per user, a
    * mapGroupsWithState fold advances the funnel step whenever the NEXT
    * step's event type arrives with an event time strictly after the
    * time the current step was reached (same first-qualifying
    * semantics; steps can span batches). State per user is O(steps):
    * the reached-step times only — never buffered events. Emits the
    * user's current [[FunnelProgress]] each batch (update mode).
    *
    * Within-batch events are folded in event-time order, so for
    * time-ordered arrival (each batch's events no earlier than the
    * last's) a batch boundary can never change the result — the
    * batch-split invariance the spec pins. An event arriving with an
    * earlier time than an already-consumed step cannot retroactively
    * revise the fold (inherent to single-pass incremental state; the
    * batch [[graft.operators.Funnels.funnelCounts]] is the
    * full-revision formulation).
    */
  def funnelProgress(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String])
      : org.apache.spark.sql.Dataset[FunnelProgress] = {
    require(steps.size >= 2 && steps.size <= 8, "funnel needs 2..8 steps")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val stepIdx = steps.zipWithIndex.toMap
    events.select(col(userCol).cast("long").as("user"),
        col(typeCol).as("et"), col(tsCol).cast("long").as("t"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[FunnelProgress, FunnelProgress](
        GroupStateTimeout.NoTimeout) {
        (user, rows, state) =>
          val prev = state.getOption.getOrElse(
            FunnelProgress(user, 0, Nil, 0L))
          var reached = prev.step_reached
          var times = prev.step_times.toVector
          var n = prev.n_events
          // event-time order makes batch boundaries invisible
          rows.toSeq.sortBy(e => (e._3, e._2)).foreach { case (_, et, t) =>
            n += 1
            if (reached < steps.size &&
                stepIdx.get(et).contains(reached) &&
                (reached == 0 || t > times(reached - 1))) {
              times = times :+ t
              reached += 1
            }
          }
          val next = FunnelProgress(user, reached, times, n)
          state.update(next)
          next
      }
  }

  /** [[funnelProgress]] under a CONVERSION WINDOW — the stateful sibling
    * of [[graft.operators.Funnels.funnelCountsWindowed]]: step i (i ≥ 2)
    * only advances when its event lands within `windowSec` of the user's
    * funnel start t0 (a purchase eight days after the view does not
    * convert a 7-day funnel). Same O(steps) per-user state — t0 is
    * `step_times.head`, already carried.
    */
  def funnelProgressWindowed(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, steps: Seq[String], windowSec: Long)
      : org.apache.spark.sql.Dataset[FunnelProgress] = {
    require(steps.size >= 2 && steps.size <= 8, "funnel needs 2..8 steps")
    require(windowSec > 0, s"windowSec must be positive, got $windowSec")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val stepIdx = steps.zipWithIndex.toMap
    events.select(col(userCol).cast("long").as("user"),
        col(typeCol).as("et"), col(tsCol).cast("long").as("t"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[FunnelProgress, FunnelProgress](
        GroupStateTimeout.NoTimeout) {
        (user, rows, state) =>
          val prev = state.getOption.getOrElse(
            FunnelProgress(user, 0, Nil, 0L))
          var reached = prev.step_reached
          var times = prev.step_times.toVector
          var n = prev.n_events
          rows.toSeq.sortBy(e => (e._3, e._2)).foreach { case (_, et, t) =>
            n += 1
            if (reached < steps.size &&
                stepIdx.get(et).contains(reached) &&
                (reached == 0 ||
                  (t > times(reached - 1) && t <= times.head + windowSec))) {
              times = times :+ t
              reached += 1
            }
          }
          val next = FunnelProgress(user, reached, times, n)
          state.update(next)
          next
      }
  }

  /** Inner interval join of two STREAMS: a left event matches right
    * events with the same `key` whose event time falls in
    * `[left_ts, left_ts + windowSec]`. Both sides carry watermarks, so
    * Spark can bound the join state and evict rows that can no longer
    * match — without the time-range condition + watermarks a
    * stream-stream join would buffer both streams forever (the classic
    * unbounded-state trap). Output: key, left/right payloads, both
    * event times, and the lag in seconds.
    *
    * Columns: `left`/`right` must carry `key`, a TIMESTAMP event-time
    * column (`leftTs`/`rightTs`), and disjoint payload column names.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      windowSec: Long, watermarkSec: Long): DataFrame = {
    require(windowSec > 0 && watermarkSec >= 0)
    val l = left.withWatermark(leftTs, s"$watermarkSec seconds")
    val r = right.withWatermark(rightTs, s"$watermarkSec seconds")
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $windowSec seconds"))
      .drop(r(key))
      .withColumn("lag_sec",
        unix_timestamp(col(rightTs)) - unix_timestamp(col(leftTs)))
  }

  /** One key's SCD-2 version summary: how many distinct state versions
    * opened so far, when the first opened, when the latest opened, and
    * the current state value.
    */
  case class VersionSummary(key: Long, n_versions: Long, first_t: Long,
      last_change_t: Long, current_state: String)

  /** INCREMENTAL SCD-2 version tracking over a stream — the stateful
    * sibling of [[graft.operators.TimeSeries.runLengthVersions]]: per
    * key, a mapGroupsWithState fold opens a new version whenever the
    * observed state differs from the current one, collapsing consecutive
    * repeats exactly like the batch run-length pass. State per key is
    * O(1): the four summary fields — never buffered events. Emits the
    * key's current [[VersionSummary]] each batch (update mode).
    *
    * Within-batch rows are folded in (t, tie) order — the batch
    * operator's sort key — so for time-ordered arrival a batch boundary
    * can never change the result (the spec pins stream-vs-batch
    * identity against the runLengthVersions aggregate).
    */
  def versionTracker(events: DataFrame, keyCol: String, tCol: String,
      tieCol: String, stateCol: String)
      : org.apache.spark.sql.Dataset[VersionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.select(col(keyCol).cast("long").as("key"),
        col(tCol).cast("long").as("t"), col(tieCol).cast("long").as("tie"),
        col(stateCol).as("state"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[VersionSummary, VersionSummary](
        GroupStateTimeout.NoTimeout) {
        (key, rows, state) =>
          var cur = state.getOption.orNull
          rows.toSeq.sortBy(e => (e._2, e._3)).foreach { case (_, t, _, s) =>
            cur =
              if (cur == null) VersionSummary(key, 1L, t, t, s)
              else if (s != cur.current_state)
                cur.copy(n_versions = cur.n_versions + 1,
                  last_change_t = t, current_state = s)
              else cur
          }
          state.update(cur)
          cur
      }
  }

  /** One classified user-day for [[growthTracker]]: `cls` is `new`,
    * `retained` (active the previous day too), `resurrected` (returned
    * after a gap), or `churned` (emitted retroactively for day
    * `last_active + 1` once a gap is observed).
    */
  case class GrowthEvent(user: Long, day: Long, cls: String)

  /** INCREMENTAL growth accounting over a stream — the stateful sibling
    * of the `a13_growth_accounting` lag/lead classification: per user,
    * O(1) state (the last active day) classifies each newly observed
    * active day as new / retained / resurrected, and retroactively emits
    * the churn day (`last + 1`) the moment a gap proves it. A user's
    * final churn (no successor activity ever) is inherently
    * unknowable to an incremental fold without a timeout policy — the
    * batch formulation closes over the full horizon; the spec compares
    * on the common domain.
    *
    * Input rows are (user, day) observations (duplicates collapse —
    * a day ≤ the last active day is a no-op). Within-batch days fold in
    * ascending order, so batch boundaries never change the output for
    * day-ordered arrival. Emits via flatMapGroupsWithState in update
    * mode: one row per newly classified day plus any proven churn day.
    */
  def growthTracker(userDays: DataFrame, userCol: String, dayCol: String)
      : org.apache.spark.sql.Dataset[GrowthEvent] = {
    val spark = userDays.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    userDays.select(col(userCol).cast("long").as("user"),
        col(dayCol).cast("long").as("day"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, GrowthEvent](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (user, rows, state) =>
          var last = state.getOption.getOrElse(Long.MinValue)
          val first = !state.exists
          var out = Vector.empty[GrowthEvent]
          rows.map(_._2).toSeq.distinct.sorted.foreach { day =>
            if (day > last) {
              val cls =
                if (last == Long.MinValue) "new"
                else if (day == last + 1) "retained"
                else "resurrected"
              if (last != Long.MinValue && day > last + 1)
                out :+= GrowthEvent(user, last + 1, "churned")
              out :+= GrowthEvent(user, day, cls)
              last = day
            }
          }
          if (first || out.nonEmpty) state.update(last)
          out.iterator
      }
  }

  /** One attributed conversion for [[touchAttribution]]: the user's
    * first and most recent non-conversion touch at conversion time
    * (`(direct)` when the conversion had no preceding touch).
    */
  case class Conversion(user: Long, t: Long, first_touch: String,
      last_touch: String, value: Double)

  /** INCREMENTAL first/last-touch attribution over a stream — the
    * stateful sibling of the `a14_attribution` IGNORE-NULLS window pair:
    * per user, O(1) state (two strings) tracks the first and latest
    * non-conversion touch; every conversion event emits a [[Conversion]]
    * attributed to the state as of strictly-earlier events (the
    * window's `1 PRECEDING` frame bound). Within-batch events fold in
    * (t, tie) order, so batch boundaries never change the output for
    * time-ordered arrival — the spec pins stream-vs-batch identity.
    */
  def touchAttribution(events: DataFrame, userCol: String, typeCol: String,
      tCol: String, tieCol: String, valueCol: String, convType: String)
      : org.apache.spark.sql.Dataset[Conversion] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    events.select(col(userCol).cast("long").as("user"),
        col(typeCol).as("et"), col(tCol).cast("long").as("t"),
        col(tieCol).cast("long").as("tie"),
        col(valueCol).cast("double").as("v"))
      .as[(Long, String, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(String, String), Conversion](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (user, rows, state) =>
          var (firstT, lastT) = state.getOption.getOrElse((null: String, null: String))
          var out = Vector.empty[Conversion]
          rows.toSeq.sortBy(e => (e._3, e._4)).foreach { case (_, et, t, _, v) =>
            if (et == convType) {
              out :+= Conversion(user, t,
                if (firstT == null) "(direct)" else firstT,
                if (lastT == null) "(direct)" else lastT, v)
            } else {
              if (firstT == null) firstT = et
              lastT = et
            }
          }
          state.update((firstT, lastT))
          out.iterator
      }
  }
}
