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
}
