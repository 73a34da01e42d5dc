package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream correlation: the attribution shape (click ↔ purchase,
  * impression ↔ conversion) as a watermarked event-time interval join.
  */
object StreamJoins {

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
}
