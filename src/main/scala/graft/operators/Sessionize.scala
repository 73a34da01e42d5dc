package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Inactivity-gap sessionization + session explosion (SURVEY §2.6 X1 as a
  * reusable operator; the GA-shaped typed variant lives in
  * [[GaTransform.explodeSession]], the SQL Generator in
  * [[graft.plans.ExplodeSession]]).
  *
  * One shuffle on the user key; both the lag-gap flagging and the running
  * session counter reuse the same window partitioning, so Catalyst plans a
  * single sort+window stage.
  */
object Sessionize {

  /** Adds `session_seq` (1-based per user): a new session starts after
    * `gapSeconds` of inactivity. `timeCol` must be epoch seconds (long);
    * `tieCol` breaks equal-time ordering deterministically.
    */
  def sessionize(events: DataFrame, userCol: String, timeCol: String,
      tieCol: String, gapSeconds: Long): DataFrame = {
    val wOrd = Window.partitionBy(userCol).orderBy(timeCol, tieCol)
    events
      .withColumn("__prev_t", lag(timeCol, 1).over(wOrd))
      .withColumn("__is_new",
        when(col("__prev_t").isNull || col(timeCol) - col("__prev_t") > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum("__is_new").over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev_t", "__is_new")
  }

  /** Full session explosion: per (user, session) emit one
    * "session begins" row at the first event time, every original event,
    * and one "session ends" row at last event time + 1 s — the relational
    * rendering of the reference's signature operator
    * (gaToMixpanel.js:129-301).
    * Output: (userCol, session_seq, event, time_s).
    */
  def explode(events: DataFrame, userCol: String, timeCol: String,
      tieCol: String, eventCol: String, gapSeconds: Long): DataFrame = {
    val sessions = sessionize(events, userCol, timeCol, tieCol, gapSeconds)
    val hits = sessions.select(
      col(userCol), col("session_seq"),
      col(eventCol).as("event"), col(timeCol).as("time_s"))
    val bounds = sessions.groupBy(userCol, "session_seq")
      .agg(min(timeCol).as("t0"), max(timeCol).as("t1"))
    val begins = bounds.select(col(userCol), col("session_seq"),
      lit("session begins").as("event"), col("t0").as("time_s"))
    val ends = bounds.select(col(userCol), col("session_seq"),
      lit("session ends").as("event"), (col("t1") + 1).as("time_s"))
    hits.unionByName(begins).unionByName(ends)
  }
}
