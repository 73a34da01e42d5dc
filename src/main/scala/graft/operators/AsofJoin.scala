package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, the most recent right row with
  * right.time <= left.time within the same key (event↔session/state
  * alignment — SURVEY §2.4 notes the engine needs range/as-of joins the
  * reference lacks).
  *
  * Spark has no built-in as-of join; the idiomatic scalable rendering is
  * the union-and-carry formulation: tag both streams, sort within key by
  * (time, side), and carry the last right value forward with
  * `last(ignoreNulls)` over an unbounded-preceding window. One shuffle on
  * the key, no per-key loops, no range explosion — O(n log n) per key vs
  * the O(n·m) of a naive inequality join, and it degrades gracefully under
  * AQE skew handling.
  */
object AsofJoin {

  /** Joins on `keyCol`; carries `valueCol` (+ the right time) from the
    * latest right row at-or-before each left row's `timeCol`. Ties at
    * equal time: the right row wins (sorted first), then `tieCol`
    * ascending. Output: (keyCol, timeCol, tieCol) from the left +
    * `asof_time` + `asof_<valueCol>` (nulls when no prior right row).
    */
  def priorJoin(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, tieCol: String, valueCol: String): DataFrame = {
    val vType = right.schema(valueCol).dataType.catalogString
    val l = left.select(col(keyCol), col(timeCol), col(tieCol))
      .withColumn("__side", lit(1))
      .withColumn("__rt", lit(null).cast("long"))
      .withColumn("__rv", lit(null).cast(vType))
    val r = right.select(col(keyCol), col(timeCol), col(tieCol),
      col(valueCol).as("__rv"))
      .withColumn("__side", lit(0))
      .withColumn("__rt", col(timeCol).cast("long"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(timeCol), col("__side"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("asof_time", last("__rt", ignoreNulls = true).over(w))
      .withColumn(s"asof_$valueCol", last("__rv", ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__rt", "__rv")
  }

  /** Forward as-of: the EARLIEST right row at-or-after each left row's
    * time within the key — the "next event" join (next shipment after an
    * order, next deploy after a commit). Same union-and-carry shape run
    * forward: left sorts BEFORE right at equal time (so an equal-time
    * right row is visible), and `first(ignoreNulls)` carries backward
    * over the unbounded-FOLLOWING frame. One shuffle on the key.
    * Output: left's (keyCol, timeCol, tieCol) + `asof_time` +
    * `asof_<valueCol>` (nulls when no later right row).
    */
  def nextJoin(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, tieCol: String, valueCol: String): DataFrame = {
    val vType = right.schema(valueCol).dataType.catalogString
    val l = left.select(col(keyCol), col(timeCol), col(tieCol))
      .withColumn("__side", lit(0))
      .withColumn("__rt", lit(null).cast("long"))
      .withColumn("__rv", lit(null).cast(vType))
    val r = right.select(col(keyCol), col(timeCol), col(tieCol),
      col(valueCol).as("__rv"))
      .withColumn("__side", lit(1))
      .withColumn("__rt", col(timeCol).cast("long"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(timeCol), col("__side"), col(tieCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r)
      .withColumn("asof_time", first("__rt", ignoreNulls = true).over(w))
      .withColumn(s"asof_$valueCol", first("__rv", ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .drop("__side", "__rt", "__rv")
  }
}
