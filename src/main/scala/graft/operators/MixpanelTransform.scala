package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mixpanel migration transforms (SURVEY §3.3): engage→import profile
  * reshape (P12) and the reverse transforms to Amplitude (P13/P14) and
  * Woopra (P15) — all single `select` projections.
  */
object MixpanelTransform {

  /** P12: /engage result {$distinct_id, $properties} → import shape
    * (connectors/mixpanelETL.js:119-129).
    */
  def engageToProfiles(engage: DataFrame): DataFrame =
    engage.select(
      col("`$distinct_id`").cast("string").as("distinct_id"),
      lit("0").as("ignore_time"),
      lit("").as("ip"),
      col("`$properties`").as("set"))

  /** P13: canonical event → Amplitude /2/httpapi event
    * (load/sendOther.js:166-186). time epoch s → ms.
    */
  def eventsToAmplitude(events: DataFrame): DataFrame =
    events.select(
      col("distinct_id").as("user_id"),
      col("distinct_id").as("device_id"),
      col("event").as("event_type"),
      (col("time") * 1000).as("time"),
      col("insert_id"),
      col("properties").as("event_properties"))

  /** P14: canonical profile → Amplitude /identify (load/sendOther.js:189-202). */
  def profilesToAmplitude(profiles: DataFrame): DataFrame =
    profiles.select(
      col("distinct_id").as("user_id"),
      col("set").as("user_properties"))

  /** P15: canonical event → Woopra {visitor, actions[]} (load/sendOther.js:44-70). */
  def eventsToWoopra(events: DataFrame): DataFrame =
    events.select(
      struct(col("distinct_id").as("id")).as("visitor"),
      array(struct(
        col("event").as("name"),
        (col("time") * 1000).as("time"),
        col("properties").as("properties"))).as("actions"))
}
