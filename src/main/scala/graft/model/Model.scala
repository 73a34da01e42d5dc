package graft.model

import org.apache.spark.sql.types._

/** Canonical data model (SURVEY §1.1): every vendor source is normalized
  * into these three shapes. Typed canonical columns + an open MapType
  * property bag for the dynamic long tail (SURVEY §7.4.1 hybrid).
  */
object Model {

  /** Canonical event row. `time` is epoch seconds internally; sinks convert
    * to their wire unit at the edge (SURVEY §1.2).
    */
  case class MpEvent(
      event: String,
      distinct_id: String,
      time: Long,
      insert_id: String,
      source: String,
      properties: Map[String, String])

  /** Canonical user-profile upsert row ($set semantics, last-write-wins). */
  case class MpProfile(
      distinct_id: String,
      ip: String,
      set: Map[String, String])

  /** Identity merge edge ($merge): two ids known to be the same user. */
  case class MergePair(
      id_a: String,
      id_b: String,
      insert_id: String,
      time: Long)

  val mpEventSchema: StructType = StructType(Seq(
    StructField("event", StringType),
    StructField("distinct_id", StringType),
    StructField("time", LongType),
    StructField("insert_id", StringType),
    StructField("source", StringType),
    StructField("properties", MapType(StringType, StringType))
  ))

  /** Mixpanel /engage result element — the wire shape the reference maps
    * over (connectors/mixpanelETL.js:119-129): `$distinct_id` + a dynamic
    * `$properties` bag.
    */
  val engageSchema: StructType = StructType(Seq(
    StructField("$distinct_id", StringType),
    StructField("$properties", MapType(StringType, StringType))
  ))

  /** Amplitude export-event schema (FIXTURES.md §1; field accesses in
    * reference transform/amplitudeToMixpanel.js:86-166). Dynamic top-level
    * keys land in `_extra` via a permissive second read when needed; the
    * canonical fields cover the reference's accessed surface.
    */
  val amplitudeSchema: StructType = StructType(Seq(
    StructField("event_type", StringType),
    StructField("user_id", StringType),
    StructField("device_id", StringType),
    StructField("amplitude_id", LongType),
    StructField("event_time", StringType),
    StructField("$insert_id", StringType),
    StructField("ip_address", StringType),
    StructField("city", StringType),
    StructField("region", StringType),
    StructField("country", StringType),
    StructField("event_properties", MapType(StringType, StringType)),
    StructField("user_properties", MapType(StringType, StringType)),
    StructField("groups", MapType(StringType, StringType)),
    StructField("app_version", StringType),
    StructField("os_name", StringType),
    StructField("os_version", StringType),
    StructField("device_brand", StringType),
    StructField("device_manufacturer", StringType),
    StructField("device_model", StringType),
    StructField("paying", StringType),
    StructField("dma", StringType)
  ))

  /** GA360 BigQuery-export session schema — the subset of
    * reference transform/gaSchema.json the transform actually consumes
    * (FIXTURES.md §2). Nested structs modeled as MapType where GA exports
    * flat string objects; `hits` is the array the session explode consumes.
    */
  /** The full flattened-or-carried hit surface: everything the reference
    * transform splices into event properties (gaToMixpanel.js:243-262) PLUS
    * the sub-objects its gaSchema.json declares but the transform silently
    * drops (contentGroup, eCommerceAction, publisher_infos — carried as
    * nested JSON so no real GA360 field is lost; gaSchema.json:308-430,
    * 2336-2357).
    */
  val gaHitSchema: StructType = StructType(Seq(
    StructField("hitNumber", StringType),
    StructField("time", StringType),
    StructField("type", StringType),
    StructField("isInteraction", BooleanType),
    StructField("isEntrance", BooleanType),
    StructField("isExit", BooleanType),
    StructField("referer", StringType),
    StructField("eventInfo", MapType(StringType, StringType)),
    StructField("page", MapType(StringType, StringType)),
    StructField("appInfo", MapType(StringType, StringType)),
    StructField("social", MapType(StringType, StringType)),
    StructField("transaction", MapType(StringType, StringType)),
    StructField("item", MapType(StringType, StringType)),
    StructField("eCommerceAction", MapType(StringType, StringType)),
    StructField("contentGroup", MapType(StringType, StringType)),
    StructField("product", ArrayType(MapType(StringType, StringType))),
    StructField("promotion", ArrayType(MapType(StringType, StringType))),
    StructField("experiment", ArrayType(MapType(StringType, StringType))),
    StructField("publisher_infos", ArrayType(MapType(StringType, StringType))),
    StructField("customDimensions", ArrayType(StructType(Seq(
      StructField("index", StringType), StructField("value", StringType))))),
    StructField("customMetrics", ArrayType(StructType(Seq(
      StructField("index", StringType), StructField("value", StringType))))),
    StructField("customVariables", ArrayType(StructType(Seq(
      StructField("index", StringType), StructField("value", StringType)))))
  ))

  val gaSessionSchema: StructType = StructType(Seq(
    StructField("visitNumber", StringType),
    StructField("visitId", StringType),
    StructField("visitStartTime", StringType),
    StructField("date", StringType),
    StructField("userId", StringType),
    StructField("fullVisitorId", StringType),
    StructField("visitorId", StringType),
    StructField("client_id", StringType),
    StructField("channelGrouping", StringType),
    StructField("socialEngagementType", StringType),
    StructField("totals", MapType(StringType, StringType)),
    StructField("trafficSource", MapType(StringType, StringType)),
    StructField("device", MapType(StringType, StringType)),
    StructField("geoNetwork", MapType(StringType, StringType)),
    StructField("customDimensions", ArrayType(StructType(Seq(
      StructField("index", StringType), StructField("value", StringType))))),
    StructField("hits", ArrayType(gaHitSchema))
  ))
}
