package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Model.MpEvent

/** GA360 session → canonical events (SURVEY §2.6 X1 — the reference's
  * signature operator; transform/gaToMixpanel.js:129-301).
  *
  * Implemented as a typed `flatMap` over `Dataset[GaSession]` — the closest
  * Spark-native rendering of the reference's sequential per-session loop
  * (preserves the monotonic endTime accumulation and +1s sequencing bumps),
  * executing embarrassingly parallel per partition with no shuffle.
  *
  * Deliberate fixes over the reference (SURVEY §7.4.7):
  *  - processes EVERY input file/partition (reference returns after the
  *    first file: gaToMixpanel.js:95);
  *  - hits are explicitly sorted by numeric hitNumber instead of trusting
  *    array order.
  */
object GaTransform {

  case class IndexValue(index: String, value: String)
  case class GaHit(
      hitNumber: String,
      time: String,
      `type`: String,
      isInteraction: Option[Boolean],
      eventInfo: Map[String, String],
      page: Map[String, String],
      appInfo: Map[String, String],
      social: Map[String, String],
      product: Seq[Map[String, String]],
      promotion: Seq[Map[String, String]],
      customDimensions: Seq[IndexValue],
      customMetrics: Seq[IndexValue])
  case class GaSession(
      visitNumber: String,
      visitId: String,
      visitStartTime: String,
      date: String,
      userId: Option[String],
      fullVisitorId: Option[String],
      visitorId: Option[String],
      client_id: Option[String],
      channelGrouping: Option[String],
      socialEngagementType: Option[String],
      totals: Map[String, String],
      trafficSource: Map[String, String],
      device: Map[String, String],
      geoNetwork: Map[String, String],
      customDimensions: Seq[IndexValue],
      hits: Seq[GaHit])

  /** P5 rename tables (gaToMixpanel.js:308-345). */
  val devicePairs: Seq[(String, String)] = Seq(
    "browser" -> "$browser", "browserVersion" -> "$browser_version",
    "deviceCategory" -> "device type", "mobileDeviceBranding" -> "$brand",
    "mobileDeviceMarketingName" -> "device", "mobileDeviceModel" -> "$model",
    "operatingSystem" -> "$os", "operatingSystemVersion" -> "$os_version",
    "language" -> "language", "screenResolution" -> "screen size",
    "flashVersion" -> "flash version")
  val geoPairs: Seq[(String, String)] = Seq(
    "continent" -> "continent", "subContinent" -> "subcontinent",
    "country" -> "mp_country_code", "region" -> "$region", "metro" -> "metro",
    "city" -> "$city")
  val trafficPairs: Seq[(String, String)] = Seq(
    "campaign" -> "utm_campaign", "source" -> "utm_source",
    "medium" -> "utm_medium", "keyword" -> "utm_keyword",
    "referralPath" -> "referrer", "adContent" -> "utm_content")

  private def usable(v: String): Boolean =
    v != null && v.nonEmpty && v.toLowerCase != "na"

  /** JSON rows with absent objects deserialize as null maps/seqs — guard. */
  private def nm(m: Map[String, String]): Map[String, String] =
    Option(m).getOrElse(Map.empty)
  private def ns[A](s: Seq[A]): Seq[A] = Option(s).getOrElse(Seq.empty)

  private def mapDefaults(s: GaSession): Map[String, String] = {
    def pick(m: Map[String, String], pairs: Seq[(String, String)]) =
      pairs.flatMap { case (from, to) => nm(m).get(from).filter(usable).map(to -> _) }
    val base = pick(s.device, devicePairs) ++ pick(s.geoNetwork, geoPairs) ++
      pick(s.trafficSource, trafficPairs)
    val latLong = Seq(
      nm(s.geoNetwork).get("latitude").filter(usable).map("$latitude" -> _),
      nm(s.geoNetwork).get("longitude").filter(usable).map("$longitude" -> _)).flatten
    val channel = s.channelGrouping.filter(usable).map("UTM Channel" -> _)
    (base ++ latLong ++ channel).toMap
  }

  private def pivotDims(dims: Seq[IndexValue], label: String, eventName: String): Map[String, String] =
    dims.filter(iv => iv != null && usable(iv.value) && iv.index != null)
      .map(iv => s"$label #${iv.index} ($eventName)" -> iv.value).toMap

  import scala.jdk.CollectionConverters._
  private def toJsonString(v: Seq[Map[String, String]]): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.writeValueAsString(v.map(_.asJava).asJava)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** One GA session → 1 begin + N hit + 1 end canonical events. */
  def explodeSession(s: GaSession): Seq[MpEvent] = {
    val startMs = (try s.visitStartTime.toLong catch { case _: Exception => 0L }) * 1000L
    // P6 cascade: userId || fullVisitorId || visitorId || client_id || ""
    val did = Seq(s.userId, s.fullVisitorId, s.visitorId, s.client_id)
      .flatten.find(_.nonEmpty).getOrElse("")
    val defaults = mapDefaults(s) ++
      pivotDims(ns(s.customDimensions), "dimension", "session") +
      ("$source" -> "ga360-to-mixpanel")
    def mk(name: String, timeMs: Long, extra: Map[String, String]): MpEvent =
      MpEvent(name, did, timeMs / 1000L,
        md5hex(s"${s.visitId}|${s.fullVisitorId.getOrElse("")}|$name|$timeMs"),
        "ga360", defaults ++ extra)

    val begin = mk("session begins", startMs,
      nm(s.totals).map { case (k, v) => s"summary $k" -> v })

    val sortedHits = Option(s.hits).getOrElse(Seq.empty)
      .sortBy(h => try h.hitNumber.toLong catch { case _: Exception => Long.MaxValue })
    var endMs = startMs
    val hitEvents = sortedHits.map { h =>
      val offset = try h.time.toLong catch { case _: Exception => 0L }
      val tMs = if (offset == 0) startMs + 1000L else startMs + offset
      endMs = math.max(endMs, tMs)
      // name cascade: eventAction → eventCategory → hit.type (:181-195)
      val ei = nm(h.eventInfo)
      val name = Seq(
        ei.get("eventAction"), ei.get("eventCategory"),
        Option(h.`type`)).flatten.find(usable).getOrElse("unknown")
      val flat = nm(h.page) ++ ei ++ nm(h.appInfo) ++ nm(h.social)
      // P10: product/promotion arrays stay NESTED under aliases (reference
      // keeps them as sub-objects — gaToMixpanel.js:248-256); our string
      // property bag carries them as canonical JSON
      val nested = Seq("products" -> ns(h.product), "promotions" -> ns(h.promotion))
        .filter(_._2.nonEmpty)
        .map { case (k, v) => k -> toJsonString(v) }
      mk(name, tMs,
        flat.filter { case (_, v) => usable(v) } ++
          pivotDims(ns(h.customDimensions), "dimension", name) ++
          pivotDims(ns(h.customMetrics), "metric", name) ++ nested)
    }
    val end = mk("session ends", endMs + 1000L, Map("summary" -> "end"))
    (begin +: hitEvents) :+ end
  }

  /** DataFrame API: GA sessions (read with Model.gaSessionSchema) →
    * canonical events DataFrame.
    */
  def events(spark: SparkSession, sessions: DataFrame): DataFrame = {
    import spark.implicits._
    sessions.as[GaSession].flatMap(explodeSession).toDF()
  }

  /** GA profiles: one per session with a usable id; $set from the P5
    * default maps (gaToMixpanel.js:104-109).
    */
  def profiles(spark: SparkSession, sessions: DataFrame): DataFrame = {
    import spark.implicits._
    val ds = sessions.as[GaSession].flatMap { s =>
      val did = Seq(s.userId, s.fullVisitorId, s.visitorId, s.client_id)
        .flatten.find(_.nonEmpty)
      did.map(id => (id, mapDefaults(s)))
    }.toDF("distinct_id", "set")
    Dedup.exactFirstWins(ds, Seq("distinct_id"), Seq("distinct_id"))
  }
}
