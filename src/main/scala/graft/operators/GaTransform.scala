package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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
      isEntrance: Option[Boolean],
      isExit: Option[Boolean],
      referer: Option[String],
      eventInfo: Map[String, String],
      page: Map[String, String],
      appInfo: Map[String, String],
      social: Map[String, String],
      transaction: Map[String, String],
      item: Map[String, String],
      eCommerceAction: Map[String, String],
      contentGroup: Map[String, String],
      product: Seq[Map[String, String]],
      promotion: Seq[Map[String, String]],
      experiment: Seq[Map[String, String]],
      publisher_infos: Seq[Map[String, String]],
      customDimensions: Seq[IndexValue],
      customMetrics: Seq[IndexValue],
      customVariables: Seq[IndexValue])
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

  /** P5 rename tables — exactly the reference's three pair lists, in its
    * loop order (later pairs overwrite on alias collision, e.g.
    * screenResolution beats browserSize for "screen size";
    * gaToMixpanel.js:308-345).
    */
  val devicePairs: Seq[(String, String)] = Seq(
    "browser" -> "$browser", "browserSize" -> "screen size",
    "browserVersion" -> "$browser_version", "deviceCategory" -> "device type",
    "mobileDeviceInfo" -> "$device", "mobileDeviceModel" -> "$model",
    "operatingSystem" -> "$os", "operatingSystemVersion" -> "$os_version",
    "mobileDeviceBranding" -> "$brand", "language" -> "language",
    "screenResolution" -> "screen size")
  val geoPairs: Seq[(String, String)] = Seq(
    "continent" -> "continent", "subContinent" -> "sub continent",
    "country" -> "mp_country_code", "region" -> "$region", "metro" -> "dma",
    "city" -> "$city", "latitude" -> "$latitude", "longitude" -> "$longitude")
  val trafficPairs: Seq[(String, String)] = Seq(
    "adContent" -> "utm_content", "adWordsClickInfo" -> "ad words info",
    "campaign" -> "utm_campaign", "campaignCode" -> "utm_term",
    "isTrueDirect" -> "is true direct?", "keyword" -> "utm_keyword",
    "medium" -> "utm_medium", "referralPath" -> "$referrer",
    "source" -> "utm_source")

  private def usable(v: String): Boolean =
    v != null && v.nonEmpty && v.toLowerCase != "na"

  /** JSON rows with absent objects deserialize as null maps/seqs — guard. */
  private def nm(m: Map[String, String]): Map[String, String] =
    Option(m).getOrElse(Map.empty)
  private def ns[A](s: Seq[A]): Seq[A] = Option(s).getOrElse(Seq.empty)

  /** P5: device/geo/traffic pair renames + channel grouping. toMap keeps
    * the last binding per alias — the reference's loop-overwrite semantics.
    * `usable` (drops ""/"na") is the engine's GA-noise normalization
    * (documented divergence: the reference only drops falsy values).
    */
  def mapDefaults(s: GaSession): Map[String, String] = {
    def pick(m: Map[String, String], pairs: Seq[(String, String)]) =
      pairs.flatMap { case (from, to) => nm(m).get(from).filter(usable).map(to -> _) }
    val base = pick(s.device, devicePairs) ++ pick(s.geoNetwork, geoPairs) ++
      pick(s.trafficSource, trafficPairs)
    val channel = s.channelGrouping.filter(usable).map("UTM Channel" -> _)
    (base ++ channel).toMap
  }

  private def pivotDims(dims: Seq[IndexValue], label: String, eventName: String): Map[String, String] =
    dims.filter(iv => iv != null && usable(iv.value) && iv.index != null)
      .map(iv => s"$label #${iv.index} ($eventName)" -> iv.value).toMap

  import scala.jdk.CollectionConverters._
  // ObjectMapper construction is milliseconds-expensive; share one
  // serializable-safe instance per executor JVM (writeValueAsString is
  // thread-safe)
  @transient private lazy val jsonMapper =
    new com.fasterxml.jackson.databind.ObjectMapper()
  private def toJsonString(v: Seq[Map[String, String]]): String =
    jsonMapper.writeValueAsString(v.map(_.asJava).asJava)
  private def mapToJsonString(v: Map[String, String]): String =
    // sorted keys → deterministic serialization (oracle-comparable)
    jsonMapper.writeValueAsString(scala.collection.immutable.SortedMap.from(v).asJava)

  // MessageDigest is not thread-safe and getInstance is allocation-heavy
  // in a hot flatMap — one per task thread
  @transient private lazy val md5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  private val HexChars = "0123456789abcdef".toCharArray
  private def md5hex(s: String): String = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(i * 2) = HexChars((bytes(i) >> 4) & 0xf)
      out(i * 2 + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** One GA session → 1 begin + N hit + 1 end canonical events. */
  def explodeSession(s: GaSession): Seq[MpEvent] = {
    val startMs = (try s.visitStartTime.toLong catch { case _: Exception => 0L }) * 1000L
    // P6 cascade: userId || fullVisitorId || visitorId || client_id ||
    // visitId || "" (gaToMixpanel.js:135)
    val did = (Seq(s.userId, s.fullVisitorId, s.visitorId, s.client_id)
      .flatten :+ s.visitId).find(v => v != null && v.nonEmpty).getOrElse("")
    val defaults = mapDefaults(s) + ("$source" -> "ga360-to-mixpanel")
    def mk(name: String, timeMs: Long, extra: Map[String, String]): MpEvent =
      MpEvent(name, did, timeMs / 1000L,
        md5hex(s"${s.visitId}|${s.fullVisitorId.getOrElse("")}|$name|$timeMs"),
        "ga360", defaults ++ extra)

    // begin/end both carry the session summary (the reference attaches the
    // same `totals` object to both; our string bag flattens it)
    val summary = nm(s.totals).map { case (k, v) => s"summary $k" -> v }
    val begin = mk("session begins", startMs, summary)

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
      // standard scalar hit props (gaToMixpanel.js:243-246; the reference
      // reads hit.referrer — a typo for the schema's `referer`, fixed here)
      val simple = Seq(
        h.referer.filter(_.nonEmpty).map("$referrer" -> _),
        h.isEntrance.map("isEntrance" -> _.toString),
        h.isExit.map("isExit" -> _.toString),
        h.isInteraction.map("isInteraction" -> _.toString)).flatten.toMap
      // P10 flat splice of string sub-objects, in the reference's spread
      // order (last wins: transaction < social < page < item < appInfo <
      // eventInfo — gaToMixpanel.js:248-258)
      val flat = nm(h.transaction) ++ nm(h.social) ++ nm(h.page) ++
        nm(h.item) ++ nm(h.appInfo) ++ ei
      // arrays stay NESTED under aliases as canonical JSON (products/
      // promotions per the reference; experiments likewise — the
      // reference's object-spread of the experiment ARRAY is a bug that
      // yields index keys). contentGroup/eCommerceAction/publisher_infos
      // are declared by gaSchema.json but silently dropped by the
      // reference; we carry them nested so no GA360 field is lost.
      val nested = (Seq(
        "products" -> ns(h.product), "promotions" -> ns(h.promotion),
        "experiments" -> ns(h.experiment),
        "publisher_infos" -> ns(h.publisher_infos))
        .filter(_._2.nonEmpty)
        .map { case (k, v) => k -> toJsonString(v) }) ++
        (Seq("contentGroup" -> nm(h.contentGroup),
          "eCommerceAction" -> nm(h.eCommerceAction))
          .filter(_._2.nonEmpty)
          .map { case (k, v) => k -> mapToJsonString(v) })
      mk(name, tMs,
        simple ++
          flat.filter { case (_, v) => usable(v) } ++
          pivotDims(ns(h.customVariables), "variable", name) ++
          pivotDims(ns(h.customDimensions), "dimension", name) ++
          pivotDims(ns(h.customMetrics), "metric", name) ++ nested)
    }
    val end = mk("session ends", endMs + 1000L, summary)
    (begin +: hitEvents) :+ end
  }

  /** DataFrame API: GA sessions (read with Model.gaSessionSchema) →
    * canonical events DataFrame.
    */
  def events(spark: SparkSession, sessions: DataFrame): DataFrame = {
    import spark.implicits._
    // the flatMap is CPU-bound (wide nested decode + md5 + jackson per
    // hit): make sure it isn't serialized onto one core by a small input
    graft.Tables.ensureMinParallelism(sessions).as[GaSession]
      .flatMap(explodeSession).toDF()
  }

  /** GA profiles: one per session with a usable id; $set from the P5
    * default maps (gaToMixpanel.js:104-109).
    */
  /** P5 profiles — RELATIONAL tier (r11): the r10 typed flatMap
    * deserialized the full nested GaSession (16-field hit structs and
    * all) per row just to read four id strings and three maps, which
    * made it GC-noisy at sf1 (rep spreads 3.5–20 s, SCALE.md:465). This
    * projection reads ONLY the needed columns, builds the pair-rename
    * map with [[graft.functions.Fns.mapMergeLastWins]] (LAST_WIN =
    * exactly `toMap`'s later-binding-wins), and stays in whole-stage
    * codegen; [[profilesTyped]] keeps the reference-loop rendering and
    * the spec pins them equal.
    */
  def profiles(spark: SparkSession, sessions: DataFrame): DataFrame = {
    def usableC(v: Column): Column =
      v.isNotNull && v =!= "" && lower(v) =!= "na"
    def entries(m: Column, pairs: Seq[(String, String)]): Seq[Column] =
      pairs.map { case (from, to) =>
        val v = element_at(m, from)
        when(usableC(v), map(lit(to), v))
          .otherwise(map().cast("map<string,string>"))
      }
    val chan = when(usableC(col("channelGrouping")),
        map(lit("UTM Channel"), col("channelGrouping")))
      .otherwise(map().cast("map<string,string>"))
    val allEntries = entries(col("device"), devicePairs) ++
      entries(col("geoNetwork"), geoPairs) ++
      entries(col("trafficSource"), trafficPairs) :+ chan
    val ds = graft.Tables.ensureMinParallelism(sessions).select(
        graft.functions.Fns.coalesceNonEmpty(col("userId"),
          col("fullVisitorId"), col("visitorId"), col("client_id"),
          col("visitId")).as("distinct_id"),
        coalesce(col("visitStartTime").cast("long"), lit(0L)).as("t"),
        coalesce(col("visitId"), lit("")).as("vid"),
        graft.functions.Fns.mapMergeLastWins(allEntries: _*).as("set"))
      .filter(col("distinct_id").isNotNull)
    // first session (by start time, then visitId) wins — deterministic
    Dedup.exactFirstWins(ds, Seq("distinct_id"), Seq("t", "vid"))
      .drop("t", "vid")
  }

  /** The r10 typed-flatMap rendering of [[profiles]] (the reference's
    * sequential per-session loop) — kept as the semantic baseline the
    * relational tier is spec-pinned against.
    */
  def profilesTyped(spark: SparkSession, sessions: DataFrame): DataFrame = {
    import spark.implicits._
    val ds = graft.Tables.ensureMinParallelism(sessions).as[GaSession].flatMap { s =>
      val did = (Seq(s.userId, s.fullVisitorId, s.visitorId, s.client_id)
        .flatten :+ s.visitId).find(v => v != null && v.nonEmpty)
      val t = try s.visitStartTime.toLong catch { case _: Exception => 0L }
      did.map(id => (id, t, Option(s.visitId).getOrElse(""), mapDefaults(s)))
    }.toDF("distinct_id", "t", "vid", "set")
    // first session (by start time, then visitId) wins — deterministic
    Dedup.exactFirstWins(ds, Seq("distinct_id"), Seq("t", "vid"))
      .drop("t", "vid")
  }
}
