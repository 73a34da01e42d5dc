package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables.{t, epochS, ensureMinParallelism}
import graft.functions.{Fns, SegmentationWhere}
import graft.model.Model
import graft.operators.{AmplitudeTransform, GaTransform, MixpanelTransform}
import graft.sources.Sources

/** Fixture-backed oracle queries for the vendor transform packs (SURVEY §2.2
  * P4/P5/P9/P10/P12-P15, §2.3 F3/F4) — the reference's actual reason to
  * exist. Each query deterministically derives a vendor-shaped fixture from
  * the `events` parquet, pushes it through the REAL operator
  * (AmplitudeTransform / GaTransform / MixpanelTransform / Sources /
  * SegmentationWhere — not a reimplementation), and flattens the result to
  * scalar columns the DuckDB oracle reproduces directly from `events`.
  *
  * Reference provenance: transform/amplitudeToMixpanel.js:73-222,
  * transform/gaToMixpanel.js:135-386, connectors/mixpanelETL.js:119-129,
  * load/sendOther.js:44-202.
  */
object VendorPackOps {

  // ---------------------------------------------------------------- helpers

  /** Amplitude-export-shaped fixture rows derived from `events`. */
  private def ampFixture(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_type"),
      when(col("event_id") % 5 === 0, lit(null))
        .otherwise(concat(lit("u"), col("user_id"))).as("user_id"),
      when(col("event_id") % 10 === 0, lit(null))
        .otherwise(concat(lit("d"), col("event_id") % 97)).as("device_id"),
      (col("user_id") + 1000).as("amplitude_id"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("event_time"),
      concat(lit("ins-"), col("event_id")).as("$insert_id"),
      when(col("event_id") % 4 === 0, lit("")).otherwise(lit("9.9.9.9")).as("ip_address"),
      lit("SF").as("city"),
      when(col("event_id") % 6 === 0, lit(null)).otherwise(lit("CA")).as("region"),
      lit("US").as("country"),
      map(lit("plan"), lit("event-plan"),
        lit("k"), get_json_object(col("props"), "$.k")).as("event_properties"),
      when(col("event_id") % 2 === 0, map(lit("plan"), lit("user-plan")))
        .otherwise(map().cast("map<string,string>")).as("user_properties"),
      map().cast("map<string,string>").as("groups"),
      lit("2.1").as("app_version"),
      when(col("event_id") % 7 === 0, lit(null)).otherwise(lit("ios")).as("os_name"),
      lit("17.2").as("os_version"),
      lit(null).cast("string").as("device_brand"),
      lit("Apple").as("device_manufacturer"),
      lit("iPhone15").as("device_model"),
      lit(null).cast("string").as("paying"),
      lit(null).cast("string").as("dma"))

  private val emptyHits: Column =
    array().cast(ArrayType(Model.gaHitSchema))
  private val emptyDims: Column =
    array().cast(ArrayType(StructType(Seq(
      StructField("index", StringType), StructField("value", StringType)))))

  /** GA360-session-shaped fixture (one session per event row). When
    * `withHit` each session carries exactly one fully-populated hit
    * exercising every flattened/carried sub-object.
    */
  private[graft] def gaFixture(s: SparkSession, dir: String, withHit: Boolean): DataFrame = {
    // repartition the SLIM event rows before projecting the wide nested
    // session struct: the single-row-group test file scans as one task, and
    // shuffling narrow rows is far cheaper than shuffling built sessions
    // (downstream, GaTransform's flatMap then sees full parallelism)
    val ev = ensureMinParallelism(t(s, dir, "events"))
    val e = col("event_id")
    val hit = struct(
      lit("1").as("hitNumber"),
      when(e % 4 === 0, lit("0"))
        .otherwise((e % 90000 + 1).cast("string")).as("time"),
      lit("PAGE").as("type"),
      (e % 2 === 0).as("isInteraction"),
      lit(true).as("isEntrance"),
      (e % 3 === 0).as("isExit"),
      when(e % 5 === 0, lit("")).otherwise(concat(lit("/ref/"), e % 7)).as("referer"),
      map(lit("eventCategory"), concat(lit("cat-"), e % 4),
        lit("eventAction"),
        when(e % 3 === 0, concat(lit("act-"), e % 6))
          .when(e % 3 === 1, lit("na")).otherwise(lit(""))).as("eventInfo"),
      map(lit("pagePath"), concat(lit("/p/"), e),
        lit("pageTitle"), concat(lit("T"), e % 13),
        lit("hostname"), lit("ex.com")).as("page"),
      when(e % 6 === 0,
        map(lit("screenName"), lit("Home"), lit("screenDepth"), lit("2"))).as("appInfo"),
      when(e % 8 === 0,
        map(lit("socialNetwork"), lit("Twitter"),
          lit("hasSocialSourceReferral"), lit("Yes"))).as("social"),
      when(col("event_type") === "purchase",
        map(lit("transactionId"), concat(lit("T"), e),
          lit("transactionRevenue"), round(col("value") * 1000000).cast("long").cast("string"),
          lit("affiliation"), lit("web"),
          lit("currencyCode"), lit("USD"))).as("transaction"),
      when(col("event_type") === "purchase" && e % 2 === 0,
        map(lit("transactionId"), concat(lit("T"), e),
          lit("productName"), concat(lit("Prod-"), e % 5),
          lit("currencyCode"), lit("EUR"))).as("item"),
      when(col("event_type") === "purchase",
        map(lit("action_type"), lit("6"), lit("step"), lit("1"))).as("eCommerceAction"),
      map(lit("contentGroup1"), concat(lit("grp-"), e % 3),
        lit("previousContentGroup1"), lit("(entrance)")).as("contentGroup"),
      when(col("event_type").isin("view", "purchase"),
        array(map(lit("productSKU"), concat(lit("sku-"), e % 5),
          lit("v2ProductName"), concat(lit("P"), e % 5)))).as("product"),
      lit(null).cast(ArrayType(MapType(StringType, StringType))).as("promotion"),
      when(e % 9 === 0,
        array(map(lit("experimentId"), lit("e1"),
          lit("experimentVariant"), lit("B")))).as("experiment"),
      lit(null).cast(ArrayType(MapType(StringType, StringType))).as("publisher_infos"),
      array(struct(lit("3").as("index"),
        when(e % 2 === 0, concat(lit("cd-"), e % 4)).otherwise(lit("na"))
          .as("value"))).as("customDimensions"),
      array(struct(lit("2").as("index"),
        (e % 50).cast("string").as("value"))).as("customMetrics"),
      when(e % 10 === 0,
        array(struct(lit("1").as("index"), lit("var1").as("value"))))
        .cast(ArrayType(StructType(Seq(
          StructField("index", StringType), StructField("value", StringType)))))
        .as("customVariables"))
    ev.select(
      lit("1").as("visitNumber"),
      concat(lit("v"), e).as("visitId"),
      epochS(col("ts")).cast("string").as("visitStartTime"),
      lit("20240101").as("date"),
      when(e % 5 === 0, concat(lit("U"), col("user_id"))).as("userId"),
      when(e % 11 === 0, lit("")).otherwise(concat(lit("fv"), col("user_id"))).as("fullVisitorId"),
      lit(null).cast("string").as("visitorId"),
      when(e % 7 === 0, concat(lit("c"), col("user_id"))).as("client_id"),
      when(e % 4 === 0, lit("Organic Search")).when(e % 4 === 1, lit("Direct"))
        .when(e % 4 === 2, lit("na")).otherwise(lit("")).as("channelGrouping"),
      lit(null).cast("string").as("socialEngagementType"),
      map(lit("visits"), lit("1"), lit("hits"), lit("1")).as("totals"),
      map(lit("adContent"), concat(lit("ad-"), e % 3),
        lit("adWordsClickInfo"), lit("gclid-1"),
        lit("campaign"), lit("(not set)"),
        lit("campaignCode"), when(e % 2 === 0, lit("cc")).otherwise(lit("na")),
        lit("isTrueDirect"), lit("true"),
        lit("keyword"), lit("kw"),
        lit("medium"), lit("organic"),
        lit("referralPath"), concat(lit("/r/"), col("user_id") % 5),
        lit("source"), lit("google")).as("trafficSource"),
      map(lit("browser"),
        when(e % 3 === 0, lit("Chrome")).when(e % 3 === 1, lit("na")).otherwise(lit("")),
        lit("browserSize"), lit("800x600"),
        lit("browserVersion"), lit("100.1"),
        lit("deviceCategory"), lit("desktop"),
        lit("mobileDeviceInfo"), when(e % 4 === 0, lit("Pixel 8")).otherwise(lit("")),
        lit("mobileDeviceModel"), lit("M1"),
        lit("operatingSystem"), lit("Linux"),
        lit("operatingSystemVersion"), lit("6.5"),
        lit("mobileDeviceBranding"), lit("Google"),
        lit("language"), lit("en-us"),
        lit("screenResolution"),
        when(e % 2 === 0, lit("2560x1440")).otherwise(lit("na"))).as("device"),
      map(lit("continent"), lit("Americas"),
        lit("subContinent"), lit("Northern America"),
        lit("country"),
        when(e % 3 === 0, lit("United States")).when(e % 3 === 1, lit("France"))
          .otherwise(lit("na")),
        lit("region"), lit("CA"),
        lit("metro"), lit("807"),
        lit("city"), lit("SF"),
        lit("latitude"), lit("37.7"),
        lit("longitude"), lit("-122.4")).as("geoNetwork"),
      emptyDims.as("customDimensions"),
      (if (withHit) array(hit) else emptyHits).as("hits"))
  }

  /** DuckDB: the GA distinct_id cascade for the fixture above. */
  private val duckGaDid: String =
    """coalesce(CASE WHEN event_id % 5 = 0 THEN 'U' || user_id END,
      |  CASE WHEN event_id % 11 = 0 THEN NULL ELSE 'fv' || user_id END,
      |  CASE WHEN event_id % 7 = 0 THEN 'c' || user_id END,
      |  'v' || event_id)""".stripMargin

  /** Canonical-event fixture for the reverse (P13-P15) packs. */
  private def canonicalFixture(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_type").as("event"),
      concat(lit("u"), col("user_id")).as("distinct_id"),
      epochS(col("ts")).as("time"),
      concat(lit("i"), col("event_id")).as("insert_id"),
      lit("mixpanel").as("source"),
      map(lit("k"), get_json_object(col("props"), "$.k"),
        lit("eid"), col("event_id").cast("string")).as("properties"))

  // ------------------------------------------------------------------ specs

  val specs: Map[String, QuerySpec] = Map(

    // ---- P4 (+P6/P7 in the same pack): amplitude rename fan-out --------
    "p4_amp_rename_pack" -> QuerySpec(
      (s, dir) => {
        val out = AmplitudeTransform.events(ampFixture(s, dir), Some("r2"))
        out.select(
          col("insert_id"), col("event"), col("distinct_id"), col("time"),
          col("source"),
          element_at(col("properties"), "$os").as("os"),
          element_at(col("properties"), "$browser").as("browser"),
          element_at(col("properties"), "$app_version_string").as("app_version"),
          element_at(col("properties"), "$os_version").as("os_version"),
          element_at(col("properties"), "$brand").as("brand"),
          element_at(col("properties"), "$manufacturer").as("manufacturer"),
          element_at(col("properties"), "$model").as("model"),
          element_at(col("properties"), "$region").as("region"),
          element_at(col("properties"), "$city").as("city"),
          element_at(col("properties"), "plan").as("plan"),
          element_at(col("properties"), "k").as("k"),
          element_at(col("properties"), "$device_id").as("device_id_prop"),
          element_at(col("properties"), "ip").as("ip"),
          element_at(col("properties"), "mp_country_code").as("country_code"),
          element_at(col("properties"), "$source").as("source_prop"),
          element_at(col("properties"), "import-tag").as("import_tag")
        ).orderBy("insert_id")
      },
      """SELECT 'ins-' || event_id AS insert_id, event_type AS event,
        |  coalesce(CASE WHEN event_id % 5 = 0 THEN NULL ELSE 'u' || user_id END,
        |           CASE WHEN event_id % 10 = 0 THEN NULL ELSE 'd' || (event_id % 97) END,
        |           CAST(user_id + 1000 AS VARCHAR)) AS distinct_id,
        |  epoch_ms(ts)//1000 AS time,
        |  'amplitude' AS source,
        |  CASE WHEN event_id % 7 = 0 THEN NULL ELSE 'ios' END AS os,
        |  CASE WHEN event_id % 7 = 0 THEN NULL ELSE 'ios' END AS browser,
        |  '2.1' AS app_version, '17.2' AS os_version,
        |  NULL AS brand, 'Apple' AS manufacturer, 'iPhone15' AS model,
        |  CASE WHEN event_id % 6 = 0 THEN NULL ELSE 'CA' END AS region,
        |  'SF' AS city,
        |  CASE WHEN event_id % 2 = 0 THEN 'user-plan' ELSE 'event-plan' END AS plan,
        |  json_extract_string(props, '$.k') AS k,
        |  CASE WHEN event_id % 10 = 0 THEN NULL ELSE 'd' || (event_id % 97) END AS device_id_prop,
        |  CASE WHEN event_id % 4 = 0 THEN NULL ELSE '9.9.9.9' END AS ip,
        |  'US' AS country_code,
        |  'amplitude-to-mixpanel' AS source_prop,
        |  'r2' AS import_tag
        |FROM events ORDER BY insert_id""".stripMargin
    ),

    // ---- P9: spread-precedence map merge (LAST_WIN) --------------------
    "p9_map_merge_precedence" -> QuerySpec(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val a = map(lit("k1"), lit("a1"), lit("k2"), lit("a2"), lit("k3"), lit("a3"))
        val b = when(col("event_id") % 2 === 0,
          map(lit("k2"), concat(lit("b-"), col("user_id"))))
          .otherwise(map().cast("map<string,string>"))
        val c = when(col("event_id") % 3 === 0,
          map(lit("k3"), concat(lit("c-"), col("event_id") % 13)))
          .otherwise(map().cast("map<string,string>"))
        ev.withColumn("m", Fns.mapMergeLastWins(a, b, c))
          .select(col("event_id"),
            element_at(col("m"), "k1").as("k1"),
            element_at(col("m"), "k2").as("k2"),
            element_at(col("m"), "k3").as("k3"))
          .orderBy("event_id")
      },
      """SELECT event_id, 'a1' AS k1,
        |  CASE WHEN event_id % 2 = 0 THEN 'b-' || user_id ELSE 'a2' END AS k2,
        |  CASE WHEN event_id % 3 = 0 THEN 'c-' || (event_id % 13) ELSE 'a3' END AS k3
        |FROM events ORDER BY event_id""".stripMargin
    ),

    // ---- P5: GA mapDefaults pack via the profile path ------------------
    "p5_ga_map_defaults" -> QuerySpec(
      (s, dir) => {
        val out = GaTransform.profiles(s, gaFixture(s, dir, withHit = false))
        out.select(
          col("distinct_id"),
          element_at(col("set"), "$browser").as("browser"),
          element_at(col("set"), "screen size").as("screen_size"),
          element_at(col("set"), "$device").as("device"),
          element_at(col("set"), "$os").as("os"),
          element_at(col("set"), "$brand").as("brand"),
          element_at(col("set"), "device type").as("device_type"),
          element_at(col("set"), "mp_country_code").as("country_code"),
          element_at(col("set"), "dma").as("dma"),
          element_at(col("set"), "sub continent").as("sub_continent"),
          element_at(col("set"), "$latitude").as("lat"),
          element_at(col("set"), "$longitude").as("lon"),
          element_at(col("set"), "$referrer").as("referrer"),
          element_at(col("set"), "utm_term").as("utm_term"),
          element_at(col("set"), "is true direct?").as("true_direct"),
          element_at(col("set"), "ad words info").as("ad_words"),
          element_at(col("set"), "utm_campaign").as("campaign"),
          element_at(col("set"), "UTM Channel").as("channel")
        ).orderBy("distinct_id")
      },
      s"""WITH rows_ AS (
         |  SELECT $duckGaDid AS distinct_id,
         |    epoch_ms(ts)//1000 AS t, 'v' || event_id AS vid, event_id, user_id
         |  FROM events),
         |first_ AS (
         |  SELECT * FROM (SELECT *, row_number() OVER (
         |    PARTITION BY distinct_id ORDER BY t, vid) AS rn FROM rows_) WHERE rn = 1)
         |SELECT distinct_id,
         |  CASE WHEN event_id % 3 = 0 THEN 'Chrome' END AS browser,
         |  CASE WHEN event_id % 2 = 0 THEN '2560x1440' ELSE '800x600' END AS screen_size,
         |  CASE WHEN event_id % 4 = 0 THEN 'Pixel 8' END AS device,
         |  'Linux' AS os, 'Google' AS brand, 'desktop' AS device_type,
         |  CASE WHEN event_id % 3 = 0 THEN 'United States'
         |       WHEN event_id % 3 = 1 THEN 'France' END AS country_code,
         |  '807' AS dma, 'Northern America' AS sub_continent,
         |  '37.7' AS lat, '-122.4' AS lon,
         |  '/r/' || (user_id % 5) AS referrer,
         |  CASE WHEN event_id % 2 = 0 THEN 'cc' END AS utm_term,
         |  'true' AS true_direct, 'gclid-1' AS ad_words,
         |  '(not set)' AS campaign,
         |  CASE WHEN event_id % 4 = 0 THEN 'Organic Search'
         |       WHEN event_id % 4 = 1 THEN 'Direct' END AS channel
         |FROM first_ ORDER BY distinct_id""".stripMargin
    ),

    // ---- P10: GA hit flatten incl. transaction/item/eCommerceAction/
    //      contentGroup/experiment + custom pivots -----------------------
    "p10_ga_hit_flatten" -> QuerySpec(
      (s, dir) => {
        val out = GaTransform.events(s, gaFixture(s, dir, withHit = true))
        out.filter(!col("event").isin("session begins", "session ends"))
          .select(
            col("insert_id"), col("event"), col("distinct_id"), col("time"),
            element_at(col("properties"), "$referrer").as("referrer"),
            element_at(col("properties"), "isEntrance").as("is_entrance"),
            element_at(col("properties"), "isExit").as("is_exit"),
            element_at(col("properties"), "isInteraction").as("is_interaction"),
            element_at(col("properties"), "pagePath").as("page_path"),
            element_at(col("properties"), "pageTitle").as("page_title"),
            element_at(col("properties"), "hostname").as("hostname"),
            element_at(col("properties"), "screenName").as("screen_name"),
            element_at(col("properties"), "screenDepth").as("screen_depth"),
            element_at(col("properties"), "socialNetwork").as("social_network"),
            element_at(col("properties"), "transactionId").as("transaction_id"),
            element_at(col("properties"), "transactionRevenue").as("revenue"),
            element_at(col("properties"), "currencyCode").as("currency"),
            element_at(col("properties"), "productName").as("item_product"),
            element_at(col("properties"), "eCommerceAction").as("ecommerce_json"),
            element_at(col("properties"), "contentGroup").as("content_json"),
            element_at(col("properties"), "products").as("products"),
            element_at(col("properties"), "experiments").as("experiments"),
            element_at(col("properties"), "eventCategory").as("event_category"),
            concat(lit("dimension #3 ("), col("event"), lit(")")).as("dim_key"),
            element_at(col("properties"),
              concat(lit("dimension #3 ("), col("event"), lit(")"))).as("dim3"),
            element_at(col("properties"),
              concat(lit("metric #2 ("), col("event"), lit(")"))).as("met2"),
            element_at(col("properties"),
              concat(lit("variable #1 ("), col("event"), lit(")"))).as("var1"),
            element_at(col("properties"), "$source").as("source_prop")
          ).orderBy("insert_id")
      },
      s"""WITH base AS (
         |  SELECT event_id, user_id, event_type, value,
         |    epoch_ms(ts)//1000 AS start_s,
         |    CASE WHEN event_id % 3 = 0 THEN 'act-' || (event_id % 6)
         |         ELSE 'cat-' || (event_id % 4) END AS name,
         |    CASE WHEN event_id % 4 = 0 THEN (epoch_ms(ts)//1000)*1000 + 1000
         |         ELSE (epoch_ms(ts)//1000)*1000 + (event_id % 90000 + 1) END AS t_ms
         |  FROM events)
         |SELECT
         |  md5('v' || event_id || '|' ||
         |      (CASE WHEN event_id % 11 = 0 THEN '' ELSE 'fv' || user_id END) ||
         |      '|' || name || '|' || t_ms) AS insert_id,
         |  name AS event,
         |  $duckGaDid AS distinct_id,
         |  t_ms//1000 AS time,
         |  CASE WHEN event_id % 5 = 0 THEN '/r/' || (user_id % 5)
         |       ELSE '/ref/' || (event_id % 7) END AS referrer,
         |  'true' AS is_entrance,
         |  CASE WHEN event_id % 3 = 0 THEN 'true' ELSE 'false' END AS is_exit,
         |  CASE WHEN event_id % 2 = 0 THEN 'true' ELSE 'false' END AS is_interaction,
         |  '/p/' || event_id AS page_path,
         |  'T' || (event_id % 13) AS page_title,
         |  'ex.com' AS hostname,
         |  CASE WHEN event_id % 6 = 0 THEN 'Home' END AS screen_name,
         |  CASE WHEN event_id % 6 = 0 THEN '2' END AS screen_depth,
         |  CASE WHEN event_id % 8 = 0 THEN 'Twitter' END AS social_network,
         |  CASE WHEN event_type = 'purchase' THEN 'T' || event_id END AS transaction_id,
         |  CASE WHEN event_type = 'purchase'
         |       THEN CAST(CAST(round(value * 1000000) AS BIGINT) AS VARCHAR) END AS revenue,
         |  CASE WHEN event_type = 'purchase' AND event_id % 2 = 0 THEN 'EUR'
         |       WHEN event_type = 'purchase' THEN 'USD' END AS currency,
         |  CASE WHEN event_type = 'purchase' AND event_id % 2 = 0
         |       THEN 'Prod-' || (event_id % 5) END AS item_product,
         |  CASE WHEN event_type = 'purchase'
         |       THEN '{"action_type":"6","step":"1"}' END AS ecommerce_json,
         |  '{"contentGroup1":"grp-' || (event_id % 3) ||
         |    '","previousContentGroup1":"(entrance)"}' AS content_json,
         |  CASE WHEN event_type IN ('view','purchase')
         |       THEN '[{"productSKU":"sku-' || (event_id % 5) ||
         |            '","v2ProductName":"P' || (event_id % 5) || '"}]' END AS products,
         |  CASE WHEN event_id % 9 = 0
         |       THEN '[{"experimentId":"e1","experimentVariant":"B"}]' END AS experiments,
         |  'cat-' || (event_id % 4) AS event_category,
         |  'dimension #3 (' || name || ')' AS dim_key,
         |  CASE WHEN event_id % 2 = 0 THEN 'cd-' || (event_id % 4) END AS dim3,
         |  CAST(event_id % 50 AS VARCHAR) AS met2,
         |  CASE WHEN event_id % 10 = 0 THEN 'var1' END AS var1,
         |  'ga360-to-mixpanel' AS source_prop
         |FROM base ORDER BY insert_id""".stripMargin
    ),

    // ---- P12: engage → import profile reshape --------------------------
    "p12_engage_reshape" -> QuerySpec(
      (s, dir) => {
        val engage = t(s, dir, "events").select(
          concat(lit("u"), col("event_id")).as("$distinct_id"),
          map(lit("plan"), concat(lit("p"), col("event_id") % 3),
            lit("city"), lit("SF")).as("$properties"))
        MixpanelTransform.engageToProfiles(engage)
          .select(col("distinct_id"), col("ignore_time"), col("ip"),
            element_at(col("set"), "plan").as("plan"),
            element_at(col("set"), "city").as("city"))
          .orderBy("distinct_id")
      },
      """SELECT 'u' || event_id AS distinct_id, '0' AS ignore_time, '' AS ip,
        |  'p' || (event_id % 3) AS plan, 'SF' AS city
        |FROM events ORDER BY distinct_id""".stripMargin
    ),

    // ---- P13: canonical events → Amplitude wire shape ------------------
    "p13_reverse_amplitude_events" -> QuerySpec(
      (s, dir) =>
        MixpanelTransform.eventsToAmplitude(canonicalFixture(s, dir))
          .select(col("insert_id"), col("user_id"), col("device_id"),
            col("event_type"), col("time"),
            element_at(col("event_properties"), "k").as("k"))
          .orderBy("insert_id"),
      """SELECT 'i' || event_id AS insert_id,
        |  'u' || user_id AS user_id, 'u' || user_id AS device_id,
        |  event_type, (epoch_ms(ts)//1000) * 1000 AS time,
        |  json_extract_string(props, '$.k') AS k
        |FROM events ORDER BY insert_id""".stripMargin
    ),

    // ---- P14: canonical profiles → Amplitude /identify shape -----------
    "p14_reverse_amplitude_profiles" -> QuerySpec(
      (s, dir) => {
        val profiles = t(s, dir, "events")
          .select(col("user_id")).distinct()
          .select(concat(lit("u"), col("user_id")).as("distinct_id"),
            map(lit("plan"), concat(lit("p"), col("user_id") % 3)).as("set"))
        MixpanelTransform.profilesToAmplitude(profiles)
          .select(col("user_id"),
            element_at(col("user_properties"), "plan").as("plan"))
          .orderBy("user_id")
      },
      """SELECT DISTINCT 'u' || user_id AS user_id, 'p' || (user_id % 3) AS plan
        |FROM events ORDER BY user_id""".stripMargin
    ),

    // ---- P15: canonical events → Woopra {visitor, actions[]} -----------
    "p15_reverse_woopra" -> QuerySpec(
      (s, dir) =>
        MixpanelTransform.eventsToWoopra(canonicalFixture(s, dir))
          .select(
            element_at(element_at(col("actions"), 1).getField("properties"), "eid")
              .cast("long").as("eid"),
            col("visitor.id").as("visitor_id"),
            element_at(col("actions"), 1).getField("name").as("action_name"),
            element_at(col("actions"), 1).getField("time").as("action_time_ms"))
          .orderBy("eid"),
      """SELECT event_id AS eid, 'u' || user_id AS visitor_id,
        |  event_type AS action_name, (epoch_ms(ts)//1000) * 1000 AS action_time_ms
        |FROM events ORDER BY eid""".stripMargin
    ),

    // ---- F3: corrupt-record gate (PERMISSIVE split, no silent drops) ----
    "f3_corrupt_gate" -> QuerySpec(
      (s, dir) => {
        val ev = t(s, dir, "events")
        // fixture write stays PARALLEL: file order is irrelevant (both the
        // query and the oracle sort by event_id at the end), so no global
        // orderBy and no coalesce(1) single-task funnel.
        val lines = ev.select(
          when(col("event_id") % 10 === 5,
            concat(lit("{corrupt::"), col("event_id")))
            .otherwise(to_json(struct(col("event_id"), col("event_type"),
              col("user_id")))).as("line"))
        val path = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"), "graft_f3_fixture").toString
        lines.write.mode("overwrite").text(path)
        val schema = StructType(Seq(
          StructField("event_id", LongType),
          StructField("event_type", StringType),
          StructField("user_id", LongType)))
        val jr = Sources.jsonAuto(s, path, schema)
        val nCorrupt = jr.corrupt.count()
        jr.good.select(col("event_id"), col("event_type"))
          .withColumn("n_corrupt", lit(nCorrupt))
          .orderBy("event_id")
      },
      """SELECT event_id, event_type,
        |  (SELECT CAST(count(*) AS BIGINT) FROM events WHERE event_id % 10 = 5) AS n_corrupt
        |FROM events WHERE event_id % 10 <> 5 ORDER BY event_id""".stripMargin
    ),

    // ---- F3b: FILE-level gate (reference fidelity) ----------------------
    // The reference abandons the ENTIRE input file on a validation error
    // (transform/gaToMixpanel.js:51-58); f3 above is the line-level
    // variant. The fixture routes each row to a deterministic file via
    // repartition+partitionBy on fk = (event_id/200) % 50 (one file per
    // fk: hash repartition puts a given fk in exactly one task, and the
    // writer emits one file per task×fk; the %50 caps the fixture at 50
    // files at ANY SF — without it sf0.1 writes 500 tiny partition dirs
    // and listing dominates the query), and corrupts event_id%1000==5
    // lines — so which FILES are poisoned (every 5th fk) is pure event_id
    // arithmetic the oracle replays without knowing anything about Spark's
    // file layout, and good files survive at every SF (at sf0.001 ids run
    // 0..999: fk 0 is poisoned, fks 1-4 pass).
    "f3b_file_gate" -> QuerySpec(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val lines = ev.select(
          ((col("event_id") / 200).cast("long") % 50).as("fk"),
          when(col("event_id") % 1000 === 5,
            concat(lit("{corrupt::"), col("event_id")))
            .otherwise(to_json(struct(col("event_id"), col("event_type"),
              col("user_id")))).as("line"))
        val path = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"), "graft_f3b_fixture").toString
        lines.repartition(col("fk"))
          .write.mode("overwrite").partitionBy("fk").text(path)
        val schema = StructType(Seq(
          StructField("event_id", LongType),
          StructField("event_type", StringType),
          StructField("user_id", LongType)))
        val gated = Sources.jsonFileGate(s, path, schema)
        val nBadFiles = gated.badFiles.count()
        gated.good.select(col("event_id"), col("event_type"))
          .withColumn("n_bad_files", lit(nBadFiles))
          .orderBy("event_id")
      },
      """WITH f AS (
        |  SELECT event_id, event_type, (event_id // 200) % 50 AS fk FROM events),
        |bad AS (SELECT DISTINCT fk FROM f WHERE event_id % 1000 = 5)
        |SELECT event_id, event_type,
        |  (SELECT CAST(count(*) AS BIGINT) FROM bad) AS n_bad_files
        |FROM f WHERE fk NOT IN (SELECT fk FROM bad) ORDER BY event_id""".stripMargin
    ),

    // ---- F4: segmentation-where expression → Catalyst predicate --------
    "f4_segmentation_where" -> QuerySpec(
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("properties", map(
            lit("plan"),
            when(col("event_id") % 3 === 0, lit("pro"))
              .when(col("event_id") % 3 === 1, lit("free"))
              .otherwise(lit(null).cast("string")),
            lit("k"), get_json_object(col("props"), "$.k"),
            lit("v"), col("value").cast("string")))
        val where =
          """(properties["plan"] == "pro" or properties["k"] > 50) and """ +
            """not defined(properties["gone"]) and properties["v"] <= 9.5"""
        ev.filter(SegmentationWhere.parse(where, col("properties")))
          .select("event_id")
          .orderBy("event_id")
      },
      """SELECT event_id FROM events
        |WHERE ((CASE WHEN event_id % 3 = 0 THEN 'pro'
        |             WHEN event_id % 3 = 1 THEN 'free' END) = 'pro'
        |       OR TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) > 50)
        |  AND TRY_CAST(CAST(value AS VARCHAR) AS DOUBLE) <= 9.5
        |ORDER BY event_id""".stripMargin
    ),

    // ---- F4b: segmentation-where `in`-list / contains / string-in ------
    "f4b_segmentation_in_contains" -> QuerySpec(
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("properties", map(
            lit("plan"),
            when(col("event_id") % 3 === 0, lit("pro"))
              .when(col("event_id") % 3 === 1, lit("free"))
              .otherwise(lit(null).cast("string")),
            lit("k"), get_json_object(col("props"), "$.k")))
        val where =
          """(properties["plan"] in ["pro", "free"] and contains(properties["k"], "3")) """ +
            """or properties["k"] in [10, 20, 30, 40, 50] or "ree" in properties["plan"]"""
        ev.filter(SegmentationWhere.parse(where, col("properties")))
          .select("event_id")
          .orderBy("event_id")
      },
      """SELECT event_id FROM (
        |  SELECT event_id,
        |    CASE WHEN event_id % 3 = 0 THEN 'pro'
        |         WHEN event_id % 3 = 1 THEN 'free' END AS plan,
        |    json_extract_string(props, '$.k') AS k
        |  FROM events)
        |WHERE (plan IN ('pro','free') AND contains(k, '3'))
        |   OR TRY_CAST(k AS DOUBLE) IN (10, 20, 30, 40, 50)
        |   OR contains(plan, 'ree')
        |ORDER BY event_id""".stripMargin
    ),

    // ---- F4c: typecast operands, boolean literals, has_prefix, and
    //      and-over-or precedence (a and b or c == (a and b) or c) -------
    "f4c_segmentation_typed" -> QuerySpec(
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("properties", map(
            lit("b"), when(col("event_id") % 2 === 0, lit("true")).otherwise(lit("false")),
            lit("k"), get_json_object(col("props"), "$.k"),
            lit("path"), concat(lit("/p/"), col("event_id") % 7, lit("/x"))))
        val where =
          """boolean(properties["b"]) == true and number(properties["k"]) >= 40 """ +
            """or has_prefix(properties["path"], "/p/3")"""
        ev.filter(SegmentationWhere.parse(where, col("properties")))
          .select("event_id")
          .orderBy("event_id")
      },
      """SELECT event_id FROM events
        |WHERE (event_id % 2 = 0
        |       AND TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 40)
        |   OR starts_with('/p/' || (event_id % 7) || '/x', '/p/3')
        |ORDER BY event_id""".stripMargin
    )
  )
}
