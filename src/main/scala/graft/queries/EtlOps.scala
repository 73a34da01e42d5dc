package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.{t, epochS}
import graft.functions.Fns

/** The reference's ETL operator surface (SURVEY §2.2-§2.8) re-expressed as
  * verifiable queries over the synthetic `events`/`documents` tables.
  * Each query name carries the SURVEY §2 operator id it covers.
  *
  * These are narrow (shuffle-free) projection/filter chains except where the
  * operator is inherently keyed (dedup → hash partition by key; sessionize →
  * window over user partition) — exactly the plan shape that scales linearly
  * with input on a cluster.
  */
object EtlOps {

  val specs: Map[String, QuerySpec] = Map(
    // ---- P1: column rename pack (csvETL.js:101-118) -------------------
    "p1_rename_columns" -> QuerySpec(
      (s, dir) =>
        t(s, dir, "events")
          .withColumnRenamed("event_type", "event")
          .withColumnRenamed("user_id", "distinct_id")
          .select(col("event_id"), col("event"), col("distinct_id"))
          .orderBy("event_id"),
      """SELECT event_id, event_type AS event, user_id AS distinct_id
        |FROM events ORDER BY event_id""".stripMargin
    ),

    // ---- P2+P3: drop cols + constant/tag columns ----------------------
    "p2_p3_drop_and_tag" -> QuerySpec(
      (s, dir) =>
        t(s, dir, "documents")
          .drop("text")
          .withColumn("source_tag", lit("graft-import"))
          .orderBy("doc_id"),
      """SELECT doc_id, lang, source, n_chars, 'graft-import' AS source_tag
        |FROM documents ORDER BY doc_id""".stripMargin
    ),

    // ---- P6: ID coalescing, first non-empty wins ----------------------
    "p6_coalesce_id" -> QuerySpec(
      (s, dir) => {
        val ev = t(s, dir, "events")
          // synthesize the reference's sparse-ids world: user_id missing for
          // every 7th event, device always present
          .withColumn("maybe_user",
            when(col("event_id") % 7 === 0, lit(null)).otherwise(col("user_id").cast("string")))
          .withColumn("device_id", concat(lit("d-"), (col("event_id") % 97).cast("string")))
        ev.withColumn("distinct_id", Fns.coalesceNonEmpty(col("maybe_user"), col("device_id")))
          .select("event_id", "distinct_id")
          .orderBy("event_id")
      },
      """SELECT event_id,
        | coalesce(CASE WHEN event_id % 7 = 0 THEN NULL ELSE CAST(user_id AS VARCHAR) END,
        |          'd-' || CAST(event_id % 97 AS VARCHAR)) AS distinct_id
        |FROM events ORDER BY event_id""".stripMargin
    ),

    // ---- P7: time normalization with 13-digit ms heuristic ------------
    "p7_time_normalize" -> QuerySpec(
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("as_sec_str", epochS(col("ts")).cast("string"))
          .withColumn("as_ms_str", (epochS(col("ts")) * 1000).cast("string"))
          .withColumn("as_iso_str", date_format(col("ts").cast("timestamp"), "yyyy-MM-dd HH:mm:ss"))
        ev.select(
          col("event_id"),
          Fns.normalizeEpochSeconds(col("as_sec_str")).as("t_from_sec"),
          Fns.normalizeEpochSeconds(col("as_ms_str")).as("t_from_ms"),
          Fns.normalizeEpochSeconds(col("as_iso_str")).as("t_from_iso")
        ).orderBy("event_id")
      },
      """WITH src AS (
        |  SELECT event_id,
        |    CAST(epoch_ms(ts)//1000 AS VARCHAR) AS as_sec_str,
        |    CAST((epoch_ms(ts)//1000)*1000 AS VARCHAR) AS as_ms_str,
        |    strftime(ts, '%Y-%m-%d %H:%M:%S') AS as_iso_str
        |  FROM events)
        |SELECT event_id,
        | CASE WHEN regexp_matches(as_sec_str,'^[0-9]+$') AND length(as_sec_str) >= 13
        |      THEN CAST(as_sec_str AS BIGINT)//1000
        |      WHEN regexp_matches(as_sec_str,'^[0-9]+$') THEN CAST(as_sec_str AS BIGINT)
        |      ELSE epoch_ms(CAST(as_sec_str AS TIMESTAMP))//1000 END AS t_from_sec,
        | CASE WHEN regexp_matches(as_ms_str,'^[0-9]+$') AND length(as_ms_str) >= 13
        |      THEN CAST(as_ms_str AS BIGINT)//1000
        |      WHEN regexp_matches(as_ms_str,'^[0-9]+$') THEN CAST(as_ms_str AS BIGINT)
        |      ELSE epoch_ms(CAST(as_ms_str AS TIMESTAMP))//1000 END AS t_from_ms,
        | CASE WHEN regexp_matches(as_iso_str,'^[0-9]+$') AND length(as_iso_str) >= 13
        |      THEN CAST(as_iso_str AS BIGINT)//1000
        |      WHEN regexp_matches(as_iso_str,'^[0-9]+$') THEN CAST(as_iso_str AS BIGINT)
        |      ELSE epoch_ms(CAST(as_iso_str AS TIMESTAMP))//1000 END AS t_from_iso
        |FROM src ORDER BY event_id""".stripMargin
    ),

    // ---- P8: deterministic surrogate key (md5 insert id) --------------
    "p8_insert_id" -> QuerySpec(
      (s, dir) =>
        t(s, dir, "events")
          .withColumn("insert_id",
            Fns.mpInsertId(col("event_id"), col("event_type"), col("user_id"), epochS(col("ts"))))
          .select("event_id", "insert_id")
          .orderBy("event_id"),
      """SELECT event_id,
        | md5(concat_ws('|', event_id, event_type, user_id, epoch_ms(ts)//1000)) AS insert_id
        |FROM events ORDER BY event_id""".stripMargin
    ),

    // ---- P16: time-shift to present (gaToMixpanel.js:291-298) ---------
    // Shift so the newest event lands 4 days before a fixed anchor
    // (deterministic stand-in for now()).
    "p16_timeshift_to_present" -> QuerySpec(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val anchor = lit("2026-01-01 00:00:00").cast("timestamp")
        val maxT = ev.agg(max(epochS(col("ts"))).as("max_t"))
        ev.crossJoin(broadcast(maxT))
          .withColumn("shifted_t",
            epochS(col("ts")) + (epochS(anchor) - col("max_t") - lit(345600L)))
          .select("event_id", "shifted_t")
          .orderBy("event_id")
      },
      """SELECT event_id,
        | epoch_ms(ts)//1000 +
        |   (epoch_ms(TIMESTAMP '2026-01-01 00:00:00')//1000
        |    - (SELECT max(epoch_ms(ts)//1000) FROM events) - 345600) AS shifted_t
        |FROM events ORDER BY event_id""".stripMargin
    ),

    // ---- F1: non-empty property-bag predicate -------------------------
    // props is a JSON string column; keep rows whose parsed map is non-empty.
    "f1_nonempty_props" -> QuerySpec(
      (s, dir) =>
        t(s, dir, "events")
          .withColumn("props_map",
            from_json(col("props"), org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)))
          .filter(size(map_keys(col("props_map"))) > 0)
          .select("event_id")
          .orderBy("event_id"),
      """SELECT event_id FROM events
        |WHERE len(json_keys(props)) > 0 ORDER BY event_id""".stripMargin
    ),

    // ---- F2: "na"/empty-string filter ---------------------------------
    "f2_na_filter" -> QuerySpec(
      (s, dir) =>
        t(s, dir, "documents")
          .filter(lower(col("lang")) =!= "na" && col("text") =!= "")
          .select("doc_id", "lang")
          .orderBy("doc_id"),
      """SELECT doc_id, lang FROM documents
        |WHERE lower(lang) <> 'na' AND text <> '' ORDER BY doc_id""".stripMargin
    ),

    // ---- F5: event-name IN-list pushdown ------------------------------
    "f5_event_in_list" -> QuerySpec(
      (s, dir) =>
        t(s, dir, "events")
          .filter(col("event_type").isin("click", "purchase"))
          .select("event_id", "event_type", "user_id")
          .orderBy("event_id"),
      """SELECT event_id, event_type, user_id FROM events
        |WHERE event_type IN ('click','purchase') ORDER BY event_id""".stripMargin
    ),

    // ---- F6: null compaction ------------------------------------------
    "f6_null_drop" -> QuerySpec(
      (s, dir) =>
        t(s, dir, "events")
          .withColumn("maybe", when(col("event_type") === "error", lit(null)).otherwise(col("value")))
          .na.drop(Seq("maybe"))
          .select("event_id", "maybe")
          .orderBy("event_id"),
      """SELECT event_id, value AS maybe FROM events
        |WHERE event_type <> 'error' ORDER BY event_id""".stripMargin
    ),

    // ---- A1: global count reconciliation ------------------------------
    "a1_global_counts" -> QuerySpec(
      (s, dir) =>
        t(s, dir, "events").agg(
          count(lit(1)).as("n_events"),
          countDistinct("user_id").as("n_users"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases")
        ),
      """SELECT count(*) AS n_events, count(DISTINCT user_id) AS n_users,
        | CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
        |FROM events""".stripMargin
    ),

    // ---- A4: min/max over column (fix of reference's tail-read bug) ---
    "a4_min_max_time" -> QuerySpec(
      (s, dir) =>
        t(s, dir, "events").agg(
          min(epochS(col("ts"))).as("oldest"),
          max(epochS(col("ts"))).as("newest")
        ),
      """SELECT min(epoch_ms(ts)//1000) AS oldest, max(epoch_ms(ts)//1000) AS newest
        |FROM events""".stripMargin
    ),

    // ---- A3/J3: deterministic first-wins dedup ------------------------
    "a3_dedup_first_wins" -> QuerySpec(
      (s, dir) => {
        val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
        t(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_type", "event_id")
          .orderBy("user_id", "event_type")
      },
      """SELECT user_id, event_type, event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin
    ),

    // ---- J1: identity merge-pair emission -----------------------------
    "j1_merge_pairs" -> QuerySpec(
      (s, dir) =>
        t(s, dir, "events")
          .withColumn("device_id", concat(lit("d-"), (col("event_id") % 97).cast("string")))
          .filter(col("user_id").isNotNull)
          .select(concat_ws(",", col("user_id").cast("string"), col("device_id")).as("merge_pair"))
          .distinct()
          .orderBy("merge_pair"),
      """SELECT DISTINCT CAST(user_id AS VARCHAR) || ',' || 'd-' || CAST(event_id % 97 AS VARCHAR) AS merge_pair
        |FROM events WHERE user_id IS NOT NULL ORDER BY merge_pair""".stripMargin
    ),

    // ---- U2: union of per-source frames (unionByName) -----------------
    "u2_union_by_name" -> QuerySpec(
      (s, dir) => {
        val a = t(s, dir, "events").filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"))
        val b = t(s, dir, "events").filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id")) // deliberately reordered
        a.unionByName(b).orderBy("event_id")
      },
      """SELECT event_id, user_id FROM events WHERE event_type = 'view'
        |UNION ALL
        |SELECT event_id, user_id FROM events WHERE event_type = 'error'
        |ORDER BY event_id""".stripMargin
    ),

    // ---- X1: session explosion (the reference's signature operator) ----
    // Sessionize events per user with a 30-minute inactivity gap, then emit
    // 1 "session begins" + N hit rows + 1 "session ends" (+1s) per session —
    // the GA session→events explosion re-expressed relationally
    // (gaToMixpanel.js:129-301).
    "x1_session_explode" -> QuerySpec(
      (s, dir) => {
        val ev = t(s, dir, "events").withColumn("t", epochS(col("ts")))
        graft.operators.Sessionize
          .explode(ev, "user_id", "t", "event_id", "event_type", gapSeconds = 1800)
          .orderBy("user_id", "session_seq", "time_s", "event")
      },
      """WITH ordered AS (
        |  SELECT user_id, event_id, event_type, ts, epoch_ms(ts)//1000 AS t,
        |    lag(epoch_ms(ts)//1000) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t
        |  FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN prev_t IS NULL OR t - prev_t > 1800 THEN 1 ELSE 0 END AS is_new
        |  FROM ordered),
        |sessions AS (
        |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged),
        |bounds AS (
        |  SELECT user_id, session_seq, min(t) AS t0, max(t) AS t1
        |  FROM sessions GROUP BY user_id, session_seq)
        |SELECT user_id, session_seq, event_type AS event, t AS time_s FROM sessions
        |UNION ALL
        |SELECT user_id, session_seq, 'session begins', t0 FROM bounds
        |UNION ALL
        |SELECT user_id, session_seq, 'session ends', t1 + 1 FROM bounds
        |ORDER BY user_id, session_seq, time_s, event""".stripMargin
    )
  )
}
