package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables.{t, epochS}
import graft.operators.{AsofJoin, BloomPrefilterJoin, Ranks, ZOrder}

/** Extended analytics surface: as-of join, range join, grouping sets,
  * statistical aggregates — rounding out the M7 query layer with the
  * join/agg shapes the reference's event domain needs at scale.
  */
object ExtendedAnalytics {

  val specs: Map[String, QuerySpec] = Map(

    // ---- heavy hitters: mergeable Misra–Gries sketch -------------------
    // The key stream plants real skew over events (user_id % 10 < 3 maps
    // ~30% of events onto 3 hot keys at ~10% each; the rest fan out to
    // per-user cold keys), so with k=16 the sketch runs under genuine
    // eviction pressure (~150 distinct keys vs 15 counters) and exactly
    // the hot keys clear the n/16 threshold. A sketch's CONTENT is
    // merge-order dependent, so the oracle gates on the deterministic
    // part only (the approx_distinct precedent): the exact heavy set
    // with its counts, plus guarantee booleans that must all hold —
    // membership (true > n/k ⇒ in summary), the est ≤ true ≤ est+n/k
    // band, and the ≤ k-1 size bound.
    "agg_heavy_hitters" -> QuerySpec(
      (s, dir) => {
        val k = 16
        val stream = t(s, dir, "events").select(
          when(col("user_id") % 10 < 3,
            concat(lit("hot_"), (col("user_id") % 3).cast("string")))
            .otherwise(concat(lit("cold_"), col("user_id").cast("string")))
            .as("key"))
        val sk = stream.agg(graft.functions.Fns.misraGries(col("key"), k).as("mg"),
          count(lit(1)).as("n"))
        val est = coalesce(element_at(col("mg"), col("key")), lit(0L))
        stream.groupBy("key").agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(sk)) // 1-row sketch scalar (bigram-LM precedent)
          .filter(col("cnt") * k > col("n"))
          .select(col("key"), col("cnt"),
            element_at(col("mg"), col("key")).isNotNull.as("in_sketch"),
            (est <= col("cnt") && col("cnt") <= est + expr(s"n div $k"))
              .as("bound_ok"),
            (size(map_keys(col("mg"))) <= k - 1).as("size_ok"))
          .orderBy("key")
      },
      """WITH s AS (
        |  SELECT CASE WHEN user_id % 10 < 3
        |    THEN 'hot_' || CAST(user_id % 3 AS VARCHAR)
        |    ELSE 'cold_' || CAST(user_id AS VARCHAR) END AS key
        |  FROM events),
        |n AS (SELECT count(*) AS n FROM s),
        |h AS (SELECT key, count(*) AS cnt FROM s GROUP BY 1)
        |SELECT h.key, h.cnt, TRUE AS in_sketch, TRUE AS bound_ok,
        |  TRUE AS size_ok
        |FROM h, n WHERE h.cnt * 16 > n.n ORDER BY h.key""".stripMargin
    ),

    // ---- Count-Min sketch: exact estimate replication ------------------
    // The overestimating counterpart of agg_heavy_hitters. Because every
    // CMS cell is a commutative sum over portable hashes, the sketch
    // content is fully deterministic — so unlike MG the oracle replicates
    // every ESTIMATE exactly: est(x) = min_i Σ_{y: slot_i(y)=slot_i(x)}
    // true(y), computed relationally from exact counts and the shared
    // rolling-hash/permutation family. Probes = the 3 hot keys + the
    // cold_(10j+5) stripe, so both colliding and clean slots are pinned.
    "agg_countmin_est" -> QuerySpec(
      (s, dir) => {
        val (d, w) = (3, 64)
        val P = 1000000007L
        val stream = t(s, dir, "events").select(
          when(col("user_id") % 10 < 3,
            concat(lit("hot_"), (col("user_id") % 3).cast("string")))
            .otherwise(concat(lit("cold_"), col("user_id").cast("string")))
            .as("key"))
        val sk = stream.agg(graft.functions.Fns.countMin(col("key"), d, w)
          .as("cm"))
        val bh = graft.functions.Fns.rollingHash(col("key"))
        def slot(i: Int) =
          (lit(2L * i + 1) * bh + lit(i.toLong * i + i + 41)) % P % w
        stream.groupBy("key").agg(count(lit(1)).as("cnt"))
          // cold_(10j+5) stripe ⇔ trailing digit 5 — no cast, total on
          // every key shape in both engines
          .filter(col("key").startsWith("hot_") ||
            (col("key").startsWith("cold_") && col("key").endsWith("5")))
          .crossJoin(broadcast(sk)) // 1-row sketch scalar
          .select(col("key"), col("cnt"),
            least(
              element_at(col("cm"), (slot(0) + 1).cast("int")),
              element_at(col("cm"), (slot(1) + lit(w) + 1).cast("int")),
              element_at(col("cm"), (slot(2) + lit(2 * w) + 1).cast("int")))
              .as("est"))
          .orderBy("key")
      },
      """WITH s AS (
        |  SELECT CASE WHEN user_id % 10 < 3
        |    THEN 'hot_' || CAST(user_id % 3 AS VARCHAR)
        |    ELSE 'cold_' || CAST(user_id AS VARCHAR) END AS key
        |  FROM events),
        |h AS (SELECT key, count(*) AS cnt FROM s GROUP BY 1),
        |hh AS (SELECT key, cnt,
        |  CASE WHEN key = '' THEN 0 ELSE list_reduce(
        |    list_transform(string_split(key, ''),
        |      x -> CAST(ascii(x) AS BIGINT)),
        |    (a, b) -> (a*31 + b) % 1000000007) END AS bh
        |  FROM h),
        |sl AS (SELECT key, cnt,
        |  ((1*bh + 41) % 1000000007) % 64 AS s0,
        |  ((3*bh + 43) % 1000000007) % 64 AS s1,
        |  ((5*bh + 47) % 1000000007) % 64 AS s2
        |  FROM hh),
        |est AS (SELECT a.key, a.cnt, least(
        |    (SELECT sum(b.cnt) FROM sl b WHERE b.s0 = a.s0),
        |    (SELECT sum(b.cnt) FROM sl b WHERE b.s1 = a.s1),
        |    (SELECT sum(b.cnt) FROM sl b WHERE b.s2 = a.s2)) AS est
        |  FROM sl a)
        |SELECT key, cnt, CAST(est AS BIGINT) AS est FROM est
        |WHERE starts_with(key, 'hot_') OR (starts_with(key, 'cold_')
        |  AND ends_with(key, '5'))
        |ORDER BY key""".stripMargin
    ),

    // ---- HyperLogLog registers: exact content replication ---------------
    // The cardinality member of the sketch family (MG = heavy hitters,
    // CMS = point frequency). Register content is an elementwise MAX of
    // portable-hash ranks — commutative AND idempotent, so the vector is
    // deterministic under any partitioning/merge order and duplicate
    // arrivals, and the oracle replays every register from the distinct
    // key set alone. Empty buckets pin the range join (left join against
    // range(m)), not just the touched ones.
    "agg_hll_registers" -> QuerySpec(
      (s, dir) => {
        val stream = t(s, dir, "events").select(
          when(col("user_id") % 10 < 3,
            concat(lit("hot_"), (col("user_id") % 3).cast("string")))
            .otherwise(concat(lit("cold_"), col("user_id").cast("string")))
            .as("key"))
        stream.agg(graft.functions.Fns.hllRegisters(col("key"), 64).as("regs"))
          .select(posexplode(col("regs")).as(Seq("bucket", "register")))
          .orderBy("bucket")
      },
      """WITH s AS (
        |  SELECT CASE WHEN user_id % 10 < 3
        |    THEN 'hot_' || CAST(user_id % 3 AS VARCHAR)
        |    ELSE 'cold_' || CAST(user_id AS VARCHAR) END AS key
        |  FROM events),
        |k AS (SELECT DISTINCT key FROM s),
        |hh AS (SELECT key, CASE WHEN key = '' THEN 0 ELSE list_reduce(
        |    list_transform(string_split(key, ''),
        |      x -> CAST(ascii(x) AS BIGINT)),
        |    (a, b) -> (a*31 + b) % 1000000007) END AS bh
        |  FROM k),
        |r AS (SELECT bh % 64 AS bucket,
        |    CASE WHEN (3*bh + 43) % 1000000007 = 0 THEN 31
        |      ELSE bit_count((((3*bh + 43) % 1000000007)
        |        & (-((3*bh + 43) % 1000000007))) - 1) + 1 END AS rank
        |  FROM hh),
        |agg AS (SELECT bucket, max(rank) AS register FROM r GROUP BY 1)
        |SELECT CAST(b.bucket AS INTEGER) AS bucket,
        |  CAST(COALESCE(a.register, 0) AS INTEGER) AS register
        |FROM (SELECT unnest(range(0, 64)) AS bucket) b
        |LEFT JOIN agg a ON b.bucket = a.bucket
        |ORDER BY bucket""".stripMargin
    ),

    // ---- HLL estimate core: integer-exact harmonic denominator ----------
    // The estimator's deterministic parts — Σ 2^(30 − register) (the
    // harmonic-mean denominator before the alpha/float correction) and
    // the zero-register count (the linear-counting branch trigger) —
    // against the exact distinct count they approximate. The float
    // division itself is not hash-portable across engines and stays out
    // (the approx_distinct / Misra-Gries precedent).
    "agg_hll_estimate" -> QuerySpec(
      (s, dir) => {
        val stream = t(s, dir, "events").select(
          when(col("user_id") % 10 < 3,
            concat(lit("hot_"), (col("user_id") % 3).cast("string")))
            .otherwise(concat(lit("cold_"), col("user_id").cast("string")))
            .as("key"))
        val regs = stream
          .agg(graft.functions.Fns.hllRegisters(col("key"), 64).as("regs"),
            count_distinct(col("key")).as("n_exact"))
          .select(col("n_exact"), explode(col("regs")).as("register"))
        regs.groupBy("n_exact")
          .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 30 - register)"))
              .as("est_denom"),
            sum(when(col("register") === 0, 1).otherwise(0)).cast("int")
              .as("n_zero"))
          .select(col("n_exact"), col("est_denom"), col("n_zero"))
      },
      """WITH s AS (
        |  SELECT CASE WHEN user_id % 10 < 3
        |    THEN 'hot_' || CAST(user_id % 3 AS VARCHAR)
        |    ELSE 'cold_' || CAST(user_id AS VARCHAR) END AS key
        |  FROM events),
        |k AS (SELECT DISTINCT key FROM s),
        |hh AS (SELECT key, CASE WHEN key = '' THEN 0 ELSE list_reduce(
        |    list_transform(string_split(key, ''),
        |      x -> CAST(ascii(x) AS BIGINT)),
        |    (a, b) -> (a*31 + b) % 1000000007) END AS bh
        |  FROM k),
        |r AS (SELECT bh % 64 AS bucket,
        |    CASE WHEN (3*bh + 43) % 1000000007 = 0 THEN 31
        |      ELSE bit_count((((3*bh + 43) % 1000000007)
        |        & (-((3*bh + 43) % 1000000007))) - 1) + 1 END AS rank
        |  FROM hh),
        |agg AS (SELECT bucket, max(rank) AS register FROM r GROUP BY 1),
        |full_regs AS (
        |  SELECT COALESCE(a.register, 0) AS register
        |  FROM (SELECT unnest(range(0, 64)) AS bucket) b
        |  LEFT JOIN agg a ON b.bucket = a.bucket)
        |SELECT (SELECT count(DISTINCT key) FROM s) AS n_exact,
        |  CAST(sum(CAST(1 AS BIGINT) << (30 - register)) AS BIGINT)
        |    AS est_denom,
        |  CAST(sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS INTEGER)
        |    AS n_zero
        |FROM full_regs""".stripMargin
    ),

    // ---- exact percentiles without a global sort -----------------------
    // p50/p90/p99 of the value stream as EXACT order statistics: the
    // distributed ntile (bucket-histogram rank — no partition-less
    // window anywhere) splits the stream into 100 exact tiles; the
    // percentile boundary is each target tile's max. The oracle uses
    // SQL ntile directly, which Ranks.ntile matches tile-for-tile.
    "agg_exact_percentiles" -> QuerySpec(
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("event_id"), col("value"))
        Ranks.ntile(ev, 100, Seq("value", "event_id"), "tile")
          .filter(col("tile").isin(50, 90, 99))
          .groupBy("tile")
          .agg(max("value").as("boundary"), count(lit(1)).as("n_rows"))
          .orderBy("tile")
      },
      """WITH r AS (
        |  SELECT value, ntile(100) OVER (ORDER BY value, event_id) AS tile
        |  FROM events)
        |SELECT CAST(tile AS INTEGER) AS tile, max(value) AS boundary,
        |  count(*) AS n_rows
        |FROM r WHERE tile IN (50, 90, 99) GROUP BY 1 ORDER BY tile""".stripMargin
    ),

    // ---- mergeable EXACT percentiles (incremental order statistics) -----
    // The agg_rollup_merge proof extended to order statistics: daily
    // (day, cents, count) histogram states — the stored rollup — MERGE to
    // the full period by plain count addition, and exact p50/p90/p99
    // element picks over the merged histogram equal the direct
    // computation (the oracle computes DIRECTLY from raw rows, so the
    // hash match IS the losslessness proof). Rank arithmetic matches
    // ntile's tile boundaries (r_t = t·(n div 100) + min(t, n mod 100)).
    // Scale shape: the histogram is value-domain-bounded (cents), its cum
    // windows partition on a cents-range bucket, and cross-bucket offsets
    // come from a tiny bucket-total self-join — no partition-less window,
    // no global sort, and the raw corpus is touched once (to build the
    // daily states).
    "agg_percentile_merge" -> QuerySpec(
      (s, dir) => {
        val ev = t(s, dir, "events").select(
          (epochS(col("ts")) / 86400).cast("long").as("day"),
          (round(QuerySpec.dec4(col("value")), 2) * 100).cast("long").as("cents"))
        val daily = ev.groupBy("day", "cents").agg(count(lit(1)).as("cnt"))
        val merged = daily.groupBy("cents").agg(sum("cnt").as("cnt"))
          .withColumn("bucket", expr("cents div 1000"))
        val bucketTot = merged.groupBy("bucket").agg(sum("cnt").as("btot"))
        val offsets = bucketTot.select(col("bucket"))
          .join(bucketTot.select(col("bucket").as("b2"), col("btot")),
            col("b2") < col("bucket"), "left")
          .groupBy("bucket").agg(coalesce(sum("btot"), lit(0L)).as("off"))
        val wb = org.apache.spark.sql.expressions.Window
          .partitionBy("bucket").orderBy("cents")
        val cum = merged.join(broadcast(offsets), "bucket")
          .withColumn("cum", col("off") + sum("cnt").over(wb))
        val n = broadcast(ev.agg(count(lit(1)).as("n")))
        cum.crossJoin(n)
          .select(col("cents"), col("cnt"), col("cum"),
            explode(array(lit(50), lit(90), lit(99))).as("tile"), col("n"))
          .withColumn("r", expr("tile * (n div 100) + least(tile, n % 100)"))
          .filter(col("cum") >= col("r") && col("cum") - col("cnt") < col("r"))
          .select(col("tile"), col("cents").as("boundary_cents"))
          .orderBy("tile")
      },
      """WITH e AS (SELECT CAST(round(CAST(value AS DECIMAL(18,4)), 2) * 100
        |    AS BIGINT) AS cents FROM events),
        |nn AS (SELECT count(*) AS n FROM e),
        |h AS (SELECT cents, count(*) AS cnt FROM e GROUP BY 1),
        |c AS (SELECT cents, cnt, sum(cnt) OVER (ORDER BY cents) AS cum FROM h),
        |t(tile) AS (VALUES (50), (90), (99)),
        |r AS (SELECT tile, tile * (nn.n // 100) + least(tile, nn.n % 100) AS r
        |  FROM t, nn)
        |SELECT CAST(r.tile AS INTEGER) AS tile, c.cents AS boundary_cents
        |FROM r JOIN c ON c.cum >= r.r AND c.cum - c.cnt < r.r
        |ORDER BY tile""".stripMargin
    ),

    // ---- exact mode with deterministic ties --------------------------------
    // Most frequent order-value cents per event type; ties break to the
    // SMALLEST value via a single struct-max aggregation (max over
    // (cnt, -cents) — no window, no second shuffle beyond the count).
    "agg_exact_mode" -> QuerySpec(
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_type"),
            (round(QuerySpec.dec4(col("value")), 2) * 100).cast("long").as("cents"))
          .groupBy("event_type", "cents").agg(count(lit(1)).as("cnt"))
          .groupBy("event_type")
          .agg(max(struct(col("cnt"), (-col("cents")).as("neg"))).as("m"))
          .select(col("event_type"), col("m.cnt").as("mode_count"),
            (-col("m.neg")).as("mode_cents"))
          .orderBy("event_type"),
      """WITH h AS (SELECT event_type,
        |    CAST(round(CAST(value AS DECIMAL(18,4)), 2) * 100 AS BIGINT)
        |      AS cents,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY cnt DESC, cents) AS rn FROM h)
        |SELECT event_type, cnt AS mode_count, cents AS mode_cents
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin
    ),

    // ---- as-of join with tolerance ------------------------------------------
    // pandas merge_asof(tolerance=...) semantics: the carried right value
    // only counts when it is within `tol` of the left time — stale state
    // nulls out. Same single-shuffle union-and-carry as join_asof_prior.
    "join_asof_tolerance" -> QuerySpec(
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("t", epochS(col("ts")))
        val signups = ev.filter(col("event_type") === "signup")
          .withColumn("signup_t", col("t"))
        AsofJoin.priorJoin(ev, signups, "user_id", "t", "event_id", "signup_t")
          .select(col("event_id"),
            when(col("t") - col("asof_time") <= 86400L, col("asof_time"))
              .as("recent_signup_t"))
          .orderBy("event_id")
      },
      """WITH tagged AS (
        |  SELECT user_id, epoch_ms(ts)//1000 AS t, event_id, 1 AS side,
        |    CAST(NULL AS BIGINT) AS rt
        |  FROM events
        |  UNION ALL
        |  SELECT user_id, epoch_ms(ts)//1000, event_id, 0,
        |    epoch_ms(ts)//1000
        |  FROM events WHERE event_type = 'signup'),
        |carried AS (
        |  SELECT *, last_value(rt IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY t, side, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS at
        |  FROM tagged)
        |SELECT event_id,
        |  CASE WHEN t - at <= 86400 THEN at END AS recent_signup_t
        |FROM carried WHERE side = 1
        |ORDER BY event_id""".stripMargin
    ),

    // ---- session bounce rate ----------------------------------------------
    // One-event-session fraction per day (day of the session's first
    // event) over the standard 30-minute-gap sessionization — the bounce
    // metric next to x1/window_sessionize. Integer ppm.
    "a21_bounce_rate" -> QuerySpec(
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("user_id"),
          epochS(col("ts")).as("t"), col("event_id"))
        graft.operators.Sessionize.sessionize(ev, "user_id", "t",
            "event_id", gapSeconds = 1800L)
          .groupBy("user_id", "session_seq")
          .agg(count(lit(1)).as("n_events"), min("t").as("t0"))
          .select(expr("t0 div 86400").as("day"),
            when(col("n_events") === 1, 1L).otherwise(0L).as("bounce"))
          .groupBy("day")
          .agg(count(lit(1)).as("n_sessions"),
            expr("(sum(bounce) * 1000000) div count(1)").as("bounce_ppm"))
          .orderBy("day")
      },
      """WITH e AS (SELECT user_id, epoch_ms(ts)//1000 AS t, event_id
        |  FROM events),
        |x AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL
        |    OR t - lag(t) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |ss AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id
        |    ORDER BY t, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    CURRENT ROW) AS session_seq FROM x),
        |g AS (SELECT user_id, session_seq, count(*) AS n_events,
        |    min(t) AS t0 FROM ss GROUP BY 1, 2),
        |b AS (SELECT t0 // 86400 AS day,
        |    CASE WHEN n_events = 1 THEN 1 ELSE 0 END AS bounce FROM g)
        |SELECT day, count(*) AS n_sessions,
        |  CAST((sum(bounce) * 1000000) // count(*) AS BIGINT) AS bounce_ppm
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin
    ),

    // ---- abandonment rate ------------------------------------------------
    // The windowed funnel's complement: per day of funnel start, the
    // fraction of starters who did NOT complete within the 7-day
    // conversion window (left-anti against funnelCompletions — one
    // per-user table each side, integer ppm).
    "a22_abandonment" -> QuerySpec(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val starts = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(epochS(col("ts"))).as("t0"))
        val done = graft.operators.Funnels.funnelCompletions(ev, "user_id",
          "event_type", epochS(col("ts")),
          Seq("view", "click", "purchase"), windowSec = 604800L)
        starts
          .join(done.select(col("u").as("user_id")), Seq("user_id"), "left_anti")
          .select(expr("t0 div 86400").as("day"))
          .groupBy("day").agg(count(lit(1)).as("n_abandoned"))
          .join(starts.select(expr("t0 div 86400").as("day"))
            .groupBy("day").agg(count(lit(1)).as("n_started")), Seq("day"),
            "right")
          .select(col("day"), col("n_started"),
            coalesce(col("n_abandoned"), lit(0L)).as("n_abandoned"),
            expr("(coalesce(n_abandoned, 0L) * 1000000) div n_started")
              .as("abandon_ppm"))
          .orderBy("day")
      },
      """WITH e AS (SELECT user_id AS u, event_type AS et,
        |    epoch_ms(ts)//1000 AS t FROM events),
        |s0 AS (SELECT u, min(t) AS t0 FROM e WHERE et = 'view' GROUP BY 1),
        |s1 AS (SELECT e.u, s0.t0, min(e.t) AS t FROM e
        |  JOIN s0 ON e.u = s0.u AND e.t > s0.t0 AND e.t <= s0.t0 + 604800
        |  WHERE e.et = 'click' GROUP BY 1, 2),
        |s2 AS (SELECT e.u, s1.t0, min(e.t) AS t FROM e
        |  JOIN s1 ON e.u = s1.u AND e.t > s1.t AND e.t <= s1.t0 + 604800
        |  WHERE e.et = 'purchase' GROUP BY 1, 2),
        |st AS (SELECT u, t0 // 86400 AS day FROM s0),
        |ab AS (SELECT st.day, count(*) AS n_abandoned FROM st
        |  LEFT JOIN s2 ON s2.u = st.u WHERE s2.u IS NULL GROUP BY 1),
        |al AS (SELECT day, count(*) AS n_started FROM st GROUP BY 1)
        |SELECT al.day, al.n_started,
        |  coalesce(ab.n_abandoned, 0) AS n_abandoned,
        |  CAST((coalesce(ab.n_abandoned, 0) * 1000000) // al.n_started
        |    AS BIGINT) AS abandon_ppm
        |FROM al LEFT JOIN ab ON ab.day = al.day
        |ORDER BY al.day""".stripMargin
    ),

    // ---- RFM segmentation ----------------------------------------------
    // Recency/frequency/monetary user segments: the anchor 'now' is the
    // corpus max timestamp (a broadcast scalar, deterministic), recency
    // in whole days via integer div, monetary summed in DECIMAL end to
    // end (per-user AND per-segment) so no double ever accumulates.
    "a9_rfm_segments" -> QuerySpec(
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("user_id"),
          epochS(col("ts")).as("t"), col("value"))
        val ref = broadcast(ev.agg(max("t").as("t_ref")))
        ev.groupBy("user_id")
          .agg(max("t").as("t_last"), count(lit(1)).as("freq"),
            sum(QuerySpec.dec4(col("value"))).as("mon"))
          .crossJoin(ref)
          .withColumn("recency_d", expr("(t_ref - t_last) div 86400"))
          .withColumn("r_bucket",
            when(col("recency_d") < 1, "r0_recent")
              .when(col("recency_d") < 2, "r1_warm").otherwise("r2_cold"))
          .withColumn("f_bucket",
            when(col("freq") >= 75, "f0_heavy")
              .when(col("freq") >= 60, "f1_mid").otherwise("f2_light"))
          .groupBy("r_bucket", "f_bucket")
          .agg(count(lit(1)).as("n_users"),
            QuerySpec.money2(sum(col("mon"))).as("monetary"))
          .orderBy("r_bucket", "f_bucket")
      },
      """WITH e AS (SELECT user_id, epoch_ms(ts)//1000 AS t, value
        |  FROM events),
        |ref AS (SELECT max(t) AS t_ref FROM e),
        |p AS (SELECT user_id, max(t) AS t_last, count(*) AS freq,
        |    sum(CAST(value AS DECIMAL(18,4))) AS mon
        |  FROM e GROUP BY 1),
        |b AS (SELECT
        |    CASE WHEN (ref.t_ref - t_last)//86400 < 1 THEN 'r0_recent'
        |         WHEN (ref.t_ref - t_last)//86400 < 2 THEN 'r1_warm'
        |         ELSE 'r2_cold' END AS r_bucket,
        |    CASE WHEN freq >= 75 THEN 'f0_heavy'
        |         WHEN freq >= 60 THEN 'f1_mid'
        |         ELSE 'f2_light' END AS f_bucket,
        |    mon
        |  FROM p, ref)
        |SELECT r_bucket, f_bucket, count(*) AS n_users,
        |  CAST(round(sum(mon), 2) AS DOUBLE) AS monetary
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ),

    // ---- ordered funnel conversion -------------------------------------
    // view -> click -> purchase with first-qualifying semantics: step
    // i's time is the earliest step-i event STRICTLY AFTER the user's
    // step-(i-1) time. Per-step keyed joins on per-user rows; counts
    // assemble as broadcast scalars (no window, no cartesian).
    "a7_funnel_conversion" -> QuerySpec(
      (s, dir) =>
        graft.operators.Funnels.funnelCounts(t(s, dir, "events"),
            "user_id", "event_type", epochS(col("ts")),
            Seq("view", "click", "purchase"))
          .orderBy("step_idx"),
      """WITH e AS (SELECT user_id AS u, event_type AS et,
        |    epoch_ms(ts)//1000 AS t FROM events),
        |s0 AS (SELECT u, min(t) AS t FROM e WHERE et = 'view' GROUP BY 1),
        |s1 AS (SELECT e.u, min(e.t) AS t FROM e
        |  JOIN s0 ON e.u = s0.u AND e.t > s0.t
        |  WHERE e.et = 'click' GROUP BY 1),
        |s2 AS (SELECT e.u, min(e.t) AS t FROM e
        |  JOIN s1 ON e.u = s1.u AND e.t > s1.t
        |  WHERE e.et = 'purchase' GROUP BY 1),
        |c AS (SELECT (SELECT count(*) FROM s0) AS n0,
        |  (SELECT count(*) FROM s1) AS n1,
        |  (SELECT count(*) FROM s2) AS n2)
        |SELECT * FROM (
        |  SELECT 1 AS step_idx, 'view' AS step,
        |    CAST(n0 AS BIGINT) AS n_users,
        |    CAST((n0*1000000)//n0 AS BIGINT) AS conv_ppm FROM c
        |  UNION ALL SELECT 2, 'click', CAST(n1 AS BIGINT),
        |    CAST((n1*1000000)//n0 AS BIGINT) FROM c
        |  UNION ALL SELECT 3, 'purchase', CAST(n2 AS BIGINT),
        |    CAST((n2*1000000)//n0 AS BIGINT) FROM c)
        |ORDER BY step_idx""".stripMargin
    ),

    // ---- windowed funnel (conversion-window semantics) -------------------
    // The product-analytics default a7 deliberately omits: every later
    // step must land within 7 days of the user's FUNNEL START, so a
    // purchase eight days after the view does not convert. 150/144/126
    // at sf0.01 vs a7's 150/150/150 — the window is load-bearing.
    "a18_funnel_windowed" -> QuerySpec(
      (s, dir) =>
        graft.operators.Funnels.funnelCountsWindowed(t(s, dir, "events"),
            "user_id", "event_type", epochS(col("ts")),
            Seq("view", "click", "purchase"), windowSec = 604800L)
          .orderBy("step_idx"),
      """WITH e AS (SELECT user_id AS u, event_type AS et,
        |    epoch_ms(ts)//1000 AS t FROM events),
        |s0 AS (SELECT u, min(t) AS t0 FROM e WHERE et = 'view' GROUP BY 1),
        |s1 AS (SELECT e.u, s0.t0, min(e.t) AS t FROM e
        |  JOIN s0 ON e.u = s0.u AND e.t > s0.t0 AND e.t <= s0.t0 + 604800
        |  WHERE e.et = 'click' GROUP BY 1, 2),
        |s2 AS (SELECT e.u, s1.t0, min(e.t) AS t FROM e
        |  JOIN s1 ON e.u = s1.u AND e.t > s1.t AND e.t <= s1.t0 + 604800
        |  WHERE e.et = 'purchase' GROUP BY 1, 2),
        |c AS (SELECT (SELECT count(*) FROM s0) AS n0,
        |  (SELECT count(*) FROM s1) AS n1,
        |  (SELECT count(*) FROM s2) AS n2)
        |SELECT * FROM (
        |  SELECT 1 AS step_idx, 'view' AS step,
        |    CAST(n0 AS BIGINT) AS n_users,
        |    CAST((n0*1000000)//n0 AS BIGINT) AS conv_ppm FROM c
        |  UNION ALL SELECT 2, 'click', CAST(n1 AS BIGINT),
        |    CAST((n1*1000000)//n0 AS BIGINT) FROM c
        |  UNION ALL SELECT 3, 'purchase', CAST(n2 AS BIGINT),
        |    CAST((n2*1000000)//n0 AS BIGINT) FROM c)
        |ORDER BY step_idx""".stripMargin
    ),

    // ---- time-to-convert distribution ------------------------------------
    // Days from funnel start to completion for the windowed completers —
    // the "how fast do users convert" histogram next to the funnel. Bands
    // are integer day buckets of (t_last − t0); counts sum to the
    // windowed funnel's final step.
    "a19_time_to_convert" -> QuerySpec(
      (s, dir) =>
        graft.operators.Funnels.funnelCompletions(t(s, dir, "events"),
            "user_id", "event_type", epochS(col("ts")),
            Seq("view", "click", "purchase"), windowSec = 604800L)
          .select(expr("(t_last - t0) div 86400").as("days_to_convert"))
          .groupBy("days_to_convert")
          .agg(count(lit(1)).as("n_users"))
          .orderBy("days_to_convert"),
      """WITH e AS (SELECT user_id AS u, event_type AS et,
        |    epoch_ms(ts)//1000 AS t FROM events),
        |s0 AS (SELECT u, min(t) AS t0 FROM e WHERE et = 'view' GROUP BY 1),
        |s1 AS (SELECT e.u, s0.t0, min(e.t) AS t FROM e
        |  JOIN s0 ON e.u = s0.u AND e.t > s0.t0 AND e.t <= s0.t0 + 604800
        |  WHERE e.et = 'click' GROUP BY 1, 2),
        |s2 AS (SELECT e.u, s1.t0, min(e.t) AS t FROM e
        |  JOIN s1 ON e.u = s1.u AND e.t > s1.t AND e.t <= s1.t0 + 604800
        |  WHERE e.et = 'purchase' GROUP BY 1, 2)
        |SELECT (t - t0) // 86400 AS days_to_convert,
        |  count(*) AS n_users
        |FROM s2 GROUP BY 1 ORDER BY 1""".stripMargin
    ),

    // ---- engagement power curve ------------------------------------------
    // The L28-style frequency histogram: how many users were active on
    // exactly d distinct days. One distinct (user, day) contraction + two
    // keyed aggregations — linear at any scale.
    "a20_power_curve" -> QuerySpec(
      (s, dir) =>
        t(s, dir, "events")
          .select(col("user_id"),
            (epochS(col("ts")) / 86400).cast("long").as("day"))
          .distinct()
          .groupBy("user_id").agg(count(lit(1)).as("days_active"))
          .groupBy("days_active").agg(count(lit(1)).as("n_users"))
          .orderBy("days_active"),
      """WITH ud AS (SELECT DISTINCT user_id,
        |    (epoch_ms(ts)//1000)//86400 AS day FROM events),
        |da AS (SELECT user_id, count(*) AS days_active FROM ud GROUP BY 1)
        |SELECT days_active, count(*) AS n_users FROM da
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ),

    // ---- cohort retention matrix ---------------------------------------
    // Cohort = epoch-day of a user's first event; cell (cohort, offset)
    // counts users active offset days later. Two aggregations + one
    // keyed join at any scale.
    "a8_cohort_retention" -> QuerySpec(
      (s, dir) =>
        graft.operators.Funnels.cohortRetention(t(s, dir, "events"),
            "user_id", epochS(col("ts")), bucketSeconds = 86400L)
          .orderBy("cohort", "bucket_offset"),
      """WITH a AS (SELECT DISTINCT user_id AS u,
        |    (epoch_ms(ts)//1000)//86400 AS bucket FROM events),
        |c AS (SELECT u, min(bucket) AS cohort FROM a GROUP BY 1)
        |SELECT c.cohort, a.bucket - c.cohort AS bucket_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM a JOIN c ON a.u = c.u GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin
    ),

    // ---- as-of join: each event ↔ user's most recent prior signup ------
    "join_asof_prior" -> QuerySpec(
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("t", epochS(col("ts")))
        val signups = ev.filter(col("event_type") === "signup")
          .withColumn("signup_t", col("t"))
        AsofJoin.priorJoin(ev, signups, "user_id", "t", "event_id", "signup_t")
          .select(col("event_id"), col("asof_time").as("last_signup_t"))
          .orderBy("event_id")
      },
      """WITH tagged AS (
        |  SELECT user_id, epoch_ms(ts)//1000 AS t, event_id, 1 AS side,
        |    CAST(NULL AS BIGINT) AS rt
        |  FROM events
        |  UNION ALL
        |  SELECT user_id, epoch_ms(ts)//1000, event_id, 0,
        |    epoch_ms(ts)//1000
        |  FROM events WHERE event_type = 'signup'),
        |carried AS (
        |  SELECT *, last_value(rt IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY t, side, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_t
        |  FROM tagged)
        |SELECT event_id, last_signup_t FROM carried WHERE side = 1
        |ORDER BY event_id""".stripMargin
    ),

    // ---- forward as-of join: next signup at-or-after each event --------
    // The "next event" direction (next shipment after an order, next
    // deploy after a commit): union-and-carry run FORWARD — left sorts
    // before right at equal time, first(ignoreNulls) over the unbounded-
    // FOLLOWING frame. One shuffle on the key, like join_asof_prior.
    "join_asof_next" -> QuerySpec(
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("t", epochS(col("ts")))
        val signups = ev.filter(col("event_type") === "signup")
          .withColumn("signup_t", col("t"))
        AsofJoin.nextJoin(ev, signups, "user_id", "t", "event_id", "signup_t")
          .select(col("event_id"), col("asof_time").as("next_signup_t"))
          .orderBy("event_id")
      },
      """WITH tagged AS (
        |  SELECT user_id, epoch_ms(ts)//1000 AS t, event_id, 0 AS side,
        |    CAST(NULL AS BIGINT) AS rt
        |  FROM events
        |  UNION ALL
        |  SELECT user_id, epoch_ms(ts)//1000, event_id, 1,
        |    epoch_ms(ts)//1000
        |  FROM events WHERE event_type = 'signup'),
        |carried AS (
        |  SELECT *, first_value(rt IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY t, side, event_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_signup_t
        |  FROM tagged)
        |SELECT event_id, next_signup_t FROM carried WHERE side = 0
        |ORDER BY event_id""".stripMargin
    ),

    // ---- range join: lineitems shipped within 60 days of order date ----
    "join_range_window" -> QuerySpec(
      (s, dir) => {
        val ord = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        li.join(ord, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            QuerySpec.sumMoney(QuerySpec.dec4(col("l_extendedprice"))).as("total"))
          .orderBy("o_orderpriority")
      },
      """SELECT o_orderpriority, count(*) AS n,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))),2) AS DOUBLE) AS total
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate < o_orderdate + INTERVAL 60 DAY
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    ),

    // ---- full SQL-text query surface (Q10-like via spark.sql) ----------
    "sql_q10_returned_items" -> QuerySpec(
      (s, dir) => {
        Seq("customer", "orders", "lineitem", "nation").foreach(n =>
          t(s, dir, n).createOrReplaceTempView(s"${n}_v"))
        s.sql(
          """SELECT c_custkey, c_name, n_name,
            |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
            |FROM customer_v
            |JOIN orders_v ON c_custkey = o_custkey
            |JOIN lineitem_v ON l_orderkey = o_orderkey
            |JOIN nation_v ON c_nationkey = n_nationkey
            |WHERE l_returnflag = 'R'
            |  AND o_orderdate >= TIMESTAMP '1996-01-01'
            |  AND o_orderdate < TIMESTAMP '1996-07-01'
            |GROUP BY c_custkey, c_name, n_name
            |ORDER BY revenue DESC, c_custkey
            |LIMIT 20""".stripMargin)
      },
      """SELECT c_custkey, c_name, n_name,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin
    ),

    // ---- grouping sets (SQL surface) -----------------------------------
    "agg_grouping_sets" -> QuerySpec(
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("orders_v")
        s.sql(
          """SELECT o_orderstatus, o_orderpriority, count(*) AS n
            |FROM orders_v
            |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
            |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
      },
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin
    ),

    // ---- window: lag/lead (event-to-event deltas) ----------------------
    "window_lag_lead" -> QuerySpec(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        t(s, dir, "events")
          .withColumn("t", epochS(col("ts")))
          .withColumn("prev_gap_s", col("t") - lag(col("t"), 1).over(w))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .select("event_id", "user_id", "prev_gap_s", "next_type")
          .orderBy("event_id")
      },
      """SELECT event_id, user_id,
        | epoch_ms(ts)//1000 - lag(epoch_ms(ts)//1000) OVER w AS prev_gap_s,
        | lead(event_type) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin
    ),

    // ---- window: rank / dense_rank / ntile -----------------------------
    "window_rank_family" -> QuerySpec(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderpriority").orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rnk", rank().over(w))
          .withColumn("drnk", dense_rank().over(w))
          .withColumn("quartile", ntile(4).over(w))
          .filter(col("rnk") <= 5)
          .select("o_orderpriority", "rnk", "drnk", "quartile", "o_orderkey")
          .orderBy("o_orderpriority", "rnk")
      },
      """SELECT o_orderpriority, rnk, drnk, quartile, o_orderkey FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |    rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |    CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice DESC, o_orderkey))
        |WHERE rnk <= 5 ORDER BY o_orderpriority, rnk""".stripMargin
    ),

    // ---- ordered array collection --------------------------------------
    "agg_array_collect" -> QuerySpec(
      (s, dir) =>
        t(s, dir, "events")
          .filter(col("user_id") < 20)
          .withColumn("t", epochS(col("ts")))
          .groupBy("user_id")
          .agg(concat_ws(">", array_sort(collect_list(
            concat_ws("@", col("t"), col("event_type"))))).as("timeline"))
          .orderBy("user_id"),
      """SELECT user_id,
        | array_to_string(list_sort(list(epoch_ms(ts)//1000 || '@' || event_type)), '>') AS timeline
        |FROM events WHERE user_id < 20
        |GROUP BY user_id ORDER BY user_id""".stripMargin
    ),

    // ---- statistical aggregates ---------------------------------------
    "agg_statistics" -> QuerySpec(
      (s, dir) => {
        val cust = t(s, dir, "customer")
        t(s, dir, "orders")
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(
            round(stddev_samp("o_totalprice"), 2).as("sd_price"),
            round(corr(col("o_totalprice"), col("c_acctbal")), 4).as("price_acct_corr"),
            // discrete (not continuous) median: both engines pick the same
            // actual data value; continuous interpolation arithmetic
            // differs in the last ulp between engines
            round(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)"), 2)
              .as("median_price"),
            round(sum(QuerySpec.dec4(col("o_totalprice"))).cast("double") /
              count(lit(1)), 2).as("avg_price"))
          .orderBy("c_mktsegment")
      },
      """SELECT c_mktsegment,
        | round(stddev_samp(o_totalprice),2) AS sd_price,
        | round(corr(o_totalprice, c_acctbal),4) AS price_acct_corr,
        | round(quantile_disc(o_totalprice, 0.5),2) AS median_price,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)/count(*),2) AS avg_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
    ),

    // ---- bloom-prefiltered exact join ----------------------------------
    // The bloom prunes big-side rows before the join exchange; the exact
    // join removes false positives, so the oracle is the PLAIN join — the
    // bloom must be semantically invisible.
    "join_bloom_prefilter" -> QuerySpec(
      (s, dir) => {
        val small = t(s, dir, "part").filter(col("p_size") <= 5)
        BloomPrefilterJoin.join(
          t(s, dir, "lineitem"), small, "l_partkey", "p_partkey")
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_items"),
            round(sum("l_quantity"), 2).as("sum_qty"))
          .orderBy("p_brand")
      },
      """SELECT p_brand, count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 5
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin
    ),

    // ---- z-order layout: per-curve-bucket dimension spans --------------
    // Rank-normalize two dimensions to 8-bit space via the DISTRIBUTED
    // exact ntile (Ranks.ntile: bucket-histogram rank — no partition-less
    // window anywhere; the ntile semantics are reproduced exactly from
    // (rank, n), so the DuckDB ntile oracle hash is unchanged), take the
    // Morton z-value, and report min/max spans of BOTH dims per z-bucket:
    // narrow spans on both = the data-skipping win. The write-path
    // operator (ZOrder.cluster) range-partitions on the same z-value.
    // Bucketers: approxQuantile cutpoints computed ONCE on the cheap base
    // scan for both input dims (exactness never depends on cutpoint
    // quality — only load balance does); the z pass needs no quantile
    // pass at all, its domain is bounded at 2^16 so `zval >> 8` is 256
    // uniform monotone buckets for free.
    "opt_zorder_cluster" -> QuerySpec(
      (s, dir) => {
        val base = t(s, dir, "part").select("p_partkey", "p_size")
        val Seq(bx, by) = Ranks.quantileBuckets(base, Seq("p_partkey", "p_size"))
        val withY = Ranks.ntiles(base, Seq(
          Ranks.NtileSpec(256, Seq("p_partkey"), "tx", Some(bx)),
          Ranks.NtileSpec(256, Seq("p_size", "p_partkey"), "ty", Some(by))))
        val ranked = withY
          .withColumn("nx", col("tx") - 1).withColumn("ny", col("ty") - 1)
          .withColumn("zval", ZOrder.zValue2(col("nx"), col("ny"), 8))
        Ranks.ntile(ranked, 32, Seq("zval", "p_partkey"), "bucket",
            bucketOf = Some(shiftright(col("zval"), 8)))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_rows"),
            min("nx").as("min_x"), max("nx").as("max_x"),
            min("ny").as("min_y"), max("ny").as("max_y"))
          .orderBy("bucket")
      }, {
        val z = (0 until 8).map(i =>
          s"((nx >> $i) & 1)*${1L << (2 * i)} + ((ny >> $i) & 1)*${1L << (2 * i + 1)}")
          .mkString(" + ")
        s"""WITH r AS (
           |  SELECT p_partkey,
           |    ntile(256) OVER (ORDER BY p_partkey) - 1 AS nx,
           |    ntile(256) OVER (ORDER BY p_size, p_partkey) - 1 AS ny
           |  FROM part),
           |z AS (SELECT p_partkey, nx, ny, CAST($z AS BIGINT) AS zval FROM r),
           |b AS (SELECT *, ntile(32) OVER (ORDER BY zval, p_partkey) AS bucket
           |  FROM z)
           |SELECT bucket, count(*) AS n_rows,
           |  min(nx) AS min_x, max(nx) AS max_x,
           |  min(ny) AS min_y, max(ny) AS max_y
           |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
      }
    ),

    // ---- point-in-time (feature-store) join ----------------------------
    // The leakage-free training-data join: each purchase fact picks up
    // the user's channel state (SCD-2 versions run-length-folded from the
    // NON-purchase stream) as of purchase time — never a later version.
    // AsofJoin.priorJoin's union-and-carry does it in one key shuffle
    // (no inequality-join explosion); the report groups purchases by
    // their as-of state with total state staleness in seconds.
    "join_point_in_time" -> QuerySpec(
      (s, dir) => {
        import graft.operators.TimeSeries
        val ev = t(s, dir, "events")
          .select(col("user_id"), epochS(col("ts")).as("t"),
            col("event_id"), col("event_type"))
        val versions = TimeSeries.runLengthVersions(
            ev.filter(col("event_type") =!= "purchase"),
            "user_id", "t", "event_id", "event_type")
          .select(col("key").as("user_id"), col("t"),
            col("tie").as("event_id"), col("state"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("user_id", "t", "event_id")
        AsofJoin.priorJoin(purchases, versions,
            "user_id", "t", "event_id", "state")
          .groupBy(coalesce(col("asof_state"), lit("(none)")).as("prior_state"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(col("t") - col("asof_time")).as("staleness_sum"))
          .orderBy("prior_state")
      },
      """WITH e AS (SELECT user_id, epoch_ms(ts)//1000 AS t, event_id, event_type
        |  FROM events),
        |np AS (SELECT * FROM e WHERE event_type <> 'purchase'),
        |v AS (SELECT user_id, t, event_id, event_type FROM (
        |    SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id) AS prev
        |    FROM np) WHERE prev IS NULL OR event_type <> prev),
        |p AS (SELECT user_id, t, event_id FROM e WHERE event_type = 'purchase'),
        |u AS (SELECT user_id, t, 0 AS side, event_id AS tie, event_type AS rv, t AS rt FROM v
        |  UNION ALL SELECT user_id, t, 1, event_id, NULL, NULL FROM p),
        |c AS (SELECT user_id, t, side,
        |    last_value(rv IGNORE NULLS) OVER w AS st,
        |    last_value(rt IGNORE NULLS) OVER w AS vt
        |  FROM u WINDOW w AS (PARTITION BY user_id ORDER BY t, side, tie
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT COALESCE(st, '(none)') AS prior_state,
        |  count(*) AS n_purchases,
        |  CAST(sum(t - vt) AS BIGINT) AS staleness_sum
        |FROM c WHERE side = 1
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ),

    // ---- partial-aggregate merge (reaggregability) ---------------------
    // The incremental-rollup contract a warehouse lives on: day-grain
    // partial states (count / decimal sum / min / max) MERGE to month
    // grain — count-of-counts, sum-of-sums, min-of-mins, max-of-maxs —
    // and the oracle aggregates the months DIRECTLY from rows. A hash
    // match proves the two-level merge is lossless, which is what makes
    // map-side partial aggregation and stored daily rollups safe at
    // 100 TB (never re-scan history to build a month).
    "agg_rollup_merge" -> QuerySpec(
      (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(
            (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).as("ym"),
            floor(epochS(col("o_orderdate")) / 86400).cast("long").as("day"))
          .agg(count(lit(1)).as("cnt"),
            sum(QuerySpec.dec4(col("o_totalprice"))).as("sum_dec"),
            min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
        daily.groupBy("ym")
          .agg(sum("cnt").as("n_orders"),
            QuerySpec.money2(sum(col("sum_dec"))).as("total_price"),
            min("mn").as("min_price"), max("mx").as("max_price"))
          .orderBy("ym")
      },
      """SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS INTEGER) AS ym,
        |  count(*) AS n_orders,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM orders GROUP BY 1 ORDER BY ym""".stripMargin
    ),

    // ---- zone-map pruning: sorted vs arrival layout ---------------------
    // Quantifies WHY the sorted/z-ordered write path matters: per-file
    // (bin) min/max zone maps for l_shipdate under (a) arrival order
    // (orderkey-range files) and (b) shipdate-sorted files (exact
    // distributed ntile — no partition-less window), then the number of
    // files a quarter-range predicate must actually read under each. The
    // sorted layout reads ~1/12 of its files; arrival order reads nearly
    // all — the data-skipping argument, measured.
    "opt_zonemap_prune" -> QuerySpec(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_shipdate"), epochS(col("l_shipdate")).as("ship_t"))
        val lo = lit(852076800L)  // 1997-01-01
        val hi = lit(859852800L)  // 1997-04-01
        def zoneStats(binned: org.apache.spark.sql.DataFrame, layout: String) =
          binned.groupBy("bin")
            .agg(min("ship_t").as("mn"), max("ship_t").as("mx"))
            .agg(count(lit(1)).as("n_files"),
              sum(when(col("mx") >= lo && col("mn") < hi, 1L).otherwise(0L))
                .as("n_read"))
            .select(lit(layout).as("layout"), col("n_files"), col("n_read"))
        val arrival = zoneStats(
          li.withColumn("bin", expr("l_orderkey div 256")), "arrival")
        val sorted = zoneStats(
          Ranks.ntile(li, 64, Seq("ship_t", "l_orderkey", "l_linenumber"), "bin"),
          "sorted")
        arrival.unionByName(sorted).orderBy("layout")
      },
      """WITH t AS (SELECT l_orderkey, l_linenumber,
        |    epoch_ms(l_shipdate)//1000 AS ship_t FROM lineitem),
        |a AS (SELECT l_orderkey // 256 AS bin, ship_t FROM t),
        |az AS (SELECT bin, min(ship_t) AS mn, max(ship_t) AS mx FROM a GROUP BY 1),
        |s AS (SELECT ntile(64) OVER (ORDER BY ship_t, l_orderkey, l_linenumber) AS bin,
        |    ship_t FROM t),
        |sz AS (SELECT bin, min(ship_t) AS mn, max(ship_t) AS mx FROM s GROUP BY 1)
        |SELECT 'arrival' AS layout, count(*) AS n_files,
        |  CAST(sum(CASE WHEN mx >= 852076800 AND mn < 859852800 THEN 1 ELSE 0 END) AS BIGINT) AS n_read
        |FROM az
        |UNION ALL
        |SELECT 'sorted', count(*),
        |  CAST(sum(CASE WHEN mx >= 852076800 AND mn < 859852800 THEN 1 ELSE 0 END) AS BIGINT)
        |FROM sz
        |ORDER BY layout""".stripMargin
    )
  )
}
