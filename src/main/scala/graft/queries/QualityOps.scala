package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables.{t, epochS}
import graft.operators.{Ann, DataQuality, LinkGraph, TextAnalysis, TimeSeries}

/** Dataset-health, time-series, and graph-analytics operators: exact
  * column profiling, robust (median/MAD) outlier detection, LOCF
  * gap-fill resampling, SCD-2 run-length version history, PMI
  * collocations, degree-ordered triangle counting, and cosine range
  * search — the audit/reshape tier a curation pipeline runs around its
  * transforms.
  *
  * House contracts: exact order statistics (no interpolation — every
  * median/MAD is an element pick, partitioning-invariant), key-
  * partitioned windows only, integer-rational scores (no float log),
  * decimal money sums, broadcast scalars for corpus-level constants.
  */
object QualityOps {

  val specs: Map[String, QuerySpec] = Map(

    // ---- exact one-pass column profile ---------------------------------
    // Null counts, EXACT distinct counts, numeric/temporal min-max for
    // every lineitem column from one scan + one aggregate (the
    // count-distinct expand is map-side partial-aggregated). The oracle
    // recomputes per column with UNION ALL — same rows.
    "dq_profile" -> QuerySpec(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        DataQuality.profile(li, li.columns.toSeq).orderBy("col_name")
      },
      {
        val num = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val numSel = num.map(c =>
          s"""SELECT '$c' AS col_name, count(*) - count($c) AS n_nulls,
             |  count(DISTINCT $c) AS n_distinct,
             |  CAST(min($c) AS DOUBLE) AS min_val,
             |  CAST(max($c) AS DOUBLE) AS max_val FROM lineitem""".stripMargin)
        val strSel = Seq("l_returnflag", "l_linestatus").map(c =>
          s"""SELECT '$c', count(*) - count($c), count(DISTINCT $c),
             |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM lineitem""".stripMargin)
        val tsSel = Seq(
          s"""SELECT 'l_shipdate', count(*) - count(l_shipdate),
             |  count(DISTINCT l_shipdate),
             |  CAST(min(epoch_ms(l_shipdate)//1000) AS DOUBLE),
             |  CAST(max(epoch_ms(l_shipdate)//1000) AS DOUBLE) FROM lineitem""".stripMargin)
        (numSel ++ strSel ++ tsSel).mkString("", " UNION ALL ", " ORDER BY col_name")
      }
    ),

    // ---- robust outliers: exact median + MAD per event type ------------
    // Lower medians as deterministic element picks (rank ⌈n/2⌉); the
    // outlier gate |v − med| > 3·MAD compares doubles both engines
    // compute from identical inputs with identical IEEE ops.
    "dq_mad_outliers" -> QuerySpec(
      (s, dir) => {
        val ev = t(s, dir, "events")
        DataQuality.madOutliers(ev, "event_type", "value", "event_id", k = 3.0)
          .withColumnRenamed("g", "event_type")
          .orderBy("event_type")
      },
      """WITH e AS (SELECT event_type, value, event_id FROM events),
        |rk AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM e),
        |med AS (SELECT event_type, value AS med FROM rk WHERE rn = (n+1)//2),
        |dv AS (SELECT e.event_type, e.value, e.event_id, m.med,
        |    abs(e.value - m.med) AS dev
        |  FROM e JOIN med m ON e.event_type = m.event_type),
        |rk2 AS (SELECT event_type, dev,
        |    row_number() OVER (PARTITION BY event_type ORDER BY dev, value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM dv),
        |mad AS (SELECT event_type, dev AS mad FROM rk2 WHERE rn = (n+1)//2)
        |SELECT d.event_type, d.med, m.mad, count(*) AS n_rows,
        |  count(*) FILTER (d.dev > 3*m.mad) AS n_outliers
        |FROM dv d JOIN mad m ON d.event_type = m.event_type
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin
    ),

    // ---- LOCF gap-fill resample (hourly) -------------------------------
    // Per-user hourly grid over the user's own [min, max] span; gaps
    // carry the last observation forward. The compared surface is the
    // per-user fill accounting (bucket/observed/imputed counts + the
    // decimal-exact sum of imputed values), which pins every filled cell.
    "ts_gap_fill" -> QuerySpec(
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), epochS(col("ts")).as("t"),
            col("event_id"), col("value"))
        TimeSeries.gapFillLocf(ev, "user_id", "t", "event_id", "value", 3600L)
          .groupBy(col("key").as("user_id"))
          .agg(count(lit(1)).as("n_buckets"),
            count(col("value")).as("n_observed"),
            (count(lit(1)) - count(col("value"))).as("n_imputed"),
            QuerySpec.money2(sum(when(col("value").isNull,
              QuerySpec.dec4(col("filled")))
              .otherwise(lit(0).cast("decimal(18,4)")))).as("imputed_sum"))
          .orderBy("user_id")
      },
      """WITH e AS (SELECT user_id, epoch_ms(ts)//1000 AS t, event_id, value FROM events),
        |b AS (SELECT user_id, t//3600 AS bkt, t, event_id, value FROM e),
        |obs AS (SELECT user_id, bkt, value FROM (
        |  SELECT user_id, bkt, value,
        |    row_number() OVER (PARTITION BY user_id, bkt ORDER BY t DESC, event_id DESC) AS rn
        |  FROM b) WHERE rn = 1),
        |rng AS (SELECT user_id, min(bkt) AS lo, max(bkt) AS hi FROM obs GROUP BY 1),
        |grid AS (SELECT user_id, unnest(range(lo, hi+1)) AS bkt FROM rng),
        |j AS (SELECT g.user_id, g.bkt, o.value,
        |    last_value(o.value IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.bkt
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |  FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.bkt = o.bkt)
        |SELECT user_id, count(*) AS n_buckets, count(value) AS n_observed,
        |  count(*) - count(value) AS n_imputed,
        |  CAST(round(sum(CASE WHEN value IS NULL THEN CAST(filled AS DECIMAL(18,4))
        |    ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS imputed_sum
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
    ),

    // ---- SCD-2 run-length version history ------------------------------
    // Event-type change points per user (run-length collapse in (t,
    // event_id) order) aggregated to the dimension-history summary: how
    // many versions, when the first opened, when the last opened, and
    // the current state (max_by on the same scalar order key in both
    // engines — t·10⁸ + event_id, overflow-free for epoch seconds).
    "scd2_user_versions" -> QuerySpec(
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), epochS(col("ts")).as("t"),
            col("event_id"), col("event_type"))
        TimeSeries.runLengthVersions(ev, "user_id", "t", "event_id", "event_type")
          .groupBy(col("key").as("user_id"))
          .agg(count(lit(1)).as("n_versions"),
            min(col("t")).as("first_t"),
            max(col("t")).as("last_change_t"),
            max_by(col("state"), col("t") * lit(100000000L) + col("tie"))
              .as("current_state"))
          .orderBy("user_id")
      },
      """WITH e AS (SELECT user_id, epoch_ms(ts)//1000 AS t, event_id, event_type FROM events),
        |lg AS (SELECT user_id, t, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id) AS prev FROM e),
        |chg AS (SELECT * FROM lg WHERE prev IS NULL OR event_type <> prev)
        |SELECT user_id, count(*) AS n_versions, min(t) AS first_t,
        |  max(t) AS last_change_t,
        |  max_by(event_type, t*100000000 + event_id) AS current_state
        |FROM chg GROUP BY 1 ORDER BY 1""".stripMargin
    ),

    // ---- PMI collocations ----------------------------------------------
    // Integer-rational bigram lift over the documents corpus, bounded
    // top-20 with a ≥5-count sparsity gate.
    "tx_pmi_bigrams" -> QuerySpec(
      (s, dir) =>
        TextAnalysis.pmiCollocations(t(s, dir, "documents"), "doc_id", "text",
          minCount = 5, k = 20),
      """WITH lst AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS l FROM documents),
        |toks AS (SELECT doc_id, unnest(range(1, len(l)+1)) AS pos, unnest(l) AS w FROM lst),
        |tk AS (SELECT * FROM toks WHERE w <> ''),
        |uni AS (SELECT w, count(*) AS c FROM tk GROUP BY 1),
        |tot AS (SELECT count(*) AS n FROM tk),
        |bg AS (SELECT w AS w1, lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2 FROM tk),
        |bgc AS (SELECT w1, w2, count(*) AS c_xy FROM bg WHERE w2 IS NOT NULL GROUP BY 1, 2),
        |sc AS (SELECT w1, w2, c_xy, (c_xy * tot.n * 1000000) // (u1.c * u2.c) AS lift_ppm
        |  FROM bgc JOIN uni u1 ON w1 = u1.w JOIN uni u2 ON w2 = u2.w, tot
        |  WHERE c_xy >= 5)
        |SELECT w1, w2, c_xy, lift_ppm FROM sc
        |ORDER BY lift_ppm DESC, w1, w2 LIMIT 20""".stripMargin
    ),

    // ---- degree-ordered triangle count ---------------------------------
    // Parts co-ordered in the same order (≥30-quantity lines) form the
    // co-occurrence graph; the engine counts triangles with the oriented
    // wedge join (out-lists bounded O(√m)); the oracle uses the naive
    // three-way edge join — same exact count, different plan.
    "graph_triangle_count" -> QuerySpec(
      (s, dir) => {
        val pr = t(s, dir, "lineitem")
          .filter(col("l_quantity") >= 30)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        val edges = pr.join(pr.select(col("o"), col("p").as("p2")), "o")
          .filter(col("p") < col("p2"))
          .select(col("p").as("src"), col("p2").as("dst"))
        LinkGraph.triangleCount(edges, "src", "dst")
      },
      """WITH pr AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem WHERE l_quantity >= 30),
        |e AS (SELECT DISTINCT a.p AS a, b.p AS b
        |  FROM pr a JOIN pr b ON a.o = b.o AND a.p < b.p),
        |v AS (SELECT count(DISTINCT x) AS nv FROM
        |  (SELECT a AS x FROM e UNION SELECT b AS x FROM e)),
        |ne AS (SELECT count(*) AS ne FROM e),
        |tri AS (SELECT count(*) AS nt FROM e e1
        |  JOIN e e2 ON e2.a = e1.b
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT v.nv AS n_vertices, ne.ne AS n_edges, tri.nt AS n_triangles
        |FROM v, ne, tri""".stripMargin
    ),

    // ---- referential-integrity / key-uniqueness audit ------------------
    // Every FK edge of the star schema as a LEFT ANTI orphan count plus
    // the two primary-key uniqueness checks — the constraint audit a
    // lakehouse ingest runs (parquet enforces none of them). All-zero
    // violations on healthy data IS the assertion.
    "dq_fk_orphans" -> QuerySpec(
      (s, dir) => {
        import graft.operators.DataQuality.{dupKeyCount, orphanCount}
        val li = t(s, dir, "lineitem")
        val ord = t(s, dir, "orders")
        val cust = t(s, dir, "customer")
        def chk(name: String, df: org.apache.spark.sql.DataFrame) =
          df.select(lit(name).as("check_name"), col("n_rows"), col("n_violations"))
        Seq(
          chk("fk_customer_nation", orphanCount(cust, Seq("c_nationkey"),
            t(s, dir, "nation"), Seq("n_nationkey"))),
          chk("fk_lineitem_orders", orphanCount(li, Seq("l_orderkey"),
            ord, Seq("o_orderkey"))),
          chk("fk_lineitem_part", orphanCount(li, Seq("l_partkey"),
            t(s, dir, "part"), Seq("p_partkey"))),
          chk("fk_lineitem_supplier", orphanCount(li, Seq("l_suppkey"),
            t(s, dir, "supplier"), Seq("s_suppkey"))),
          chk("fk_orders_customer", orphanCount(ord, Seq("o_custkey"),
            cust, Seq("c_custkey"))),
          chk("pk_lineitem", dupKeyCount(li, Seq("l_orderkey", "l_linenumber"))),
          chk("pk_orders", dupKeyCount(ord, Seq("o_orderkey"))))
          .reduce(_ unionByName _)
          .orderBy("check_name")
      },
      """SELECT 'fk_customer_nation' AS check_name,
        |  (SELECT count(*) FROM customer) AS n_rows,
        |  (SELECT count(*) FROM customer c WHERE NOT EXISTS
        |    (SELECT 1 FROM nation n WHERE c.c_nationkey = n.n_nationkey)) AS n_violations
        |UNION ALL SELECT 'fk_lineitem_orders', (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE l.l_orderkey = o.o_orderkey))
        |UNION ALL SELECT 'fk_lineitem_part', (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM part p WHERE l.l_partkey = p.p_partkey))
        |UNION ALL SELECT 'fk_lineitem_supplier', (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM supplier s WHERE l.l_suppkey = s.s_suppkey))
        |UNION ALL SELECT 'fk_orders_customer', (SELECT count(*) FROM orders),
        |  (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE o.o_custkey = c.c_custkey))
        |UNION ALL SELECT 'pk_lineitem', (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) - count(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem)
        |UNION ALL SELECT 'pk_orders', (SELECT count(*) FROM orders),
        |  (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
        |ORDER BY check_name""".stripMargin
    ),

    // ---- trailing 7-day moving average ---------------------------------
    // Daily per-user decimal sums, then a RANGE frame over the integer
    // day key ([day−6, day] — gap-aware, unlike a ROWS frame) divided by
    // the fixed window width. Key-partitioned window; decimal sums cast
    // to double only for the final division.
    "ts_moving_avg" -> QuerySpec(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = t(s, dir, "events")
          .select(col("user_id"), (epochS(col("ts")) / 86400).cast("long").as("day"),
            col("value"))
          .groupBy("user_id", "day")
          .agg(sum(QuerySpec.dec4(col("value"))).as("dsum"))
        val w = Window.partitionBy("user_id").orderBy("day").rangeBetween(-6, 0)
        daily.select(col("user_id"), col("day"),
            count(lit(1)).over(w).as("n_active_7d"),
            round(sum(col("dsum")).over(w).cast("double") / 7, 4).as("ma7"))
          .orderBy("user_id", "day")
      },
      """WITH daily AS (
        |  SELECT user_id, (epoch_ms(ts)//1000)//86400 AS day,
        |    sum(CAST(value AS DECIMAL(18,4))) AS dsum
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, day,
        |  count(*) OVER w AS n_active_7d,
        |  round(CAST(sum(dsum) OVER w AS DOUBLE) / 7, 4) AS ma7
        |FROM daily
        |WINDOW w AS (PARTITION BY user_id ORDER BY day
        |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, day""".stripMargin
    ),

    // ---- day-over-day change ---------------------------------------------
    // The dashboard delta: daily revenue in exact cents with the
    // day-over-day change in integer ppm of the PRIOR day (one
    // key-partitioned... no key needed — partition by a constant would be
    // banned; the daily table is calendar-bounded, so the lag window
    // partitions on the month, keeping every partition ≤ 31 rows).
    "ts_dod_change" -> QuerySpec(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = t(s, dir, "events")
          .select((epochS(col("ts")) / 86400).cast("long").as("day"),
            col("value"))
          .groupBy("day")
          .agg((round(sum(QuerySpec.dec4(col("value"))), 2) * 100)
            .cast("long").as("cents"))
          .withColumn("month", expr("day div 31"))
        val w = Window.partitionBy("month").orderBy("day")
        // month-boundary lag needs the previous POPULATED month's last day
        // (not month−1: a wholly-empty 31-day bucket must not break the
        // carry — DuckDB's global lag still returns the prior populated
        // day). The helper is 1 row per populated month (calendar-bounded,
        // ≤ n_days/31 rows), so the transitive lookup is a broadcast
        // non-equi self-join at month grain, never touching the fact table.
        val monthLast = daily.groupBy("month")
          .agg(max("day").as("lday"))
          .join(daily.select(col("day").as("lday"), col("cents").as("lcents")),
            "lday")
          .select(col("month").as("pm"), col("lcents"))
        val carry = daily.select("month").distinct()
          .join(broadcast(monthLast), col("pm") < col("month"))
          .groupBy("month").agg(max_by(col("lcents"), col("pm")).as("lcents"))
        daily
          .withColumn("prev_in", lag("cents", 1).over(w))
          .join(broadcast(carry), Seq("month"), "left")
          .withColumn("prev", coalesce(col("prev_in"), col("lcents")))
          .select(col("day"), col("cents"),
            // DuckDB's integer `//` truncates toward zero exactly like
            // Spark's `div` (verified on the negative deltas here), so
            // the plain quotient is parity-safe
            when(col("prev").isNotNull,
              expr("((cents - prev) * 1000000) div prev")).as("dod_ppm"))
          .orderBy("day")
      },
      """WITH daily AS (SELECT (epoch_ms(ts)//1000)//86400 AS day,
        |    CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) * 100 AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1),
        |l AS (SELECT day, cents, lag(cents) OVER (ORDER BY day) AS prev
        |  FROM daily)
        |SELECT day, cents,
        |  CASE WHEN prev IS NOT NULL
        |    THEN CAST(((cents - prev) * 1000000) // prev AS BIGINT) END
        |    AS dod_ppm
        |FROM l ORDER BY day""".stripMargin
    ),

    // ---- duplicate composite keys -----------------------------------------
    // The #1 practical integrity check: multiplicity of the
    // (orderkey, partkey) pair in lineitem — the same part CAN legally
    // repeat within an order (different suppliers/lines), and this audit
    // reports how often. One keyed count + one histogram aggregation.
    "dq_duplicate_keys" -> QuerySpec(
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_orderkey", "l_partkey").agg(count(lit(1)).as("m"))
          .groupBy("m").agg(count(lit(1)).as("n_keys"))
          .orderBy("m"),
      """WITH k AS (SELECT l_orderkey, l_partkey, count(*) AS m
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT m, count(*) AS n_keys FROM k GROUP BY 1 ORDER BY m""".stripMargin
    ),

    // ---- column value entropy ------------------------------------------------
    // Info-theoretic column profiling: Shannon entropy (bits) of each
    // categorical/bucketed lineitem column — near-zero entropy flags
    // constant/degenerate columns, log₂(n_distinct) is the uniform
    // ceiling. Terms follow the round-6 DECIMAL determinism contract
    // (mm_byte_entropy's). One scan, one union of keyed aggregations.
    "dq_value_entropy" -> QuerySpec(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        def ent(c: String, e: org.apache.spark.sql.Column) = {
          val h = li.select(e.as("v")).groupBy("v").agg(count(lit(1)).as("n"))
          val tot = broadcast(h.agg(sum("n").as("tot"),
            count(lit(1)).as("n_distinct")))
          h.crossJoin(tot)
            .withColumn("term",
              round(-(col("n") / col("tot")) * log2(col("n") / col("tot")), 6)
                .cast("decimal(28,6)"))
            .groupBy()
            .agg(max("n_distinct").as("n_distinct"),
              sum("term").cast("double").as("entropy_bits"))
            .select(lit(c).as("col_name"), col("n_distinct"),
              col("entropy_bits"))
        }
        ent("l_returnflag", col("l_returnflag"))
          .unionByName(ent("l_linestatus", col("l_linestatus")))
          .unionByName(ent("l_quantity_int", col("l_quantity").cast("long")))
          .unionByName(ent("l_linenumber", col("l_linenumber")))
          .orderBy("col_name")
      },
      {
        def ent(c: String, e: String) =
          s"""SELECT '$c' AS col_name,
             |  CAST(n_distinct AS BIGINT) AS n_distinct,
             |  CAST(entropy_bits AS DOUBLE) AS entropy_bits FROM (
             |  SELECT max(nd) AS n_distinct, sum(term) AS entropy_bits FROM (
             |    SELECT CAST(round(-(n/tot) * log2(n/tot), 6) AS DECIMAL(28,6))
             |      AS term, nd
             |    FROM (SELECT $e AS v, count(*) AS n FROM lineitem GROUP BY 1) h,
             |      (SELECT CAST(count(*) AS BIGINT) AS tot,
             |         count(DISTINCT $e) AS nd FROM lineitem)))""".stripMargin
        Seq(ent("l_returnflag", "l_returnflag"),
          ent("l_linestatus", "l_linestatus"),
          ent("l_quantity_int", "CAST(l_quantity AS BIGINT)"),
          ent("l_linenumber", "l_linenumber"))
          .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      }
    ),

    // ---- distribution drift (PSI) ------------------------------------------
    // Population-stability index of the order-value distribution, early
    // period vs late: per fixed price bucket, psi_term =
    // (p−q)·ln(p/q) with Laplace +1 smoothing over the observed bucket
    // set (PSI = Σ terms; >0.2 = actionable drift). Completes the drift
    // family: dq_schema_drift diffs column PROFILES, dq_snapshot_diff
    // diffs ROWS, this diffs the DISTRIBUTION. floor() before the long
    // cast on both sides (DuckDB's double→BIGINT cast rounds; Spark's
    // truncates); ln parity per the bigram-LM precedent (round 6).
    "dq_distribution_drift" -> QuerySpec(
      (s, dir) => {
        val o = t(s, dir, "orders").select(
          floor(col("o_totalprice") / 50000).cast("long").as("bucket"),
          (epochS(col("o_orderdate")) < lit(883612800L)).as("early"))
        val h = o.groupBy("bucket").agg(
          sum(when(col("early"), 1L).otherwise(0L)).as("ca"),
          sum(when(!col("early"), 1L).otherwise(0L)).as("cb"))
        val tot = broadcast(h.agg(sum("ca").as("na"), sum("cb").as("nb"),
          count(lit(1)).as("b")))
        h.crossJoin(tot)
          .withColumn("p", (col("ca") + 1).cast("double") / (col("na") + col("b")))
          .withColumn("q", (col("cb") + 1).cast("double") / (col("nb") + col("b")))
          .select(col("bucket"), col("ca"), col("cb"),
            round((col("p") - col("q")) * log(col("p") / col("q")), 6)
              .as("psi_term"))
          .orderBy("bucket")
      },
      """WITH o AS (SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
        |    (epoch_ms(o_orderdate)//1000 < 883612800) AS early FROM orders),
        |h AS (SELECT bucket,
        |    CAST(sum(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN early THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM o GROUP BY 1),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb, count(*) AS b FROM h)
        |SELECT bucket, ca, cb,
        |  round(((ca + 1.0)/(na + b) - (cb + 1.0)/(nb + b)) *
        |    ln(((ca + 1.0)/(na + b)) / ((cb + 1.0)/(nb + b))), 6) AS psi_term
        |FROM h, tot ORDER BY bucket""".stripMargin
    ),

    // ---- daily-count anomaly days ------------------------------------------
    // Ops-monitoring: days whose event volume deviates > 3×MAD from the
    // per-type median (robust — a burst day cannot drag the threshold the
    // way a mean/stddev gate would). Exact integer median/MAD as
    // deterministic element picks over (type, day) counts — the window
    // partitions carry #days rows per type, calendar-bounded. Flag
    // comparison is integer cross-multiplied (dev·100 > 300·MAD).
    "ts_anomaly_days" -> QuerySpec(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = t(s, dir, "events")
          .select(col("event_type").as("et"),
            (epochS(col("ts")) / 86400).cast("long").as("day"))
          .groupBy("et", "day").agg(count(lit(1)).as("n"))
        val wAll = Window.partitionBy("et")
        def pick(df: org.apache.spark.sql.DataFrame, ord: Seq[String],
            out: String, src: String) =
          df.withColumn("rn", row_number().over(
              Window.partitionBy("et").orderBy(ord.map(col): _*)))
            .withColumn("cnt", count(lit(1)).over(wAll))
            .filter(col("rn") === expr("(cnt + 1) div 2"))
            .select(col("et"), col(src).as(out))
        val med = pick(daily, Seq("n", "day"), "med", "n")
        val dv = daily.join(broadcast(med), "et")
          .withColumn("dev", abs(col("n") - col("med")))
        val mad = pick(dv, Seq("dev", "n", "day"), "mad", "dev")
        dv.join(broadcast(mad), "et")
          .filter(col("dev") * 100 > lit(300) * col("mad"))
          .select(col("et").as("event_type"), col("day"), col("n"),
            col("med"), col("mad"))
          .orderBy("event_type", "day")
      },
      """WITH d AS (SELECT event_type AS et, (epoch_ms(ts)//1000)//86400 AS day,
        |    count(*) AS n FROM events GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY et ORDER BY n, day) AS rn,
        |    count(*) OVER (PARTITION BY et) AS cnt FROM d),
        |med AS (SELECT et, n AS med FROM r WHERE rn = (cnt+1)//2),
        |dv AS (SELECT d.et, d.day, d.n, m.med, abs(d.n - m.med) AS dev
        |  FROM d JOIN med m ON d.et = m.et),
        |r2 AS (SELECT *, row_number() OVER (PARTITION BY et ORDER BY dev, n, day) AS rn,
        |    count(*) OVER (PARTITION BY et) AS cnt FROM dv),
        |mad AS (SELECT et, dev AS mad FROM r2 WHERE rn = (cnt+1)//2)
        |SELECT dv.et AS event_type, dv.day, dv.n, dv.med, mad.mad
        |FROM dv JOIN mad ON dv.et = mad.et
        |WHERE dv.dev * 100 > 300 * mad.mad
        |ORDER BY event_type, day""".stripMargin
    ),

    // ---- row-level snapshot diff -----------------------------------------
    // The reconciliation report between two table versions: added /
    // removed / changed / unchanged row counts from ONE keyed full-outer
    // join with per-column comparison (dq_schema_drift diffs the column
    // PROFILES; this diffs the ROWS). Snapshots are carved
    // deterministically from orders: B gains the %10==0 keys A lacks,
    // loses the %13==0 keys, and restates o_totalprice on %7==0.
    "dq_snapshot_diff" -> QuerySpec(
      (s, dir) => {
        val o = t(s, dir, "orders")
        val snapA = o.filter(col("o_orderkey") % 10 =!= 0)
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("price_a"),
            col("o_orderstatus").as("status_a"))
        val snapB = o.filter(col("o_orderkey") % 13 =!= 0)
          .select(col("o_orderkey").as("k"),
            when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1.0)
              .otherwise(col("o_totalprice")).as("price_b"),
            col("o_orderstatus").as("status_b"))
        snapA.join(snapB, Seq("k"), "full_outer")
          .select(when(col("price_a").isNull, "added")
            .when(col("price_b").isNull, "removed")
            .when(col("price_a") =!= col("price_b") ||
              col("status_a") =!= col("status_b"), "changed")
            .otherwise("unchanged").as("change_type"))
          .groupBy("change_type").agg(count(lit(1)).as("n"))
          .orderBy("change_type")
      },
      """WITH a AS (SELECT o_orderkey AS k, o_totalprice AS pa,
        |    o_orderstatus AS sa FROM orders WHERE o_orderkey % 10 <> 0),
        |b AS (SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
        |      ELSE o_totalprice END AS pb,
        |    o_orderstatus AS sb FROM orders WHERE o_orderkey % 13 <> 0),
        |d AS (SELECT CASE WHEN pa IS NULL THEN 'added'
        |    WHEN pb IS NULL THEN 'removed'
        |    WHEN pa <> pb OR sa <> sb THEN 'changed'
        |    ELSE 'unchanged' END AS change_type
        |  FROM a FULL OUTER JOIN b USING (k))
        |SELECT change_type, count(*) AS n FROM d
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ),

    // ---- exact bounded-horizon EWMA --------------------------------------
    // Exponentially-weighted daily revenue per event type, α = 1/2, horizon
    // 16 lags: weights 2^(15−k) are exact integers, the daily series is
    // exact integer cents, and the smoothed value is one floor division —
    // no float pow anywhere, hash-stable. The 2⁻¹⁶ tail truncation is the
    // documented horizon contract (beyond 16 days the weight is < 0.002%
    // of the mass). One key-partitioned window pass evaluates all 16 lags.
    "ts_ewma" -> QuerySpec(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = t(s, dir, "events")
          .select(col("event_type"), (epochS(col("ts")) / 86400).cast("long").as("day"),
            col("value"))
          .groupBy("event_type", "day")
          .agg((round(sum(QuerySpec.dec4(col("value"))), 2) * 100)
            .cast("long").as("cents"))
        val w = Window.partitionBy("event_type").orderBy("day")
        val terms = (0 until 16).map { k =>
          val lv = lag(col("cents"), k).over(w)
          (when(lv.isNotNull, lv * lit(1L << (15 - k))).otherwise(lit(0L)),
            when(lv.isNotNull, lit(1L << (15 - k))).otherwise(lit(0L)))
        }
        daily
          .withColumn("wnum", terms.map(_._1).reduce(_ + _))
          .withColumn("wden", terms.map(_._2).reduce(_ + _))
          .select(col("event_type"), col("day"),
            expr("wnum div wden").as("ewma_cents"))
          .orderBy("event_type", "day")
      },
      {
        val num = (0 until 16).map(k =>
          s"(CASE WHEN lag(cents, $k) OVER w IS NOT NULL THEN lag(cents, $k) OVER w * ${1L << (15 - k)} ELSE 0 END)")
          .mkString(" + ")
        val den = (0 until 16).map(k =>
          s"(CASE WHEN lag(cents, $k) OVER w IS NOT NULL THEN ${1L << (15 - k)} ELSE 0 END)")
          .mkString(" + ")
        s"""WITH daily AS (
           |  SELECT event_type, (epoch_ms(ts)//1000)//86400 AS day,
           |    CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) * 100 AS BIGINT)
           |      AS cents
           |  FROM events GROUP BY 1, 2)
           |SELECT event_type, day, ($num) // ($den) AS ewma_cents
           |FROM daily
           |WINDOW w AS (PARTITION BY event_type ORDER BY day)
           |ORDER BY event_type, day""".stripMargin
      }
    ),

    // ---- HITS hubs & authorities ---------------------------------------
    // Kleinberg's endorsement scores on the synthetic 37-host link graph
    // (web_pagerank's edge set) — fixed-point integer halves with L1
    // floor-normalization; the oracle unrolls both iterations' four
    // normalize passes as CTEs, so any drift in any half-step breaks
    // the hash.
    "graph_hits" -> QuerySpec(
      (s, dir) => {
        val d = col("doc_id")
        val docs = t(s, dir, "documents")
        val edges = docs.select((d % 37).as("src"), ((d * 3 + 1) % 37).as("dst"))
          .unionByName(
            docs.select((d % 37).as("src"), ((d * 7 + 5) % 37).as("dst")))
        LinkGraph.hits(edges, "src", "dst", iters = 2, scale = 1000000L)
          .orderBy("node")
      },
      {
        val iterCte = (i: Int) => {
          val prevH = if (i == 1) "h0" else s"h${i - 1}"
          s"""a${i}r AS (SELECT e.dst AS node, sum(h.h) AS raw
             |  FROM e0 e JOIN $prevH h ON e.src = h.node GROUP BY 1),
             |a${i}s AS (SELECT sum(raw) AS s FROM a${i}r),
             |a$i AS (SELECT n.node, COALESCE((r.raw * 1000000) // a${i}s.s, 0) AS a
             |  FROM nodes n LEFT JOIN a${i}r r ON n.node = r.node, a${i}s),
             |h${i}r AS (SELECT e.src AS node, sum(a.a) AS raw
             |  FROM e0 e JOIN a$i a ON e.dst = a.node GROUP BY 1),
             |h${i}s AS (SELECT sum(raw) AS s FROM h${i}r),
             |h$i AS (SELECT n.node, COALESCE((r.raw * 1000000) // h${i}s.s, 0) AS h
             |  FROM nodes n LEFT JOIN h${i}r r ON n.node = r.node, h${i}s)""".stripMargin
        }
        s"""WITH e0 AS (
           |  SELECT DISTINCT doc_id % 37 AS src, (doc_id * 3 + 1) % 37 AS dst
           |  FROM documents
           |  UNION
           |  SELECT doc_id % 37, (doc_id * 7 + 5) % 37 FROM documents),
           |nodes AS (SELECT src AS node FROM e0 UNION SELECT dst FROM e0),
           |h0 AS (SELECT node, 1000000 AS h FROM nodes),
           |${(1 to 2).map(iterCte).mkString(",\n")}
           |SELECT h2.node, CAST(h2.h AS BIGINT) AS hub, CAST(a2.a AS BIGINT) AS auth
           |FROM h2 JOIN a2 ON h2.node = a2.node
           |ORDER BY h2.node""".stripMargin
      }
    ),

    // ---- schema/profile drift between two slices -----------------------
    // The profile op applied to an early and a late shipment slice and
    // joined per column — the ingest-monitoring report that catches a
    // column whose distinct cardinality or numeric range moved between
    // loads. Two single-scan profiles + one #columns-sized join.
    "dq_schema_drift" -> QuerySpec(
      (s, dir) => {
        import graft.operators.DataQuality
        val li = t(s, dir, "lineitem")
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice", "l_discount", "l_returnflag")
        val cutoff = lit("1997-06-01").cast("timestamp")
        def side(df: org.apache.spark.sql.DataFrame, sfx: String) =
          DataQuality.profile(df, cols)
            .select(col("col_name"), col("n_distinct").as(s"n_distinct_$sfx"),
              col("min_val").as(s"min_$sfx"), col("max_val").as(s"max_$sfx"))
        side(li.filter(col("l_shipdate") < cutoff), "a")
          .join(side(li.filter(col("l_shipdate") >= cutoff), "b"), "col_name")
          .select(col("col_name"), col("n_distinct_a"), col("n_distinct_b"),
            (col("n_distinct_b") - col("n_distinct_a")).as("distinct_delta"),
            (col("min_b") - col("min_a")).as("min_delta"),
            (col("max_b") - col("max_a")).as("max_delta"))
          .orderBy("col_name")
      },
      {
        val num = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice", "l_discount")
        def block(pred: String) =
          (num.map(c =>
            s"""SELECT '$c' AS col_name, count(DISTINCT $c) AS n_distinct,
               |  CAST(min($c) AS DOUBLE) AS min_val, CAST(max($c) AS DOUBLE) AS max_val
               |  FROM lineitem WHERE $pred""".stripMargin) :+
            s"""SELECT 'l_returnflag', count(DISTINCT l_returnflag),
               |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
               |  FROM lineitem WHERE $pred""".stripMargin)
            .mkString(" UNION ALL ")
        s"""WITH a AS (${block("l_shipdate < TIMESTAMP '1997-06-01'")}),
           |b AS (${block("l_shipdate >= TIMESTAMP '1997-06-01'")})
           |SELECT a.col_name, a.n_distinct AS n_distinct_a,
           |  b.n_distinct AS n_distinct_b,
           |  b.n_distinct - a.n_distinct AS distinct_delta,
           |  b.min_val - a.min_val AS min_delta,
           |  b.max_val - a.max_val AS max_delta
           |FROM a JOIN b ON a.col_name = b.col_name
           |ORDER BY a.col_name""".stripMargin
      }
    ),

    // ---- full-outer reconciliation report ------------------------------
    // Daily order revenue vs daily shipped revenue, FULL OUTER on the
    // epoch day so days present on only one side still report (the
    // completeness join type the engine had not yet declared): keyed
    // equi-join of two pre-aggregated day tables — fact tables are
    // reduced BEFORE the join, so the join input is days, not rows.
    "join_full_outer_recon" -> QuerySpec(
      (s, dir) => {
        val o = t(s, dir, "orders")
          .groupBy((epochS(col("o_orderdate")) / 86400).cast("long").as("day"))
          .agg(count(lit(1)).as("n_orders"),
            QuerySpec.money2(sum(QuerySpec.dec4(col("o_totalprice")))).as("order_rev"))
        val l = t(s, dir, "lineitem")
          .groupBy((epochS(col("l_shipdate")) / 86400).cast("long").as("day"))
          .agg(count(lit(1)).as("n_ship_lines"),
            QuerySpec.money2(sum(QuerySpec.dec4(col("l_extendedprice")))).as("ship_rev"))
        o.join(l, Seq("day"), "full_outer")
          .select(col("day"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("order_rev"), lit(0.0)).as("order_rev"),
            coalesce(col("n_ship_lines"), lit(0L)).as("n_ship_lines"),
            coalesce(col("ship_rev"), lit(0.0)).as("ship_rev"))
          .orderBy("day")
      },
      """WITH o AS (SELECT (epoch_ms(o_orderdate)//1000)//86400 AS day,
        |    count(*) AS n_orders,
        |    CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS order_rev
        |  FROM orders GROUP BY 1),
        |l AS (SELECT (epoch_ms(l_shipdate)//1000)//86400 AS day,
        |    count(*) AS n_ship_lines,
        |    CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS ship_rev
        |  FROM lineitem GROUP BY 1)
        |SELECT COALESCE(o.day, l.day) AS day,
        |  COALESCE(n_orders, 0) AS n_orders,
        |  COALESCE(order_rev, 0.0) AS order_rev,
        |  COALESCE(n_ship_lines, 0) AS n_ship_lines,
        |  COALESCE(ship_rev, 0.0) AS ship_rev
        |FROM o FULL OUTER JOIN l ON o.day = l.day
        |ORDER BY day""".stripMargin
    ),

    // ---- percent-rank / cume-dist in ppm integers ----------------------
    // The remaining rank-family members, integer-rational: with the
    // tie-broken (value, event_id) order every rank is distinct, so
    // percent_rank = (rn−1)/(n−1) and cume_dist = rn/n become exact ppm
    // floor divisions. Event-type-partitioned windows only.
    "window_cume_dist" -> QuerySpec(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = t(s, dir, "events").filter(col("user_id") < 10)
          .select(col("event_type"), col("event_id"), col("value"))
        val w = Window.partitionBy("event_type").orderBy("value", "event_id")
        val wAll = Window.partitionBy("event_type")
        ev.withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wAll))
          .select(col("event_type"), col("event_id"),
            expr("((rn - 1) * 1000000) div (n - 1)").as("pr_ppm"),
            expr("(rn * 1000000) div n").as("cd_ppm"))
          .orderBy("event_type", "event_id")
      },
      """WITH e AS (SELECT event_type, event_id, value FROM events WHERE user_id < 10),
        |r AS (SELECT event_type, event_id,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM e)
        |SELECT event_type, event_id,
        |  CAST(((rn - 1) * 1000000) // (n - 1) AS BIGINT) AS pr_ppm,
        |  CAST((rn * 1000000) // n AS BIGINT) AS cd_ppm
        |FROM r ORDER BY event_type, event_id""".stripMargin
    ),

    // ---- day-of-week seasonality profile -------------------------------
    // Per (weekday, event_type): event count, exact decimal value total,
    // and the mean in 10⁻⁴ units via integer division. Weekday is pure
    // integer arithmetic on epoch days ((d+3) mod 7, 0 = Monday; the
    // epoch anchor 1970-01-01 is a Thursday) — no calendar/locale
    // semantics to disagree on.
    "ts_dow_profile" -> QuerySpec(
      (s, dir) => {
        t(s, dir, "events")
          .select(col("event_type"),
            (((epochS(col("ts")) / 86400).cast("long") + 3) % 7).as("dow"),
            col("value"))
          .groupBy("dow", "event_type")
          .agg(count(lit(1)).as("n_events"),
            QuerySpec.money2(sum(QuerySpec.dec4(col("value")))).as("total_value"),
            (sum(QuerySpec.dec4(col("value"))) * 10000).cast("long").as("sv"))
          .select(col("dow"), col("event_type"), col("n_events"),
            col("total_value"), expr("sv div n_events").as("avg_e4"))
          .orderBy("dow", "event_type")
      },
      """SELECT ((epoch_ms(ts)//1000)//86400 + 3) % 7 AS dow, event_type,
        |  count(*) AS n_events,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) // count(*) AS BIGINT) AS avg_e4
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ),

    // ---- per-user trend slope ------------------------------------------
    // Exact least-squares slope of each user's daily spend (decimal·10⁴
    // integer y, zero-based day x): one keyed aggregate, closed-form long
    // arithmetic, no per-key fit loop. slope_micro is in 10⁻⁴-value units
    // per day, ×10⁶.
    "ts_trend_slope" -> QuerySpec(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = t(s, dir, "events")
          .select(col("user_id"), (epochS(col("ts")) / 86400).cast("long").as("day"),
            col("value"))
          .groupBy("user_id", "day")
          .agg((sum(QuerySpec.dec4(col("value"))) * 10000).cast("long").as("y"))
        val base = daily.withColumn("x",
          col("day") - min("day").over(Window.partitionBy("user_id")))
        TimeSeries.trendSlope(base, "user_id", "x", "y")
          .withColumnRenamed("key", "user_id")
          .orderBy("user_id")
      },
      """WITH daily AS (SELECT user_id, (epoch_ms(ts)//1000)//86400 AS day,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |base AS (SELECT user_id, day - min(day) OVER (PARTITION BY user_id) AS x, y
        |  FROM daily),
        |s AS (SELECT user_id, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x*y) AS sxy, sum(x*x) AS sxx
        |  FROM base GROUP BY 1 HAVING count(*) >= 2)
        |SELECT user_id, n,
        |  CAST(((n*sxy - sx*sy) * 1000000) // (n*sxx - sx*sx) AS BIGINT) AS slope_micro
        |FROM s ORDER BY user_id""".stripMargin
    ),

    // ---- A/B chi-square gate -------------------------------------------
    // Hash-split variants (user_id parity), conversion = ≥14 purchase
    // events; the 2×2 independence statistic in exact staged-integer
    // form (contingency χ² — no float, no normal approximation table).
    "ab_chi_square" -> QuerySpec(
      (s, dir) => {
        val u = t(s, dir, "events")
          .groupBy("user_id")
          .agg(when(sum(when(col("event_type") === "purchase", 1).otherwise(0)) >= 14,
            1).otherwise(0).as("conv"))
          .withColumn("variant", (col("user_id") % 2).cast("int"))
        DataQuality.chiSquare2x2(u, "variant", "conv")
      },
      """WITH u AS (SELECT user_id, user_id % 2 AS variant,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
        |      THEN 1 ELSE 0 END AS conv
        |  FROM events GROUP BY user_id),
        |ct AS (SELECT
        |    sum(CASE WHEN variant = 0 AND conv = 1 THEN 1 ELSE 0 END) AS a,
        |    sum(CASE WHEN variant = 0 AND conv = 0 THEN 1 ELSE 0 END) AS b,
        |    sum(CASE WHEN variant = 1 AND conv = 1 THEN 1 ELSE 0 END) AS c,
        |    sum(CASE WHEN variant = 1 AND conv = 0 THEN 1 ELSE 0 END) AS d
        |  FROM u)
        |SELECT CAST(a AS BIGINT) AS conv_a, CAST(b AS BIGINT) AS noconv_a,
        |  CAST(c AS BIGINT) AS conv_b, CAST(d AS BIGINT) AS noconv_b,
        |  CAST(CASE WHEN (a+b)*(c+d)*(a+c)*(b+d) = 0 THEN 0 ELSE
        |    ((((a*d - b*c)*(a*d - b*c) * 1000000) // ((a+b)*(c+d))) * (a+b+c+d))
        |      // ((a+c)*(b+d)) END AS BIGINT) AS chi2_ppm
        |FROM ct""".stripMargin
    ),

    // ---- Benford first-digit audit -------------------------------------
    // First significant digit of order totals vs the Benford expectation
    // (ppm literals — the only logs in the op are compile-time
    // constants); deviation in ppm flags synthetic/fabricated columns.
    // Digit extraction is string-based (both engines print these plain).
    "dq_benford" -> QuerySpec(
      (s, dir) => {
        import s.implicits._
        val exp = Seq((1, 301030L), (2, 176091L), (3, 124939L), (4, 96910L),
          (5, 79181L), (6, 66947L), (7, 57992L), (8, 51153L), (9, 45757L))
          .toDF("digit", "exp_ppm")
        val fd = t(s, dir, "orders")
          .select(substring(col("o_totalprice").cast("string"), 1, 1)
            .cast("int").as("digit"))
        val n = fd.agg(count(lit(1)).as("n"))
        fd.groupBy("digit").agg(count(lit(1)).as("n_obs"))
          .crossJoin(broadcast(n))
          .join(broadcast(exp), Seq("digit"))
          .select(col("digit"), col("n_obs"),
            expr("(n_obs * 1000000) div n").as("obs_ppm"),
            col("exp_ppm"),
            expr("abs((n_obs * 1000000) div n - exp_ppm)").as("dev_ppm"))
          .orderBy("digit")
      },
      """WITH fd AS (SELECT CAST(substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS INTEGER) AS digit
        |  FROM orders),
        |n AS (SELECT count(*) AS n FROM fd),
        |exp(digit, exp_ppm) AS (VALUES (1, 301030), (2, 176091), (3, 124939),
        |  (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153), (9, 45757)),
        |obs AS (SELECT digit, count(*) AS n_obs FROM fd GROUP BY 1)
        |SELECT obs.digit, n_obs,
        |  CAST((n_obs * 1000000) // n.n AS BIGINT) AS obs_ppm,
        |  CAST(exp_ppm AS BIGINT) AS exp_ppm,
        |  CAST(abs((n_obs * 1000000) // n.n - exp_ppm) AS BIGINT) AS dev_ppm
        |FROM obs JOIN exp ON obs.digit = exp.digit, n
        |ORDER BY obs.digit""".stripMargin
    ),

    // ---- RAKE keyword extraction ---------------------------------------
    // Stopword-delimited candidate phrases scored by Σ deg/freq of their
    // words, integer-rational throughout; the oracle rebuilds the
    // prefix-sum segmentation, the word degree table, and the phrase
    // ranking in SQL.
    "tx_rake_keywords" -> QuerySpec(
      (s, dir) =>
        TextAnalysis.rakeKeywords(t(s, dir, "documents"), "doc_id", "text",
          maxPhraseLen = 8, k = 15),
      {
        val stops = TextAnalysis.StopWords.map(w => s"'$w'").mkString(", ")
        s"""WITH lst AS (SELECT doc_id,
           |    string_split_regex(trim(lower(text)), '\\s+') AS l FROM documents),
           |toks AS (SELECT doc_id, unnest(range(1, len(l)+1)) AS pos, unnest(l) AS w FROM lst),
           |tk AS (SELECT * FROM toks WHERE w <> ''),
           |fl AS (SELECT doc_id, pos, w,
           |  CASE WHEN w IN ($stops) THEN 1 ELSE 0 END AS stop FROM tk),
           |seg AS (SELECT doc_id, pos, w, stop,
           |    sum(stop) OVER (PARTITION BY doc_id ORDER BY pos
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS phrase_id
           |  FROM fl),
           |pw AS (SELECT doc_id, phrase_id, pos, w FROM seg WHERE stop = 0),
           |ph AS (SELECT doc_id, phrase_id, count(*) AS plen,
           |    string_agg(w, ' ' ORDER BY pos) AS phrase
           |  FROM pw GROUP BY 1, 2),
           |phok AS (SELECT * FROM ph WHERE plen <= 8),
           |occ AS (SELECT p.doc_id, p.phrase_id, p.plen, p.phrase, w.w
           |  FROM phok p JOIN pw w ON p.doc_id = w.doc_id AND p.phrase_id = w.phrase_id),
           |ws AS (SELECT w, count(*) AS freq, sum(plen) AS deg FROM occ GROUP BY 1),
           |wscore AS (SELECT w, (deg * 1000000) // freq AS wsc FROM ws),
           |psc AS (SELECT o.doc_id, o.phrase_id, o.phrase, sum(s.wsc) AS score
           |  FROM occ o JOIN wscore s ON o.w = s.w GROUP BY 1, 2, 3)
           |SELECT phrase, count(*) AS n_occ, CAST(min(score) AS BIGINT) AS score
           |FROM psc GROUP BY 1 ORDER BY score DESC, phrase LIMIT 15""".stripMargin
      }
    ),

    // ---- synchronous label propagation ---------------------------------
    // Deterministic LPA communities on the undirected 37-host graph:
    // most-frequent neighbor label, ties to the smallest, synchronous
    // rounds — the oracle unrolls both rounds' count/pick/coalesce.
    "graph_label_prop" -> QuerySpec(
      (s, dir) => {
        val d = col("doc_id")
        val docs = t(s, dir, "documents")
        val edges = docs.select((d % 37).as("src"), ((d * 3 + 1) % 37).as("dst"))
          .unionByName(
            docs.select((d % 37).as("src"), ((d * 7 + 5) % 37).as("dst")))
        LinkGraph.labelPropagation(edges, "src", "dst", iters = 2)
          .orderBy("node")
      },
      {
        val iterCte = (i: Int) => {
          val prev = s"l${i - 1}"
          s"""c$i AS (SELECT u.a AS node, l.label, count(*) AS c
             |  FROM und u JOIN $prev l ON u.b = l.node GROUP BY 1, 2),
             |p$i AS (SELECT node, label FROM (SELECT node, label,
             |    row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
             |  FROM c$i) WHERE rn = 1),
             |l$i AS (SELECT n.node, COALESCE(p.label, n.node) AS label
             |  FROM nodes n LEFT JOIN p$i p ON n.node = p.node)""".stripMargin
        }
        s"""WITH e0 AS (
           |  SELECT doc_id % 37 AS src, (doc_id * 3 + 1) % 37 AS dst FROM documents
           |  UNION SELECT doc_id % 37, (doc_id * 7 + 5) % 37 FROM documents),
           |und AS (SELECT src AS a, dst AS b FROM e0 UNION SELECT dst, src FROM e0),
           |nodes AS (SELECT DISTINCT a AS node FROM und),
           |l0 AS (SELECT node, node AS label FROM nodes),
           |${(1 to 2).map(iterCte).mkString(",\n")}
           |SELECT node, label FROM l2 ORDER BY node""".stripMargin
      }
    ),

    // ---- right-to-be-forgotten cascade audit ---------------------------
    // GDPR deletion planning: a customer tombstone list (every 97th key)
    // cascades customer → orders → lineitem; the audit reports purge vs
    // keep counts per table BEFORE any delete runs. Lineitem reaches the
    // list through the orders semi-join (no custkey on the fact table) —
    // two semi-joins and three keyed counts, no row ever widened.
    "dq_deletion_audit" -> QuerySpec(
      (s, dir) => {
        val del = t(s, dir, "customer")
          .filter(col("c_custkey") % 97 === 0).select(col("c_custkey"))
        val cust = t(s, dir, "customer")
        val ords = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        val ordsHit = ords.join(del, col("o_custkey") === col("c_custkey"), "left_semi")
        def report(name: String, total: org.apache.spark.sql.DataFrame,
            hit: org.apache.spark.sql.DataFrame) =
          total.agg(count(lit(1)).as("n_total")).crossJoin(
            broadcast(hit.agg(count(lit(1)).as("n_purge"))))
            .select(lit(name).as("table_name"), col("n_purge"),
              (col("n_total") - col("n_purge")).as("n_keep"))
        report("customer", cust,
            cust.join(del, Seq("c_custkey"), "left_semi"))
          .unionByName(report("orders", ords, ordsHit))
          .unionByName(report("lineitem", li,
            li.join(ordsHit.select(col("o_orderkey")),
              col("l_orderkey") === col("o_orderkey"), "left_semi")))
          .orderBy("table_name")
      },
      """WITH del AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
        |oh AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM del))
        |SELECT 'customer' AS table_name,
        |  (SELECT count(*) FROM customer WHERE c_custkey IN (SELECT c_custkey FROM del)) AS n_purge,
        |  (SELECT count(*) FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM del)) AS n_keep
        |UNION ALL
        |SELECT 'orders',
        |  (SELECT count(*) FROM oh),
        |  (SELECT count(*) FROM orders) - (SELECT count(*) FROM oh)
        |UNION ALL
        |SELECT 'lineitem',
        |  (SELECT count(*) FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM oh)),
        |  (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM oh))
        |ORDER BY table_name""".stripMargin
    ),

    // ---- k-core decomposition ------------------------------------------
    // Synchronous peeling on a deterministic doc-derived graph (13 chains
    // of length 6 hanging off a 13-node core cycle — the periphery peels
    // one hop per round, the cycle is the 2-core fixed point). 7 rounds
    // ≥ the 6 the cascade needs; the oracle unrolls the same 7, and the
    // returned degrees prove the fixed point (all ≥ k).
    "graph_kcore" -> QuerySpec(
      (s, dir) => {
        val d = col("doc_id")
        val docs = t(s, dir, "documents")
        val c = d % 13
        val p = d % 5
        val edges = docs.select((c * 10 + p).as("src"), (c * 10 + p + 1).as("dst"))
          .unionByName(docs.select((lit(900) + c).as("src"),
            (lit(900) + (c + 1) % 13).as("dst")))
          .unionByName(docs.select((lit(900) + c).as("src"), (c * 10).as("dst")))
        LinkGraph.kCore(edges, "src", "dst", k = 2, rounds = 7)
          .orderBy("node")
      },
      {
        val roundCte = (i: Int) => {
          val prev = s"e${i - 1}"
          s"""k$i AS (SELECT a AS node FROM $prev GROUP BY 1 HAVING count(*) >= 2),
             |e$i AS (SELECT e.a, e.b FROM $prev e
             |  JOIN k$i x ON e.a = x.node JOIN k$i y ON e.b = y.node)""".stripMargin
        }
        s"""WITH raw AS (
           |  SELECT (doc_id % 13)*10 + doc_id % 5 AS src,
           |         (doc_id % 13)*10 + doc_id % 5 + 1 AS dst FROM documents
           |  UNION SELECT 900 + doc_id % 13, 900 + (doc_id % 13 + 1) % 13 FROM documents
           |  UNION SELECT 900 + doc_id % 13, (doc_id % 13)*10 FROM documents),
           |dir AS (SELECT src, dst FROM raw WHERE src <> dst),
           |e0 AS (SELECT src AS a, dst AS b FROM dir UNION SELECT dst, src FROM dir),
           |${(1 to 7).map(roundCte).mkString(",\n")}
           |SELECT a AS node, CAST(count(*) AS BIGINT) AS degree
           |FROM e7 GROUP BY 1 ORDER BY node""".stripMargin
      }
    ),

    // ---- compaction planner: next-fit small-file binning ----------------
    // The small-files problem at ingest scale: documents stand in for the
    // file manifest (n_chars = file bytes); per source, files pack in
    // (source, doc_id) order into ~64 KiB bins by running-total next-fit
    // — bin = floor(preceding bytes / target), one source-partitioned
    // prefix-sum window, then a (source, bin)-keyed rollup. The plan a
    // compaction job would execute, derived without any driver loop.
    "opt_compaction_bins" -> QuerySpec(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        t(s, dir, "documents")
          .select(col("source"), col("doc_id"), col("n_chars").cast("long").as("bytes"))
          .withColumn("cum_before", coalesce(sum(col("bytes")).over(w), lit(0L)))
          .withColumn("bin", expr("cum_before div 65536"))
          .groupBy("source", "bin")
          .agg(count(lit(1)).as("n_files"), sum("bytes").as("bin_bytes"),
            min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
          .orderBy("source", "bin")
      },
      """WITH f AS (SELECT source, doc_id, CAST(n_chars AS BIGINT) AS bytes,
        |    COALESCE(sum(CAST(n_chars AS BIGINT)) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM documents)
        |SELECT source, CAST(cum_before // 65536 AS BIGINT) AS bin,
        |  count(*) AS n_files,
        |  CAST(sum(bytes) AS BIGINT) AS bin_bytes,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ),

    // ---- cosine range search -------------------------------------------
    // All corpus vectors within cos ≥ 0.30 of the 10-query batch — the
    // fixed-radius dual of ann_topk_bruteforce, same broadcast-queries
    // scan, output bounded by threshold selectivity.
    "ann_range_search" -> QuerySpec(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Ann.rangeSearch(emb, emb.filter(col("vec_id") < 10),
            "vec_id", "embedding", minCos = 0.30)
          .orderBy("query_id", "neighbor_id")
      },
      """SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |  round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS cos
        |FROM embeddings a JOIN embeddings b
        |  ON a.vec_id < 10 AND b.vec_id <> a.vec_id
        |WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.30
        |ORDER BY 1, 2""".stripMargin
    )
  )
}
