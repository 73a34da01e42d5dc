package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.{t, epochS}

/** Analytics/query surface over the canonical star schema (SURVEY §7.2 M7):
  * joins (broadcast/shuffle/semi/anti), aggregations (group-by, rollup,
  * cube, distinct), windows (top-k, running), and set operations — all
  * Catalyst built-ins, planned declaratively so pushdown/pruning/reorder
  * are free.
  *
  * Scale notes (100 TB posture):
  *  - region/nation are `broadcast()` hinted: they are CONSTANT-size in
  *    TPC-H (25/5 rows at every scale factor), so the hint is safe forever;
  *  - customer/supplier/part grow LINEARLY with scale factor, so they get
  *    NO hint — AQE broadcasts them while they fit under
  *    autoBroadcastJoinThreshold and falls back to shuffle joins at scale
  *    (an unconditional hint would be a guaranteed OOM at 100 TB);
  *  - fact-fact joins (orders⋈lineitem) shuffle on the join key once and
  *    AQE re-plans skew at runtime;
  *  - aggregates are partial (map-side combine) by construction.
  */
object CoreAnalytics {

  val specs: Map[String, QuerySpec] = Map(
    // ---- TPC-H Q1-like pricing summary (flagship agg) ------------------
    "q1_pricing_summary" -> QuerySpec(
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            // quantities are integer-valued: double sums are exact
            round(sum("l_quantity"), 2).as("sum_qty"),
            // money: exact decimal sums (order-independent — see QuerySpec.dec4)
            QuerySpec.sumMoney(QuerySpec.dec4(col("l_extendedprice"))).as("sum_base_price"),
            QuerySpec.sumMoney(QuerySpec.dec4(col("l_extendedprice")) *
              (lit(1) - QuerySpec.dec4(col("l_discount")))).as("sum_disc_price"),
            QuerySpec.sumMoney(QuerySpec.dec4(col("l_extendedprice")) *
              (lit(1) - QuerySpec.dec4(col("l_discount"))) *
              (lit(1) + QuerySpec.dec4(col("l_tax")))).as("sum_charge"),
            round(avg("l_quantity"), 2).as("avg_qty"),
            count(lit(1)).as("count_order")
          )
          .orderBy("l_returnflag", "l_linestatus")
      },
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))),2) AS DOUBLE) AS sum_base_price,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))*(1-CAST(l_discount AS DECIMAL(18,4)))),2) AS DOUBLE) AS sum_disc_price,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))*(1-CAST(l_discount AS DECIMAL(18,4)))*(1+CAST(l_tax AS DECIMAL(18,4)))),2) AS DOUBLE) AS sum_charge,
        | round(avg(l_quantity),2) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
    ),

    // ---- TPC-H Q3-like: 3-way join + agg + top-k -----------------------
    "q3_top_revenue" -> QuerySpec(
      (s, dir) => {
        val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val ord = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
        val li = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(QuerySpec.sumMoney(QuerySpec.dec4(col("l_extendedprice")) *
            (lit(1) - QuerySpec.dec4(col("l_discount")))).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))*(1-CAST(l_discount AS DECIMAL(18,4)))),2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin
    ),

    // ---- TPC-H Q5-like: 6-way join (broadcast dims + shuffled facts) ---
    "q5_local_supplier_volume" -> QuerySpec(
      (s, dir) => {
        val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
        val nation = t(s, dir, "nation")
        val cust = t(s, dir, "customer")
        val supp = t(s, dir, "supplier")
        val ord = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        val li = t(s, dir, "lineitem")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .join(cust, col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(QuerySpec.sumMoney(QuerySpec.dec4(col("l_extendedprice")) *
            (lit(1) - QuerySpec.dec4(col("l_discount")))).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      """SELECT n_name, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))*(1-CAST(l_discount AS DECIMAL(18,4)))),2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin
    ),

    // ---- TPC-H Q7-like: bidirectional nation-pair trade volume ---------
    // Two broadcast copies of the nation dim (supplier side + customer
    // side), the nation-pair predicate applied post-join, revenue by
    // (supp_nation, cust_nation, ship year). Exercises the self-dim
    // double-broadcast shape q5's single-region filter does not.
    "q7_volume_shipping" -> QuerySpec(
      (s, dir) => {
        val n1 = t(s, dir, "nation")
          .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
        val n2 = t(s, dir, "nation")
          .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("sk"))
          .join(broadcast(n2), col("c_nationkey") === col("ck"))
          .filter((col("supp_nation") === "NATION_18" &&
              col("cust_nation") === "NATION_19") ||
            (col("supp_nation") === "NATION_19" &&
              col("cust_nation") === "NATION_18"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(QuerySpec.sumMoney(QuerySpec.dec4(col("l_extendedprice")) *
            (lit(1) - QuerySpec.dec4(col("l_discount")))).as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
        |    *(1-CAST(l_discount AS DECIMAL(18,4)))),2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
        |   OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
    ),

    // ---- TPC-H Q6-like: pure filter+agg — every predicate reaches the
    // parquet scan (PushedFilters), no shuffle beyond the final 1-row agg
    "q6_forecast_revenue" -> QuerySpec(
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24)
          .agg(QuerySpec.sumMoney(QuerySpec.dec4(col("l_extendedprice")) *
            QuerySpec.dec4(col("l_discount"))).as("revenue"))
      },
      """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))*CAST(l_discount AS DECIMAL(18,4))),2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin
    ),

    // ---- salted skew join ----------------------------------------------
    // The hot-key mitigation for when AQE's skew-join split can't apply
    // (e.g. a broadcast-ineligible build side): scatter the probe side
    // over `salts` deterministic replicas of the build side. Row-identical
    // to the direct join — the oracle IS the direct join.
    "join_skew_salted" -> QuerySpec(
      (s, dir) => {
        val left = t(s, dir, "lineitem")
          .select(col("l_partkey").as("k"), col("l_extendedprice"))
        val right = t(s, dir, "part")
          .select(col("p_partkey").as("k"), col("p_brand"))
        graft.operators.SkewJoin.saltedJoin(left, right, "k", salts = 8)
          .groupBy("p_brand")
          .agg(QuerySpec.sumMoney(QuerySpec.dec4(col("l_extendedprice")))
            .as("revenue"), count(lit(1)).as("n"))
          .orderBy("p_brand")
      },
      """SELECT p_brand,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
        |    AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin
    ),

    // ---- dim join (AQE picks broadcast while part fits under the
    // autoBroadcastJoinThreshold; part scales linearly, so no forced hint)
    "join_broadcast_dim" -> QuerySpec(
      (s, dir) => {
        val part = t(s, dir, "part")
        t(s, dir, "lineitem")
          .join(part, col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          // exact decimal sum, then identical double division both engines
          .agg(round(sum(QuerySpec.dec4(col("l_extendedprice"))).cast("double") /
            count(lit(1)), 2).as("avg_price"),
            count(lit(1)).as("n"))
          .orderBy("p_brand")
      },
      """SELECT p_brand,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)/count(*),2) AS avg_price,
        | count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin
    ),

    // ---- semi join (EXISTS) ------------------------------------------
    "join_semi_exists" -> QuerySpec(
      (s, dir) => {
        val big = t(s, dir, "lineitem").filter(col("l_quantity") >= 45)
        t(s, dir, "orders")
          .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .orderBy("o_orderkey")
      },
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        |ORDER BY o_orderkey""".stripMargin
    ),

    // ---- anti join (NOT EXISTS) --------------------------------------
    "join_anti_not_exists" -> QuerySpec(
      (s, dir) => {
        val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        t(s, dir, "customer")
          .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin
    ),

    // ---- window: top-k per group -------------------------------------
    // ---- gaps-and-islands: activity streaks ------------------------------
    // The classic island grouping (day − row_number is constant within a
    // run of consecutive days): per-user streak count, longest streak,
    // and current-tail length candidates collapse to two keyed
    // aggregations after one user-partitioned window.
    "window_streaks" -> QuerySpec(
      (s, dir) => {
        val ud = t(s, dir, "events")
          .select(col("user_id"),
            (epochS(col("ts")) / 86400).cast("long").as("day"))
          .distinct()
        val w = Window.partitionBy("user_id").orderBy("day")
        ud.withColumn("island", col("day") - row_number().over(w))
          .groupBy("user_id", "island")
          .agg(count(lit(1)).as("len"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_streaks"), max("len").as("max_streak"))
          .orderBy("user_id")
      },
      """WITH ud AS (SELECT DISTINCT user_id,
        |    (epoch_ms(ts)//1000)//86400 AS day FROM events),
        |i AS (SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS island FROM ud),
        |runs AS (SELECT user_id, island, count(*) AS len FROM i GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_streaks, max(len) AS max_streak
        |FROM runs GROUP BY 1 ORDER BY 1""".stripMargin
    ),

    "window_topk_per_group" -> QuerySpec(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey", "rn")
      },
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin
    ),

    // ---- window: running aggregate -----------------------------------
    "window_running_sum" -> QuerySpec(
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events")
          .withColumn("running_value", round(sum("value").over(w), 2))
          .select("event_id", "user_id", "running_value")
          .orderBy("event_id")
      },
      """SELECT event_id, user_id,
        | round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_value
        |FROM events ORDER BY event_id""".stripMargin
    ),

    // ---- rollup ------------------------------------------------------
    "agg_rollup" -> QuerySpec(
      (s, dir) => {
        t(s, dir, "orders")
          .rollup("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"),
            QuerySpec.sumMoney(QuerySpec.dec4(col("o_totalprice"))).as("total"))
          .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
      },
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))),2) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin
    ),

    // ---- cube --------------------------------------------------------
    "agg_cube" -> QuerySpec(
      (s, dir) => {
        t(s, dir, "orders")
          .cube("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
      },
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin
    ),

    // ---- distinct aggregation ----------------------------------------
    "agg_count_distinct" -> QuerySpec(
      (s, dir) => {
        t(s, dir, "events")
          .groupBy("event_type")
          .agg(countDistinct("user_id").as("n_users"),
            count(lit(1)).as("n_events"),
            QuerySpec.sumMoney(QuerySpec.dec4(col("value"))).as("sum_value"))
          .orderBy("event_type")
      },
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        | count(*) AS n_events,
        | CAST(round(sum(CAST(value AS DECIMAL(18,4))),2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    ),

    // ---- approximate distinct (HLL). The raw HLL estimate is
    // engine-specific, so the oracle-comparable surface is the EXACT
    // distinct count plus a hard in-query bound check: the query emits
    // whether the HLL estimate landed within ±2% of exact (rsd is set to
    // 0.5%, so 2% is a >4-sigma bound), and the oracle asserts that
    // column is literally true. A broken sketch flips the boolean and
    // fails the hash compare — a real gate, not a rows-only check.
    "agg_approx_distinct" -> QuerySpec(
      (s, dir) =>
        t(s, dir, "events")
          .groupBy("event_type")
          .agg(
            countDistinct("user_id").as("exact_users"),
            approx_count_distinct(col("user_id"), rsd = 0.005).as("approx"))
          .select(col("event_type"), col("exact_users"),
            (abs(col("approx") - col("exact_users")) <=
              col("exact_users") * lit(0.02)).as("approx_within_2pct"))
          .orderBy("event_type"),
      Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users,
        | true AS approx_within_2pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // ---- approximate quantile (t-digest-style sketch). Same gating idea
    // as agg_approx_distinct: the sketch value is engine-specific, so the
    // oracle-comparable surface is the EXACT discrete median plus a hard
    // rank-bound boolean — approx_percentile with accuracy 10000 has rank
    // error ≤ 1e-4·n, so the estimate must lie within the exact p49..p51
    // value band; the oracle asserts that boolean is literally true.
    "agg_approx_quantile" -> QuerySpec(
      (s, dir) =>
        t(s, dir, "events")
          .groupBy("event_type")
          .agg(
            expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("median_exact"),
            expr("percentile_disc(0.49) WITHIN GROUP (ORDER BY value)").as("p49"),
            expr("percentile_disc(0.51) WITHIN GROUP (ORDER BY value)").as("p51"),
            expr("approx_percentile(value, 0.5, 10000)").as("approx"))
          .select(col("event_type"),
            round(col("median_exact"), 4).as("median_exact"),
            (col("approx") >= col("p49") && col("approx") <= col("p51"))
              .as("approx_within_rank_band"))
          .orderBy("event_type"),
      Some("""SELECT event_type,
        | round(percentile_disc(0.5) WITHIN GROUP (ORDER BY value), 4) AS median_exact,
        | true AS approx_within_rank_band
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // ---- set ops -----------------------------------------------------
    "setop_intersect" -> QuerySpec(
      (s, dir) => {
        val buyers = t(s, dir, "events").filter(col("event_type") === "purchase").select("user_id")
        val clickers = t(s, dir, "events").filter(col("event_type") === "click").select("user_id")
        buyers.intersect(clickers).orderBy("user_id")
      },
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'click'
        |ORDER BY user_id""".stripMargin
    ),
    "setop_except" -> QuerySpec(
      (s, dir) => {
        val all = t(s, dir, "customer").select(col("c_custkey").as("custkey"))
        val withUrgent = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("custkey"))
        all.except(withUrgent).orderBy("custkey")
      },
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY custkey""".stripMargin
    ),
    "setop_union" -> QuerySpec(
      (s, dir) => {
        val a = t(s, dir, "events").filter(col("event_type") === "signup").select("user_id")
        val b = t(s, dir, "events").filter(col("value") > 190).select("user_id")
        a.union(b).distinct().orderBy("user_id")
      },
      """SELECT user_id FROM events WHERE event_type = 'signup'
        |UNION
        |SELECT user_id FROM events WHERE value > 190
        |ORDER BY user_id""".stripMargin
    ),

    // ---- pivot (index/value → dynamic columns; SURVEY §2.2 P11) ------
    "p11_pivot_event_counts" -> QuerySpec(
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val pivoted = t(s, dir, "events")
          .groupBy("user_id")
          .pivot("event_type", types)
          .count()
        types.foldLeft(pivoted)((df, c) =>
          df.withColumn(c, coalesce(col(c), lit(0L))))
          .orderBy("user_id")
      },
      """SELECT user_id,
        | CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        | CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        | CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        | CAST(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        | CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
    )
  )
}
