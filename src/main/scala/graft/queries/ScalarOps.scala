package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables.{t, epochS}

/** Scalar-function and remaining set/array surface (SURVEY §2.9): JSON
  * path extraction, date truncation/arithmetic, bag-semantics set ops,
  * array explode parity.
  */
object ScalarOps {

  val specs: Map[String, QuerySpec] = Map(

    // ---- JSON path extraction (the reference's JSON.parse surface) ------
    "sc_json_extract" -> QuerySpec(
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k_val"))
          .orderBy("event_id"),
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin
    ),

    // ---- date truncation + arithmetic ----------------------------------
    "sc_date_trunc" -> QuerySpec(
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month"))
          .agg(count(lit(1)).as("n"),
            countDistinct(dayofweek(col("o_orderdate"))).as("active_dows"))
          .orderBy("month"),
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
        | count(*) AS n,
        | count(DISTINCT dayofweek(o_orderdate) + 1) AS active_dows
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
    ),

    // ---- bag-semantics set ops (INTERSECT ALL) -------------------------
    "setop_intersect_all" -> QuerySpec(
      (s, dir) => {
        val a = t(s, dir, "events").filter(col("event_type") === "click").select("user_id")
        val b = t(s, dir, "events").filter(col("event_type") === "view").select("user_id")
        a.intersectAll(b).groupBy("user_id").agg(count(lit(1)).as("n"))
          .orderBy("user_id")
      },
      """SELECT user_id, count(*) AS n FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  INTERSECT ALL
        |  SELECT user_id FROM events WHERE event_type = 'view')
        |GROUP BY user_id ORDER BY user_id""".stripMargin
    ),

    // ---- bag-semantics EXCEPT ALL --------------------------------------
    "setop_except_all" -> QuerySpec(
      (s, dir) => {
        val a = t(s, dir, "events").filter(col("event_type") =!= "error").select("user_id")
        val b = t(s, dir, "events").filter(col("event_type") === "purchase").select("user_id")
        a.exceptAll(b).groupBy("user_id").agg(count(lit(1)).as("n"))
          .orderBy("user_id")
      },
      """SELECT user_id, count(*) AS n FROM (
        |  SELECT user_id FROM events WHERE event_type <> 'error'
        |  EXCEPT ALL
        |  SELECT user_id FROM events WHERE event_type = 'purchase')
        |GROUP BY user_id ORDER BY user_id""".stripMargin
    ),

    // ---- array explode parity (posexplode ≡ unnest with ordinality) ----
    "sc_array_explode" -> QuerySpec(
      (s, dir) =>
        t(s, dir, "embeddings")
          .filter(col("vec_id") < 5)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
          .select(col("vec_id"), col("pos").cast("long").as("pos"),
            round(col("x").cast("double"), 5).as("x"))
          .orderBy("vec_id", "pos"),
      """SELECT vec_id, unnest(range(len(embedding))) AS pos,
        | round(unnest(embedding::DOUBLE[]), 5) AS x
        |FROM embeddings WHERE vec_id < 5
        |ORDER BY vec_id, pos""".stripMargin
    ),

    // ---- unpivot / melt (wide → long) ----------------------------------
    // The relational inverse of p11's pivot: four measure columns melt to
    // (key, metric, val) rows via Spark's native unpivot (a projection +
    // generator — no shuffle, values pass through untouched so doubles
    // hash exactly).
    "sc_unpivot" -> QuerySpec(
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_orderkey") < 100)
          .select("l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax")
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_extendedprice"),
              col("l_discount"), col("l_tax")),
            "metric", "val")
          .orderBy("l_orderkey", "l_linenumber", "metric"),
      """SELECT l_orderkey, l_linenumber, metric, val
        |FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |        l_discount, l_tax
        |      FROM lineitem WHERE l_orderkey < 100)
        |UNPIVOT (val FOR metric IN (l_quantity, l_extendedprice, l_discount, l_tax))
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin
    )
  )
}
