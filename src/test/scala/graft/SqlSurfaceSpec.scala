package graft

import org.apache.spark.sql.functions._
import graft.functions.Fns

/** The engine's SQL surface: registered functions + generator. */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("rolling_hash SQL function matches the column API and the documented fold") {
    Tables.tune(spark)
    val got = spark.sql("SELECT rolling_hash('abc') AS h, rolling_hash('') AS e")
      .as[(Long, Long)].head()
    assert(got == ((96354L, 0L)))
    val viaColumn = Seq("abc").toDF("s").select(Fns.rollingHash(col("s"))).as[Long].head()
    assert(viaColumn == 96354L)
  }

  test("rolling_hash stays inside WholeStageCodegen") {
    Tables.tune(spark)
    // needs a real scan — local literal relations get constant-folded
    val plan = Tables.t(spark, sfDir, "documents")
      .select(Fns.rollingHash(col("text")).as("h"))
      .queryExecution.executedPlan
    val wscg = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wscg.nonEmpty, plan.toString)
  }

  test("mp_insert_id SQL function equals md5 of pipe-joined values") {
    Tables.tune(spark)
    val got = spark.sql("SELECT mp_insert_id('click', 'u1', 42) AS id").as[String].head()
    val expect = spark.sql("SELECT md5(concat_ws('|','click','u1',42)) AS id").as[String].head()
    assert(got == expect && got.matches("[0-9a-f]{32}"))
  }

  test("explode_session generator emits begin/hits/end via LATERAL VIEW") {
    Tables.tune(spark)
    Seq(
      (100L, 1700000000L, Seq(("click", 0L), ("view", 5000L))),
      (101L, 1700009999L, Seq.empty[(String, Long)])
    ).toDF("session_id", "start_sec", "hits")
      .withColumn("hits", col("hits").cast("array<struct<name:string,offset_ms:bigint>>"))
      .createOrReplaceTempView("ga_sessions")
    val rows = spark.sql(
      """SELECT session_id, e.event, e.time_s
        |FROM ga_sessions
        |LATERAL VIEW explode_session(start_sec, hits) e AS event, time_s
        |ORDER BY session_id, time_s, event""".stripMargin)
      .as[(Long, String, Long)].collect()
    val s100 = rows.filter(_._1 == 100L).map(r => (r._2, r._3)).toSeq
    assert(s100 == Seq(
      ("session begins", 1700000000L),
      ("click", 1700000001L),  // offset 0 → +1s bump
      ("view", 1700000005L),
      ("session ends", 1700000006L)))
    val s101 = rows.filter(_._1 == 101L).map(_._2).toSeq
    assert(s101 == Seq("session begins", "session ends"))
  }

  test("cosine_sim / l2_dist / topk_by_score are callable from SQL") {
    Tables.tune(spark)
    val (cos, d2) = spark.sql(
      """SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
        |       l2_dist(array(1.0d, 2.0d), array(0.0d, 0.0d)) AS d""".stripMargin)
      .as[(Double, Double)].head()
    assert(math.abs(cos - 1.0) < 1e-12 && d2 == 5.0)
    Seq((1L, 10L, 0.2), (1L, 11L, 0.9), (1L, 12L, 0.5))
      .toDF("q", "id", "score").createOrReplaceTempView("scored")
    val top = spark.sql(
      "SELECT q, topk_by_score(score, id, 2) AS top FROM scored GROUP BY q")
      .selectExpr("q", "transform(top, t -> t.id) AS ids")
      .as[(Long, Seq[Long])].head()
    assert(top == ((1L, Seq(11L, 12L))))
  }

  test("kmv_minima / levenshtein_within are callable from SQL, match column API") {
    Tables.tune(spark)
    val km = spark.sql(
      "SELECT kmv_minima(h, 3) AS m FROM VALUES (9L),(2L),(7L),(2L),(5L) t(h)")
      .head().getSeq[Long](0)
    assert(km === Seq(2L, 5L, 7L), "k smallest distinct, ascending")
    val lv = spark.sql(
      "SELECT levenshtein_within('kitten', 'sitting', 10L) AS d, " +
        "levenshtein_within('kitten', 'sitting', 2L) AS capped")
      .as[(Long, Long)].head()
    assert(lv == ((3L, 3L)), "exact within bound; 2+1 sentinel above")
  }

  test("adc_score SQL function matches the element_at fold and the kernel") {
    Tables.tune(spark)
    // lut: 2 subspaces × 3 slots; codes pick slot 2 then slot 0
    val got = spark.sql(
      """SELECT adc_score(array(2, 0),
        |  array(array(1.0d, 2.0d, 3.0d), array(10.0d, 20.0d, 30.0d))) AS d""".stripMargin)
      .as[Double].head()
    assert(got == 13.0)
    val viaChain = spark.sql(
      """SELECT element_at(array(1.0d,2.0d,3.0d), 2+1)
        |     + element_at(array(10.0d,20.0d,30.0d), 0+1) AS d""".stripMargin)
      .as[Double].head()
    assert(got == viaChain)
  }

  test("strip_markup SQL function equals the column API on real documents") {
    Tables.tune(spark)
    val html = Seq("<p>A &amp; B</p>  <div>c&nbsp;&lt;d&gt;</div>").toDF("t")
    html.createOrReplaceTempView("html_docs")
    val viaSql = spark.sql("SELECT strip_markup(t) AS s FROM html_docs").as[String].head()
    assert(viaSql == "A & B c <d>")
    val viaCol = html.select(
      graft.operators.TextAnalysis.stripMarkup(col("t")).as("s")).as[String].head()
    assert(viaSql == viaCol)
  }

  test("line_key128 SQL function reproduces line dedup's shuffle key") {
    Tables.tune(spark)
    val got = spark.sql(
      "SELECT line_key128('hello').h1 AS h1, line_key128('hello').h2 AS h2")
      .as[(Long, Long)].head()
    val expect = spark.sql(
      "SELECT xxhash64('hello') AS h1, xxhash64(1L, 'hello') AS h2")
      .as[(Long, Long)].head()
    assert(got == expect)
  }

  test("adc_score stays inside WholeStageCodegen on a real scan") {
    Tables.tune(spark)
    val lut = array(array(lit(1.0), lit(2.0)), array(lit(3.0), lit(4.0)))
    val plan = Tables.t(spark, sfDir, "documents")
      .select(graft.functions.Fns.adcScore(
        array((col("doc_id") % 2).cast("int"), lit(0)), lut).as("d"))
      .queryExecution.executedPlan
    val wscg = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wscg.nonEmpty, plan.toString)
  }

  test("generator result matches the relational x1 formulation on real data") {
    // explode_session over per-user event groups ≡ the begin/hit/end shape
    val ev = Tables.t(spark, sfDir, "events")
    val sessions = ev
      .groupBy("user_id")
      .agg(min(unix_seconds(col("ts").cast("timestamp"))).as("start_sec"),
        sort_array(collect_list(struct(
          unix_seconds(col("ts").cast("timestamp")).as("t"),
          col("event_type").as("name")))).as("ordered"))
      .withColumn("hits", expr(
        "transform(ordered, h -> struct(h.name AS name, (h.t - start_sec) * 1000 AS offset_ms))"))
    sessions.createOrReplaceTempView("user_sessions")
    val exploded = spark.sql(
      """SELECT user_id, e.event, e.time_s
        |FROM user_sessions
        |LATERAL VIEW explode_session(start_sec, hits) e AS event, time_s""".stripMargin)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    // hits whose offset is exactly 0 get a +1s bump → still one row per event
    assert(exploded.count() == nEvents + 2 * nUsers)
  }

  test("common_prefix_len SQL function matches the kernel, caps, and codegen-folds") {
    Tables.tune(spark)
    val got = spark.sql(
      """SELECT common_prefix_len('abcdef', 'abcxyz', 64) AS a,
        |  common_prefix_len('same', 'same', 2) AS b,
        |  common_prefix_len('', 'x', 8) AS c""".stripMargin)
      .as[(Int, Int, Int)].head()
    assert(got == ((3, 2, 0)))
  }

  test("count_min SQL aggregate matches the column API matrix exactly") {
    Tables.tune(spark)
    val ev = "parquet.`/root/testdata/sf0.001/events.parquet`"
    val sqlArr = spark.sql(
      s"SELECT count_min(CAST(user_id AS STRING), 3, 16) FROM $ev")
      .head().getSeq[Long](0)
    val colArr = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .agg(graft.functions.Fns.countMin(col("user_id"), 3, 16))
      .head().getSeq[Long](0)
    assert(sqlArr == colArr && sqlArr.sum == 3 * sqlArr.sum / 3)
    assert(sqlArr.slice(0, 16).sum == sqlArr.slice(16, 32).sum)
  }

  test("hll_registers SQL aggregate matches the column API bit-for-bit") {
    Tables.tune(spark)
    val ev = "parquet.`/root/testdata/sf0.001/events.parquet`"
    val sqlRegs = spark.sql(
      s"SELECT hll_registers(CAST(user_id AS STRING), 32) FROM $ev")
      .head().getSeq[Int](0)
    val colRegs = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .agg(graft.functions.Fns.hllRegisters(col("user_id"), 32))
      .head().getSeq[Int](0)
    assert(sqlRegs == colRegs && sqlRegs.length == 32)
    assert(sqlRegs.forall(r => r >= 0 && r <= 31))
  }

  test("multi_pattern_count SQL function parses its CSV pattern literal " +
      "and matches the column API") {
    Tables.tune(spark)
    import spark.implicits._
    val got = spark.sql(
      """SELECT multi_pattern_count('slow art part table hash',
        |  'slow, art, table hash') AS n""".stripMargin)
      .as[Long].head()
    assert(got == 3L) // slow + standalone art + phrase; 'part' no
    val err = intercept[Exception] {
      spark.sql("SELECT multi_pattern_count('x', 7)").collect()
    }
    assert(err.getMessage.contains("comma-separated string literal") ||
      err.getMessage.toLowerCase.contains("cannot resolve"))
  }

  test("misra_gries SQL aggregate honors the summary guarantees") {
    Tables.tune(spark)
    // events' user_id stream: ~150 uniform keys vs k=4 counters — pure
    // eviction pressure; guarantees must still hold
    val row = spark.sql(
      """SELECT misra_gries(CAST(user_id AS STRING), 4) AS mg, count(*) AS n
        |FROM parquet.`/root/testdata/sf0.001/events.parquet`""".stripMargin)
      .head()
    val mg = row.getMap[String, Long](0)
    val n = row.getLong(1)
    assert(mg.size <= 3)
    mg.foreach { case (_, est) => assert(est >= 1L && est <= n) }
  }
}
