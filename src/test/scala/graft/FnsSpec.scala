package graft

import org.apache.spark.sql.functions._
import graft.functions.Fns

class FnsSpec extends SparkSpec {
  import spark.implicits._

  test("rollingHash matches the documented fold and handles empties") {
    val df = Seq("abc", "", "a", "hello world").toDF("s")
      .withColumn("h", Fns.rollingHash(col("s")))
    val got = df.select("s", "h").as[(String, Long)].collect().toMap
    def ref(s: String): Long = s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % Fns.HashMod)
    assert(got("abc") == ref("abc") && got("abc") == 96354L)
    assert(got("") == 0L)
    assert(got("a") == 97L)
    assert(got("hello world") == ref("hello world"))
  }

  test("shingles produces overlapping word n-grams") {
    val df = Seq("a b c d").toDF("s").withColumn("sh", Fns.shingles(col("s"), 3))
    val got = df.select("sh").as[Seq[String]].head
    assert(got == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("s").withColumn("sh", Fns.shingles(col("s"), 3))
      .select("sh").as[Seq[String]].head
    assert(short.isEmpty)
  }

  test("normalizeEpochSeconds: 13-digit ms heuristic + ISO parse") {
    val df = Seq("1631894400", "1631894400000", "2021-09-17 16:00:00").toDF("s")
      .withColumn("t", Fns.normalizeEpochSeconds(col("s")))
    val got = df.select("t").as[Long].collect()
    assert(got.toSet == Set(1631894400L))
  }

  test("coalesceNonEmpty treats empty string as missing") {
    val df = Seq(("", "dev1"), ("u1", "dev2"), (null, "dev3")).toDF("u", "d")
      .withColumn("id", Fns.coalesceNonEmpty(col("u"), col("d")))
    assert(df.select("id").as[String].collect().toSeq == Seq("dev1", "u1", "dev3"))
  }

  test("mapMergeLastWins: later map wins on key conflict (JS spread)") {
    val df = Seq(1).toDF("x").select(
      Fns.mapMergeLastWins(
        map(lit("a"), lit("1"), lit("b"), lit("2")),
        map(lit("b"), lit("99"))
      ).as("m"))
    val got = df.select("m").as[Map[String, String]].head
    assert(got == Map("a" -> "1", "b" -> "99"))
  }

  test("mpInsertId is deterministic and distinct across rows") {
    val df = Seq((1L, "click"), (1L, "click"), (2L, "view")).toDF("id", "ev")
      .select(Fns.mpInsertId(col("id"), col("ev")).as("h"))
    val got = df.as[String].collect()
    assert(got(0) == got(1) && got(0) != got(2))
    assert(got(0).matches("[0-9a-f]{32}"))
  }

  test("cosine of identical vectors is 1") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
      .select(Fns.cosine(col("a"), col("b")).as("c"))
    assert(math.abs(df.as[Double].head - 1.0) < 1e-12)
  }

  test("l2Dist matches the HOF fold bit-for-bit") {
    val df = Seq(
      (Seq(1.0, -2.5, 3.25), Seq(0.5, 2.0, -1.75)),
      (Seq(0.1, 0.2, 0.3), Seq(0.1, 0.2, 0.3))
    ).toDF("a", "b")
    val got = df.select(
      Fns.l2Dist(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, t) => acc + t).as("hof"))
      .as[(Double, Double)].collect()
    got.foreach { case (fast, hof) => assert(fast == hof) } // exact equality
  }

  test("topKByScore equals the row_number window formulation (ties, merges, small groups)") {
    // deterministic pseudo-random scores WITH ties; many partitions so the
    // partial-aggregation merge path is exercised
    val rows = (0 until 2000).map { i =>
      val q = i % 7
      val score = ((i * 31 + q * 17) % 13) / 13.0 // heavy ties per group
      (q.toLong, i.toLong, score)
    }
    val df = rows.toDF("query_id", "neighbor_id", "cos").repartition(16)
    val viaAgg = df.groupBy("query_id")
      .agg(Fns.topKByScore(col("cos"), col("neighbor_id"), 5).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("r", "t")))
      .select(col("query_id"), (col("r") + 1).as("rank"),
        col("t.id").as("neighbor_id"), col("t.score").as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos"))
    assert(viaAgg.except(viaWindow).isEmpty && viaWindow.except(viaAgg).isEmpty)
    // a group smaller than k yields all its rows
    val small = Seq((1L, 10L, 0.5), (1L, 11L, 0.9)).toDF("query_id", "neighbor_id", "cos")
    val got = small.groupBy("query_id")
      .agg(Fns.topKByScore(col("cos"), col("neighbor_id"), 5).as("top"))
      .select(explode(col("top")).as("t")).select("t.id").as[Long].collect().toSeq
    assert(got == Seq(11L, 10L)) // best-first
  }

  test("topKByScoreDistinct: dedup in add, merge, serde, and after eviction") {
    import graft.functions.TopKByScore
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = TopKByScore(Literal(0.0d), Literal(0L), k = 2, distinctIds = true)

    // add-path dedup: a re-seen id (same score — the caller contract) is
    // dropped, whichever copy arrived first
    val b = agg.createAggregationBuffer()
    b.add(0.5, 7L); b.add(0.5, 7L); b.add(0.5, 7L)
    assert(b.size == 1)

    // eviction then rediscovery: an evicted id is NOT permanently banned —
    // contains() reflects current membership only; the heap then rules on
    // score like the window formulation would
    val e = agg.createAggregationBuffer()
    e.add(0.1, 1L); e.add(0.2, 2L) // full (k=2)
    e.add(0.3, 3L)                 // evicts (0.1, 1)
    e.add(0.1, 1L)                 // rediscovered: admitted to the heap test, loses on score
    assert(e.sortedBestFirst.toSeq == Seq((0.3, 3L), (0.2, 2L)))
    e.add(0.25, 3L) // would violate same-id-same-score; held copy wins (documented)
    assert(e.sortedBestFirst.toSeq == Seq((0.3, 3L), (0.2, 2L)))

    // merge-path dedup: merge funnels through the same add()
    val m1 = agg.createAggregationBuffer()
    m1.add(0.5, 7L)
    val m2 = agg.createAggregationBuffer()
    m2.add(0.5, 7L); m2.add(0.4, 8L)
    val merged = agg.merge(m1, m2)
    assert(merged.sortedBestFirst.toSeq == Seq((0.5, 7L), (0.4, 8L)))

    // serde round-trip preserves contents AND the distinct flag
    val back = agg.deserialize(agg.serialize(merged))
    assert(back.sortedBestFirst.toSeq == merged.sortedBestFirst.toSeq)
    back.add(0.5, 7L) // still deduped after deserialize
    assert(back.sortedBestFirst.toSeq == Seq((0.5, 7L), (0.4, 8L)))

    // DataFrame-level: duplicated candidates (same (id, score) repeated,
    // many partitions so merge runs) equal the window over distinct rows
    val rows = (0 until 3000).map { i =>
      val q = i % 5
      val id = i % 40
      val score = ((id * 31 + q * 17) % 13) / 13.0
      (q.toLong, id.toLong, score) // each (q, id) appears ~15×, identical score
    }
    val df = rows.toDF("query_id", "neighbor_id", "cos").repartition(16)
    val viaAgg = df.groupBy("query_id")
      .agg(Fns.topKByScoreDistinct(col("cos"), col("neighbor_id"), 5).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("r", "t")))
      .select(col("query_id"), (col("r") + 1).as("rank"),
        col("t.id").as("neighbor_id"), col("t.score").as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    val viaWindow = df.distinct().withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos"))
    assert(viaAgg.except(viaWindow).isEmpty && viaWindow.except(viaAgg).isEmpty)
  }
}
