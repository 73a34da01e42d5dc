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
}
