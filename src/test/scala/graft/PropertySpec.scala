package graft

import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Property tests for the transform-pack invariants SURVEY §5 calls out:
  * time-unit heuristic (P7), insert-id determinism (P8), spread precedence
  * (P9), rolling-hash portability. Seeded random domains (deterministic),
  * each property evaluated over the whole sample in one Spark pass.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(42)
  private def asciiStr(max: Int): String = {
    val n = rng.nextInt(max)
    (0 until n).map(_ => (32 + rng.nextInt(95)).toChar).mkString
  }

  test("P7: epoch seconds and millis of the same instant normalize equally (200 samples)") {
    // domain = instants after 2001-09 (epoch ms ≥ 1e12): the reference's
    // 13-digit heuristic (csvETL.js:81-90) misclassifies earlier millis
    // by design, and we inherit that contract
    val epochs = Seq.fill(200)(1100000000L + math.abs(rng.nextLong() % 2900000000L))
    val df = epochs.map(e => (e, e.toString, (e * 1000).toString)).toDF("e", "s", "ms")
      .select(col("e"),
        Fns.normalizeEpochSeconds(col("s")).as("a"),
        Fns.normalizeEpochSeconds(col("ms")).as("b"))
    assert(df.filter(col("a") =!= col("e") || col("b") =!= col("e")).isEmpty)
  }

  test("P8: insert id deterministic, field-order-sensitive (200 samples)") {
    val pairs = Seq.fill(200)((asciiStr(20).replace("|", "_"), asciiStr(20).replace("|", "_")))
      .filter { case (a, b) => a != b }
    val df = pairs.toDF("a", "b").select(col("a"), col("b"),
      Fns.mpInsertId(col("a"), col("b")).as("ab"),
      Fns.mpInsertId(col("a"), col("b")).as("ab2"),
      Fns.mpInsertId(col("b"), col("a")).as("ba"))
    assert(df.filter(col("ab") =!= col("ab2")).isEmpty)
    assert(df.filter(col("ab") === col("ba")).isEmpty) // '|'-escaped fields
  }

  test("P9: later map wins on every key (100 samples)") {
    def m(): Map[String, String] =
      Seq.fill(rng.nextInt(5))(Seq("a", "b", "c", "d")(rng.nextInt(4)) -> asciiStr(6)).toMap
    val samples = Seq.fill(100)((m(), m()))
    samples.grouped(25).foreach { group =>
      val df = group.toDF("m1", "m2")
        .select(col("m1"), col("m2"), Fns.mapMergeLastWins(col("m1"), col("m2")).as("got"))
      df.as[(Map[String, String], Map[String, String], Map[String, String])]
        .collect().foreach { case (m1, m2, got) =>
          assert(got == m1 ++ m2, s"$m1 ++ $m2 => $got")
        }
    }
  }

  test("rolling_hash native expression equals reference fold on random ASCII (500 samples)") {
    val samples = Seq.fill(500)(asciiStr(80))
    val got = samples.toDF("s")
      .select(col("s"), Fns.rollingHash(col("s")).as("h"))
      .as[(String, Long)].collect().toMap
    samples.foreach { s =>
      val ref = s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % Fns.HashMod)
      assert(got(s) == ref, s"mismatch for '$s'")
    }
  }
}
