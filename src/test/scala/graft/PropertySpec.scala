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

  test("SegmentationWhere: 60 random expression trees parse to the hand-built predicate") {
    import org.apache.spark.sql.Column
    import graft.functions.SegmentationWhere
    // fixture: 200 rows with a mixed-type string property bag
    val rows = (0 until 200).map { i =>
      (i.toLong, Map(
        "k" -> (if (i % 7 == 0) null else (i % 40).toString),
        "p" -> Seq("pro", "free", "trial")(i % 3),
        "b" -> (i % 2 == 0).toString,
        "path" -> s"/p/${i % 5}/x"))
    }
    val df = rows.toDF("id", "properties")
    val props = col("properties")

    // atom pool: (where-string fragment, equivalent hand-built Column)
    def atom(): (String, Column) = rng.nextInt(8) match {
      case 0 =>
        val v = rng.nextInt(40)
        (s"""properties["k"] > $v""", props.getItem("k").cast("double") > v.toDouble)
      case 1 =>
        val v = Seq("pro", "free", "trial")(rng.nextInt(3))
        (s"""properties["p"] == "$v"""", props.getItem("p") === v)
      case 2 => ("""defined(properties["k"])""", props.getItem("k").isNotNull)
      case 3 =>
        val s0 = rng.nextInt(10).toString
        (s"""contains(properties["k"], "$s0")""", props.getItem("k").contains(s0))
      case 4 =>
        val s0 = s"/p/${rng.nextInt(5)}"
        (s"""has_prefix(properties["path"], "$s0")""", props.getItem("path").startsWith(s0))
      case 5 =>
        (s"""properties["p"] in ["pro", "trial"]""",
          props.getItem("p").isin("pro", "trial"))
      case 6 =>
        val s0 = Seq("ro", "ree", "ial")(rng.nextInt(3))
        (s""""$s0" in properties["p"]""", props.getItem("p").contains(s0))
      case _ =>
        (s"""boolean(properties["b"]) == true""", props.getItem("b") === "true")
    }
    // random tree; children of and/or are parenthesized so the test
    // exercises atoms+combinators (precedence has its own oracle query)
    def tree(depth: Int): (String, Column) =
      if (depth == 0) atom()
      else rng.nextInt(4) match {
        case 0 => val (s0, c) = tree(depth - 1); (s"not ($s0)", !c)
        case 1 =>
          val (sa, ca) = tree(depth - 1); val (sb, cb) = tree(depth - 1)
          (s"($sa) and ($sb)", ca && cb)
        case 2 =>
          val (sa, ca) = tree(depth - 1); val (sb, cb) = tree(depth - 1)
          (s"($sa) or ($sb)", ca || cb)
        case _ => atom()
      }
    (0 until 60).foreach { i =>
      val (s0, expected) = tree(2)
      val got = df.filter(SegmentationWhere.parse(s0, props))
        .select("id").as[Long].collect().toSet
      val want = df.filter(expected).select("id").as[Long].collect().toSet
      assert(got == want, s"expr #$i: $s0")
    }
  }

  // ---- scalacheck-generated domains (fixed seed) for the sampling /
  // ---- sharding / packing contracts the oracles silently rely on -------

  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed
  import graft.operators.{Packing, Sampling}

  private def genSamples[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(42L))

  /** Arbitrary-precision model of the spread hash behind unitHash/shardOf. */
  private def hashModel(s: String): BigInt = {
    var h = BigInt(0)
    for (b <- s.getBytes("UTF-8")) h = (h * 31 + (b & 0xff)) % Fns.HashMod
    h
  }

  test("property: shardOf equals the exact BigInt quotient, in range, total") {
    val keys = genSamples(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue), 300).distinct
    for (n <- Seq(1, 7, 16, 999)) {
      val got = keys.toDF("k")
        .select(col("k"), Sampling.shardOf(col("k"), n).as("s"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      for (k <- keys) {
        val kk = (hashModel(k.toString) * 1315423911L + BigInt(2654435761L))
          .mod(BigInt(Fns.HashMod))
        val expected = (kk * n / Fns.HashMod).toInt
        assert(got(k) == expected, s"shard($k, $n)")
        assert(got(k) >= 0 && got(k) < n)
      }
    }
  }

  test("property: unitHash lands in [0, 1) on random keys") {
    val nonEmptyAscii = Gen.chooseNum(1, 24).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(32, 126).map(_.toChar)).map(_.mkString))
    val keys = genSamples(nonEmptyAscii, 300).distinct
    keys.toDF("k").select(Sampling.unitHash(col("k")).as("u")).collect()
      .foreach { r =>
        val u = r.getDouble(0)
        assert(u >= 0.0 && u < 1.0)
      }
  }

  test("property: hashSplit assigns every key exactly one split, partition-independent") {
    val keys = genSamples(Gen.chooseNum(0L, Long.MaxValue), 500).distinct
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val df = keys.toDF("k")
    val assigned = Sampling.hashSplit(df, "k", splits)
    assert(assigned.count() == keys.size)
    assert(assigned.filter(!col("split").isin("train", "val", "test")).count() == 0)
    val a = assigned.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(df.repartition(3), "k", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "split assignment must not depend on partitioning")
  }

  test("property: packed sequences respect the token budget for any doc mix") {
    val docs = genSamples(Gen.zip(Gen.chooseNum(1L, 120L), Gen.chooseNum(0, 3)), 400)
      .zipWithIndex.map { case ((nt, bucket), i) => (i.toLong, nt, bucket.toString) }
    val budget = 256L
    val packed = Packing.packSequences(
      docs.toDF("doc_id", "n_tokens", "bucket"), "doc_id", "n_tokens", "bucket", budget)
    val perSeq = packed.groupBy("bucket", "seq")
      .agg(sum("n_tokens").as("t")).collect()
    // a sequence may exceed the budget only by its LAST doc (first-fit:
    // a doc joins a sequence while the cumulative count is under budget)
    val maxDoc = docs.map(_._2).max
    perSeq.foreach { r =>
      assert(r.getLong(2) < budget + maxDoc,
        s"bucket ${r.getString(0)} seq ${r.getLong(1)} overflows: ${r.getLong(2)}")
    }
    assert(packed.count() == docs.size)
  }
}
