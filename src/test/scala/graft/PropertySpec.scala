package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Fns
import graft.operators.{Packing, Sampling}

/** Property-based checks (scalacheck generators, fixed seed for CI
  * determinism) for the engine's portable-hash and packing contracts —
  * the invariants every oracle comparison silently relies on. Each
  * property evaluates ONE DataFrame over the whole generated sample so
  * the suite stays fast.
  */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(42L))

  private val asciiString: Gen[String] =
    Gen.chooseNum(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(32, 126).map(_.toChar)).map(_.mkString))

  /** Pure-Scala model of [[Fns.rollingHash]] / the codegen'd RollingHash:
    * fold UTF-8 bytes as (h*31 + byte) mod 1e9+7, null/empty → 0.
    */
  private def hashModel(s: String): Long = {
    if (s == null || s.isEmpty) return 0L
    var h = BigInt(0)
    for (b <- s.getBytes("UTF-8")) h = (h * 31 + (b & 0xff)) % Fns.HashMod
    h.toLong
  }

  test("property: codegen'd rolling_hash equals the arbitrary-precision model") {
    import spark.implicits._
    val strs = ("" :: samples(asciiString, 300)).distinct
    val got = strs.toDF("s")
      .select(col("s"), Fns.rollingHash(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (s <- strs) assert(got(s) == hashModel(s), s"hash mismatch for '$s'")
  }

  test("property: shardOf equals the exact BigInt quotient, in range, total") {
    import spark.implicits._
    val keys = samples(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue), 300).distinct
    for (n <- Seq(1, 7, 16, 999)) {
      val got = keys.toDF("k")
        .select(col("k"), Sampling.shardOf(col("k"), n).as("s"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      for (k <- keys) {
        val kk = (BigInt(hashModel(k.toString)) * 1315423911L + BigInt(2654435761L))
          .mod(BigInt(Fns.HashMod))
        val expected = (kk * n / Fns.HashMod).toInt
        assert(got(k) == expected, s"shard($k, $n)")
        assert(got(k) >= 0 && got(k) < n)
      }
    }
  }

  test("property: unitHash lands in [0, 1) and is injective-per-key-stable") {
    import spark.implicits._
    val nonEmptyAscii = Gen.chooseNum(1, 24).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(32, 126).map(_.toChar)).map(_.mkString))
    val keys = samples(nonEmptyAscii, 300).distinct
    val twice = keys.toDF("k")
      .select(col("k"), Sampling.unitHash(col("k")).as("u1"),
        Sampling.unitHash(col("k")).as("u2"))
      .collect()
    twice.foreach { r =>
      val u = r.getDouble(1)
      assert(u >= 0.0 && u < 1.0, s"unitHash out of range for '${r.getString(0)}'")
      assert(u == r.getDouble(2))
    }
  }

  test("property: hashSplit assigns every key exactly one split (totality)") {
    import spark.implicits._
    val keys = samples(Gen.chooseNum(0L, Long.MaxValue), 500).distinct
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val df = keys.toDF("k")
    val assigned = Sampling.hashSplit(df, "k", splits)
    assert(assigned.count() == keys.size)
    assert(assigned.filter(!col("split").isin("train", "val", "test")).count() == 0)
    // and deterministically: a second evaluation produces the same map
    val a = assigned.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(df.repartition(3), "k", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "split assignment must not depend on partitioning")
  }

  test("property: packed sequences respect the token budget for any doc mix") {
    import spark.implicits._
    val docs = samples(Gen.zip(Gen.chooseNum(1L, 120L), Gen.chooseNum(0, 3)), 400)
      .zipWithIndex.map { case ((nt, bucket), i) => (i.toLong, nt, bucket.toString) }
    val budget = 256L
    val packed = Packing.packSequences(
      docs.toDF("doc_id", "n_tokens", "bucket"), "doc_id", "n_tokens", "bucket", budget)
    val perSeq = packed.groupBy("bucket", "seq")
      .agg(sum("n_tokens").as("t")).collect()
    // a sequence may exceed the budget only by its LAST doc (first-fit
    // semantics: a doc starts a sequence while cum < budget) — so every
    // sequence's total stays under budget + max single doc
    val maxDoc = docs.map(_._2).max
    perSeq.foreach { r =>
      assert(r.getLong(2) < budget + maxDoc,
        s"bucket ${r.getString(0)} seq ${r.getLong(1)} overflows: ${r.getLong(2)}")
    }
    // nothing dropped
    assert(packed.count() == docs.size)
  }
}
