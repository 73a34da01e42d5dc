package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Ranks

/** Round-9 operator specs: the distributed exact rank/ntile. */
class Round9OpsSpec extends SparkSpec {

  private def randomDf(n: Int, seed: Int) = {
    val r = new scala.util.Random(seed)
    import spark.implicits._
    // skewed leading column (heavy ties) + unique tiebreaker
    (1 to n).map(i => (i.toLong, r.nextInt(7), r.nextInt(1000)))
      .toDF("id", "grp", "v")
  }

  test("Ranks.ntile is bit-identical to Spark's single-partition ntile") {
    val df = randomDf(997, 42)
    for (k <- Seq(1, 3, 32, 256, 1500)) { // 1500 > n exercises the n<k branch
      val want = df.withColumn("t",
        ntile(k).over(Window.orderBy(col("grp"), col("id"))))
      val got = Ranks.ntile(df, k, Seq("grp", "id"), "t")
      assert(got.schema("t").dataType == want.schema("t").dataType)
      val diff = got.join(want, Seq("id"), "inner")
        .filter(got("t") =!= want("t")).count()
      assert(diff == 0, s"k=$k mismatch on $diff rows")
    }
  }

  test("Ranks.ntile with a caller-supplied monotone bucket matches too") {
    val df = randomDf(500, 7)
    val want = df.withColumn("t", ntile(32).over(Window.orderBy(col("v"), col("id"))))
    // a deliberately COARSE and UNBALANCED monotone bucketing: exactness
    // must not depend on bucket quality, only monotonicity
    val got = Ranks.ntile(df, 32, Seq("v", "id"), "t",
      bucketOf = Some(shiftright(col("v"), 7)))
    val diff = got.join(want, Seq("id")).filter(got("t") =!= want("t")).count()
    assert(diff == 0)
  }

  test("Ranks.ntile refuses an unbounded bucket expression loudly") {
    val df = spark.range(Ranks.MaxRankBuckets + 10).toDF("id")
    val e = intercept[IllegalArgumentException] {
      Ranks.ntile(df, 4, Seq("id"), "t", bucketOf = Some(col("id")))
    }
    assert(e.getMessage.contains("distinct buckets"))
  }

  test("quantileBucket guards its driver materialization bounds") {
    val df = spark.range(100).toDF("id")
    intercept[IllegalArgumentException] { Ranks.quantileBucket(df, "id", 1) }
    intercept[IllegalArgumentException] {
      Ranks.quantileBucket(df, "id", Ranks.MaxRankBuckets + 1)
    }
  }

  test("Ranks.ntile never plans a partition-less window") {
    val df = randomDf(300, 3)
    val got = Ranks.ntile(df, 16, Seq("v", "id"), "t")
    got.count()
    assert(partitionlessWindows(got).isEmpty)
  }
}
