package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Bucketing = the co-located-join strategy for repeated fact⋈fact joins at
  * 100 TB (SURVEY §4 partition pruning / §7 scale posture): bucketBy the
  * join key once at write time, and every subsequent join on that key
  * needs NO shuffle on either side.
  */
class BucketingSpec extends SparkSpec {

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.count() // finalize AQE
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeExec => 1
        case _ => 0
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case other => other.children
      }
      self + kids.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }

  test("bucketed tables join without shuffling either fact side") {
    // isolated SQLConf on the shared context; broadcast disabled so the
    // join strategy choice (shuffle vs bucket-colocated) is what's tested
    val spark2 = spark.newSession()
    Tables.tune(spark2)
    spark2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ord = Tables.t(spark2, sfDir, "orders")
      val li = Tables.t(spark2, sfDir, "lineitem")
      ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_b")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("lineitem_b")

      val joined = spark2.table("lineitem_b")
        .join(spark2.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("q"))
      val bucketedShuffles = shuffles(joined)

      val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("q"))
      val plainShuffles = shuffles(plain)

      // plain: shuffle both sides for the join; bucketed: zero join
      // shuffles (only the final small agg exchange remains)
      assert(plainShuffles >= 2, s"expected >=2 shuffles unbucketed, got $plainShuffles")
      assert(bucketedShuffles <= 1, s"expected <=1 shuffle bucketed, got $bucketedShuffles")

      // same results either way
      val a = joined.orderBy("o_orderpriority").collect().map(_.toString)
      val b = plain.orderBy("o_orderpriority").collect().map(_.toString)
      assert(a.sameElements(b))
    } finally {
      spark2.sql("DROP TABLE IF EXISTS orders_b")
      spark2.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
