package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling harness: `Test/runMain graft.Prof <sfDir> [query ...]`.
  * Times individual queries (twice: cold + warm) or ad-hoc expressions.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = Tables.tune(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime
      val n = f
      println(f"PROF $name ${(System.nanoTime - t0) / 1e9}%.2f s rows=$n")
    }

    if (names.isEmpty) {
      val ev = Tables.t(spark, dir, "events")
      time("baseline_count")(ev.count())
      val e2 = ev.withColumn("s", Tables.epochS(col("ts")).cast("string"))
      time("rlike_branch")(e2.select(graft.functions.Fns.normalizeEpochSeconds(col("s"))).agg(sum("normalizeepochseconds(s)")).count())
      time("sec_branch")(e2.select(graft.functions.Fns.normalizeEpochSeconds(col("s")).as("t")).agg(sum("t")).count())
      val e3 = ev.withColumn("s", date_format(col("ts").cast("timestamp"), "yyyy-MM-dd HH:mm:ss"))
      time("iso_branch")(e3.select(graft.functions.Fns.normalizeEpochSeconds(col("s")).as("t")).agg(sum("t")).count())
    }
    names.foreach { n =>
      time(s"$n cold")(SparkEntry.queries(n)(spark, dir).count())
      time(s"$n warm")(SparkEntry.queries(n)(spark, dir).count())
    }
    spark.stop()
  }
}
