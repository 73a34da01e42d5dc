package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling: where does p10_ga_hit_flatten spend its time?
  * `Test/runMain graft.ProfGa <sfDir>`
  */
object ProfGa {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime
      val n = f
      println(f"PROF $name ${(System.nanoTime - t0) / 1e9}%.2f s rows=$n")
    }

    val fx = queries.VendorPackOps.gaFixture(spark, dir, withHit = true)
    println("PROF fixture_partitions=" + fx.rdd.getNumPartitions)
    time("fixture_only")(fx.count())
    time("fixture_only2")(fx.count())
    val ev = operators.GaTransform.events(spark, fx)
    time("flatmap_events")(ev.count())
    time("flatmap_events2")(ev.count())
    time("full_p10")(SparkEntry.queries("p10_ga_hit_flatten")(spark, dir).count())
    time("full_p10_warm")(SparkEntry.queries("p10_ga_hit_flatten")(spark, dir).count())
    time("full_p5")(SparkEntry.queries("p5_ga_map_defaults")(spark, dir).count())
    spark.stop()
  }
}
