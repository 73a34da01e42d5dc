package graft

import org.apache.spark.sql.SparkSession

/** Dev A/B: dd_ngram_jaccard with AQE broadcasts on vs off (off → identical
  * shuffle exchanges → ReuseExchange can collapse the shared shingle
  * index). `Test/runMain graft.ProfNgram <sfDir>`
  */
object ProfNgram {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    Tables.t(spark, dir, "region").count() // warm

    def run(tag: String): Unit = {
      val t0 = System.nanoTime
      val df = SparkEntry.queries("dd_ngram_jaccard")(spark, dir)
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      val reused = "ReusedExchange".r.findAllIn(plan).length
      println(f"PROF $tag ${(System.nanoTime - t0) / 1e9}%.2f s reused=$reused")
    }
    run("warmup")
    run("broadcast_on")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    run("broadcast_off")
    run("broadcast_off2")
    spark.stop()
  }
}
