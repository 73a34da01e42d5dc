package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted final plan of one query. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val Array(dir, name) = args.take(2)
    val spark = Tables.tune(SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    df.count()
    df.explain("formatted")
    spark.stop()
  }
}
