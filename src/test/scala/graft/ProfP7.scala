package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables.epochS
import graft.functions.Fns

object ProfP7 {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("all")
    val spark = Tables.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val ev = Tables.t(spark, "/root/testdata/sf0.1", "events")
    def run(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime
      df.count()
      println(f"P7COMP $name ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    mode match {
      case "read" => run("read_only", ev.select("event_id"))
      case "sec" => run("sec", ev.select(Fns.normalizeEpochSeconds(epochS(col("ts")).cast("string"))))
      case "ms" => run("ms", ev.select(Fns.normalizeEpochSeconds((epochS(col("ts")) * 1000).cast("string"))))
      case "isofmt" => run("isofmt_only", ev.select(date_format(col("ts").cast("timestamp"), "yyyy-MM-dd HH:mm:ss")))
      case "iso" => run("iso", ev.select(Fns.normalizeEpochSeconds(date_format(col("ts").cast("timestamp"), "yyyy-MM-dd HH:mm:ss"))))
      case _ => run("all", SparkEntry.queries("p7_time_normalize")(spark, "/root/testdata/sf0.1"))
    }
    spark.stop()
  }
}
