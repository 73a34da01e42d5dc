package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.v2.FetcherRegistry
import graft.sources.Extract.Fetcher

/** Dev drive: read the DSv2 HTTP export source end-to-end with a local
  * fake transport and print what the scan produced.
  */
object DriveDsv2 {
  def main(args: Array[String]): Unit = {
    val spark = Tables.tune(SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    FetcherRegistry.put("drive", new Fetcher {
      def get(url: String): Option[Array[Byte]] = {
        println(s"FETCH $url")
        Some(s"""{"event_type":"click","user_id":"u1"}""".getBytes)
      }
    })
    val df = spark.read.format("graft.sources.v2.HttpExportSource")
      .option("baseUrl", "https://api.example")
      .option("start", "20240101T00").option("end", "20240101T04")
      .option("fetcherKey", "drive").load()
      .filter(col("hour") >= "20240101T02")
    df.show(10, false)
    println(s"ROWS=${df.count()} PARTITIONS=${df.rdd.getNumPartitions}")
    spark.stop()
  }
}
