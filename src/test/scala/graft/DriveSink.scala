package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sinks.v2.{HttpImportSink, TransportRegistry}
import graft.sinks.BatchedHttpSink.{HttpResponseLite, Transport}

/** Dev drive: push canonical events through the DSv2 HTTP import sink
  * with a logging local transport.
  */
object DriveSink {
  def main(args: Array[String]): Unit = {
    val spark = Tables.tune(SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    TransportRegistry.put("drive", new Transport {
      def post(url: String, body: Array[Byte], headers: Map[String, String]): HttpResponseLite = {
        val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(body))
        val json = new String(in.readAllBytes(), "UTF-8")
        println(s"POST $url gz=${body.length}B records=${json.count(_ == '{')} enc=${headers.get("Content-Encoding")}")
        HttpResponseLite(200, "ok")
      }
    })
    val ev = Tables.t(spark, "/root/testdata/sf0.001", "events").limit(4500)
    graft.sinks.Sinks.shapeMixpanelEvents(
      ev.select(col("event_type").as("event"),
        col("user_id").cast("string").as("distinct_id"),
        Tables.epochS(col("ts")).as("time"),
        md5(col("event_id").cast("string")).as("insert_id"),
        lit("demo").as("source"),
        org.apache.spark.sql.functions.map(lit("k"), col("props")).as("properties")))
      .repartition(2)
      .write.format("graft.sinks.v2.HttpImportSink")
      .option("url", "http://local/import")
      .option("maxRecordsPerBatch", "1000")
      .option("transportKey", "drive")
      .mode("append").save()
    println(s"COMMIT=${HttpImportSink.lastCommit}")
    spark.stop()
  }
}
