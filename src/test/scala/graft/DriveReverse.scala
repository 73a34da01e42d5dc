package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.Files

/** Dev drive: mixpanel-staged → amplitude reverse sink, printing the wire
  * bodies the transport receives.
  */
object DriveReverse {
  def main(args: Array[String]): Unit = {
    val spark = Tables.tune(SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Files.createTempDirectory("rev").toString
    Files.write(java.nio.file.Paths.get(dir, "e.json"),
      """{"event":"buy","distinct_id":"u7","time":1700000100,"insert_id":"z","source":"mp","properties":{"p":"9"}}""".getBytes)
    RecordingTransport.bodies.clear()
    RecordingTransport.failFirstN.set(0)
    val report = Pipeline.run(spark, Pipeline.Config(
      Pipeline.MixpanelStaged(dir),
      Pipeline.HttpSink("amplitude", Map("api_key" -> "k"), new RecordingTransport)))
    val sent = RecordingTransport.bodies.toArray(Array.empty[Array[Byte]]).map { b =>
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
      new String(in.readAllBytes(), "UTF-8")
    }.mkString
    println(s"REVERSE_WIRE $sent")
    println(s"REVERSE_REPORT events=${report.events} sinkFailed=${report.sink.map(_.failedBatches)}")
    spark.stop()
  }
}
