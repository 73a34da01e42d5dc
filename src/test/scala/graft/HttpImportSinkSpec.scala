package graft

import org.apache.spark.sql.functions._
import graft.sinks.v2.{HttpImportSink, TransportRegistry}

class HttpImportSinkSpec extends SparkSpec {
  import spark.implicits._

  test("DSv2 write: batched gzip POSTs with commit-side count reconciliation") {
    RecordingTransport.bodies.clear()
    RecordingTransport.failFirstN.set(0)
    TransportRegistry.put("rec", new RecordingTransport)
    val shaped = (1 to 120).toDF("i")
      .select(to_json(struct(col("i"))).as("json"))
      .repartition(3)
    shaped.write
      .format("graft.sinks.v2.HttpImportSink")
      .option("url", "http://test/import")
      .option("maxRecordsPerBatch", "50")
      .option("transportKey", "rec")
      .mode("append")
      .save()
    val (records, batches, failed) = HttpImportSink.lastCommit.get
    assert(records == 120 && failed == 0)
    assert(batches >= 3) // ≥1 per partition, caps respected
    val sent = RecordingTransport.bodies.toArray(Array.empty[Array[Byte]])
    val n = sent.map { b =>
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
      new String(in.readAllBytes(), "UTF-8").count(_ == '{')
    }.sum
    assert(n == 120)
  }

  test("DSv2 write: transport failures surface in commit counts, not silently") {
    RecordingTransport.bodies.clear()
    RecordingTransport.failFirstN.set(1000)
    TransportRegistry.put("rec", new RecordingTransport)
    (1 to 5).toDF("i").select(to_json(struct(col("i"))).as("json"))
      .coalesce(1)
      .write.format("graft.sinks.v2.HttpImportSink")
      .option("url", "http://test/import")
      .option("maxRetries", "1").option("initialBackoffMs", "1")
      .option("transportKey", "rec")
      .mode("append").save()
    val (records, _, failed) = HttpImportSink.lastCommit.get
    assert(records == 0 && failed == 1)
  }
}
