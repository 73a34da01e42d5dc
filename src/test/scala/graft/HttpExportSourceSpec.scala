package graft

import org.apache.spark.sql.functions._
import graft.sources.Extract.Fetcher
import graft.sources.v2.FetcherRegistry

object CountingFetcher {
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

class HttpExportSourceSpec extends SparkSpec {
  import spark.implicits._

  private def mkFetcher(): Fetcher = new Fetcher {
    def get(url: String): Option[Array[Byte]] = {
      CountingFetcher.calls.add(url)
      val h = "start=(\\d{8}T\\d{2})".r.findFirstMatchIn(url).get.group(1)
      if (h == "20210917T02") None // empty hour
      else Some((0 until 3).map(i =>
        s"""{"event_type":"e$i","user_id":"u$i","hour":"$h"}""").mkString("\n").getBytes)
    }
  }

  private def read() = spark.read
    .format("graft.sources.v2.HttpExportSource")
    .option("baseUrl", "https://amp.example")
    .option("start", "20210917T00")
    .option("end", "20210917T06")
    .option("fetcherKey", "test-fetcher")
    .load()

  test("DSv2: one partition per hour, executor-side fetch, empty hours ok") {
    FetcherRegistry.put("test-fetcher", mkFetcher())
    CountingFetcher.calls.clear()
    val df = read()
    assert(df.count() == 5 * 3) // 6 hours, 1 empty
    assert(CountingFetcher.calls.size == 6)
    assert(df.rdd.getNumPartitions == 6)
  }

  test("DSv2: hour predicates prune partitions before any HTTP call") {
    FetcherRegistry.put("test-fetcher", mkFetcher())
    CountingFetcher.calls.clear()
    val df = read().filter(col("hour") >= "20210917T04")
    assert(df.count() == 2 * 3)
    // only the 2 surviving hour slices were fetched — pushdown observable
    // at the transport
    assert(CountingFetcher.calls.size == 2, CountingFetcher.calls.toString)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("2 hour partitions"), plan)
  }

  test("DSv2: raw lines parse downstream with from_json in Catalyst") {
    FetcherRegistry.put("test-fetcher", mkFetcher())
    val parsed = read()
      .select(col("hour"), from_json(col("value"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("event_type",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("user_id",
            org.apache.spark.sql.types.StringType)))).as("r"))
      .select("hour", "r.event_type", "r.user_id")
    assert(parsed.filter(col("event_type") === "e1").count() == 5)
  }
}
