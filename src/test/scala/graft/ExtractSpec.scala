package graft

import java.nio.file.Files
import java.time.LocalDateTime
import graft.sources.{Extract, Sources}
import graft.model.Model

class ExtractSpec extends SparkSpec {

  class FakeAmpFetcher extends Extract.Fetcher {
    val urls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def get(url: String): Option[Array[Byte]] = {
      urls.add(url)
      // hour 03 has no data (reference: skip empty export hours)
      if (url.contains("start=20210917T03")) None
      else Some(
        s"""{"event_type":"e","user_id":"u","device_id":"d","amplitude_id":1,"event_time":"2021-09-17 12:00:00","event_properties":{},"user_properties":{}}"""
          .getBytes("UTF-8"))
    }
  }

  test("amplitude extract: hour-partitioned fetch to staging, empty hours skipped") {
    val dir = Files.createTempDirectory("amp-extract").toString
    val fetcher = new FakeAmpFetcher
    val staged = Extract.amplitudeExport("https://amplitude.example",
      LocalDateTime.of(2021, 9, 17, 0, 0), LocalDateTime.of(2021, 9, 17, 6, 0),
      dir, fetcher)
    assert(fetcher.urls.size == 6) // one fetch per hour slice
    assert(staged.size == 5)       // hour 03 skipped
    assert(fetcher.urls.toArray.mkString.contains("start=20210917T00&end=20210917T01"))
    // staged dir reads as ONE distributed scan
    val df = Sources.staged(spark, dir, Model.amplitudeSchema)
    assert(df.count() == 5)
  }

  test("amplitude extract: ZIP body is unzipped to staging (S4), gz members read transparently") {
    val dir = Files.createTempDirectory("amp-zip-extract").toString
    val line =
      s"""{"event_type":"z","user_id":"u","device_id":"d","amplitude_id":1,"event_time":"2021-09-17 12:00:00","event_properties":{},"user_properties":{}}"""
    // build a real ZIP: one plain .json member + one nested .json.gz member
    val bos = new java.io.ByteArrayOutputStream()
    val zout = new java.util.zip.ZipOutputStream(bos)
    zout.putNextEntry(new java.util.zip.ZipEntry("a.json"))
    zout.write(line.getBytes("UTF-8")); zout.closeEntry()
    zout.putNextEntry(new java.util.zip.ZipEntry("123456/b.json.gz"))
    val gz = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(gz)
    g.write((line + "\n" + line).getBytes("UTF-8")); g.close()
    zout.write(gz.toByteArray); zout.closeEntry()
    zout.close()
    val zip = bos.toByteArray
    val fetcher = new Extract.Fetcher {
      def get(url: String): Option[Array[Byte]] = Some(zip)
    }
    val staged = Extract.amplitudeExport("https://amplitude.example",
      LocalDateTime.of(2021, 9, 17, 0, 0), LocalDateTime.of(2021, 9, 17, 1, 0),
      dir, fetcher)
    assert(staged.size == 2) // both members staged, nested path flattened
    assert(staged.exists(_.endsWith("export_20210917T00_a.json")))
    assert(staged.exists(_.endsWith("export_20210917T00_b.json.gz")))
    // staged dir reads as one scan; Spark decompresses the .gz member
    val df = Sources.staged(spark, dir, Model.amplitudeSchema)
    assert(df.count() == 3)
    assert(df.select("event_type").distinct().collect().map(_.getString(0)).toSeq == Seq("z"))
  }

  test("mixpanel export: where + event list pushed into the query string") {
    val dir = Files.createTempDirectory("mp-extract").toString
    var captured = ""
    val fetcher = new Extract.Fetcher {
      def get(url: String): Option[Array[Byte]] = { captured = url; Some("{}".getBytes) }
    }
    Extract.mixpanelExport("https://mp.example", "2021-01-01", "2021-01-31",
      Some("""defined(properties["$source"])"""), Seq("click", "view"), dir, fetcher)
    assert(captured.contains("from_date=2021-01-01"))
    assert(captured.contains("where=defined%28properties%5B%22%24source%22%5D%29"))
    assert(captured.contains("event=%5B%22click%22%2C%22view%22%5D"))
  }

  test("mixpanel engage: serial pagination stages one file per page until exhausted") {
    val dir = Files.createTempDirectory("engage-extract").toString
    val fetcher = new Extract.Fetcher {
      def get(url: String): Option[Array[Byte]] = {
        val page = "page=(\\d+)".r.findFirstMatchIn(url).get.group(1).toInt
        if (page < 3) Some((0 until 2).map(i =>
          s"""{"$$distinct_id":"u${page}_$i","$$properties":{"a":"1"}}""").mkString("\n").getBytes)
        else None
      }
    }
    val staged = Extract.mixpanelEngage("https://mp.example", dir, fetcher)
    assert(staged.size == 3)
    assert(spark.read.json(dir).count() == 6)
  }
}
