package graft

import org.apache.spark.sql.functions._
import graft.sources.Extract.Fetcher
import graft.sources.v2.FetcherRegistry

class HttpEngageSourceSpec extends SparkSpec {

  /** Fake engage API: 3 cohorts × (2 full pages + 1 short page) with the
    * reference's cursor protocol — session_id issued on the first call,
    * echoed page numbers, short page terminates (mixpanelETL.js:144-182).
    */
  private def mkFetcher(pageSize: Int): Fetcher = new Fetcher {
    def get(url: String): Option[Array[Byte]] = {
      EngageCalls.urls.add(url)
      val cohort = "%22id%22%3A(\\d+)".r.findFirstMatchIn(url).map(_.group(1)).getOrElse("0")
      val page = "&page=(\\d+)".r.findFirstMatchIn(url).map(_.group(1).toInt).getOrElse(0)
      // cursor must be threaded after page 0
      if (page > 0) assert(url.contains(s"session_id=sess-$cohort"), url)
      val n = if (page < 2) pageSize else 1 // short page ends the walk
      val results = (0 until n).map(i =>
        s"""{"$$distinct_id":"c${cohort}_p${page}_$i","$$properties":{"plan":"x"}}""")
      Some(
        s"""{"page":$page,"page_size":$pageSize,"session_id":"sess-$cohort",
           |"results":[${results.mkString(",")}]}""".stripMargin.getBytes("UTF-8"))
    }
  }

  private def read(pageSize: Int = 2) = spark.read
    .format("graft.sources.v2.HttpEngageSource")
    .option("baseUrl", "https://mp.example")
    .option("cohorts", "101, 102, 103")
    .option("pageSize", pageSize.toString)
    .option("fetcherKey", "engage-fetcher")
    .load()

  test("engage DSv2: one partition per cohort, executor-side cursor pagination") {
    FetcherRegistry.put("engage-fetcher", mkFetcher(pageSize = 2))
    EngageCalls.urls.clear()
    val df = read()
    // 3 cohorts × (2 + 2 + 1) profiles
    assert(df.count() == 15)
    assert(df.rdd.getNumPartitions == 3)
    // each cohort walked its own 3-page cursor chain
    assert(EngageCalls.urls.size == 9, EngageCalls.urls.toString)
    assert(df.select("slice").distinct().count() == 3)
  }

  test("engage DSv2: server page_size cap below the requested size must not truncate") {
    // Mixpanel caps page_size at 1000; here the server caps at 2 while the
    // client asks for 1000. Termination must follow the SERVER-reported
    // page_size (reference lastPageSize) — comparing against the request
    // would see every page as short and silently stop after page 0.
    FetcherRegistry.put("engage-fetcher", mkFetcher(pageSize = 2))
    EngageCalls.urls.clear()
    val df = read(pageSize = 1000)
    assert(df.count() == 15, "server-capped pages were truncated")
    assert(EngageCalls.urls.size == 9, EngageCalls.urls.toString)
  }

  test("engage DSv2: a mid-walk response without session_id keeps the cursor (capture-once)") {
    val fetcher = new Fetcher {
      def get(url: String): Option[Array[Byte]] = {
        EngageCalls.urls.add(url)
        val page = "&page=(\\d+)".r.findFirstMatchIn(url).map(_.group(1).toInt).getOrElse(0)
        if (page > 0) assert(url.contains("session_id=sess-x"), s"cursor dropped: $url")
        val n = if (page < 2) 2 else 1
        val results = (0 until n).map(i => s"""{"$$distinct_id":"p${page}_$i"}""")
        // session_id present ONLY on the first response
        val sess = if (page == 0) """"session_id":"sess-x",""" else ""
        Some(s"""{"page":$page,"page_size":2,$sess"results":[${results.mkString(",")}]}"""
          .getBytes("UTF-8"))
      }
    }
    FetcherRegistry.put("engage-capture-once", fetcher)
    EngageCalls.urls.clear()
    val df = spark.read.format("graft.sources.v2.HttpEngageSource")
      .option("baseUrl", "https://mp.example")
      .option("pageSize", "2")
      .option("fetcherKey", "engage-capture-once")
      .load()
    assert(df.count() == 5) // 2 + 2 + 1, one slice
    assert(EngageCalls.urls.size == 3, EngageCalls.urls.toString)
  }

  test("engage DSv2: slice predicate prunes cohorts before any HTTP call") {
    FetcherRegistry.put("engage-fetcher", mkFetcher(pageSize = 2))
    EngageCalls.urls.clear()
    val df = read().filter(col("slice") === "cohort:102")
    assert(df.count() == 5)
    assert(EngageCalls.urls.size == 3, EngageCalls.urls.toString) // only cohort 102's pages
    assert(EngageCalls.urls.toArray.mkString.contains("%22id%22%3A102"))
  }

  test("engage DSv2: profiles parse downstream and reshape via P12") {
    FetcherRegistry.put("engage-fetcher", mkFetcher(pageSize = 2))
    val parsed = read()
      .select(from_json(col("value"), graft.model.Model.engageSchema).as("r"))
      .select(col("r.`$distinct_id`").as("distinct_id"), col("r.`$properties`").as("properties"))
    assert(parsed.filter(col("distinct_id").startsWith("c101")).count() == 5)
    assert(parsed.select("properties").first().getMap[String, String](0)("plan") == "x")
  }

  test("engage DSv2: mid-pagination 5xx retries the SAME cursor URL, no dup/skip") {
    // page 1 of the walk fails once with a transient 503 before
    // succeeding — the retry must re-GET the identical URL (same
    // session_id + page, cursor not reset), so the stream has no
    // duplicated and no skipped profiles
    val failedOnce = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
    val flaky = new Fetcher {
      def get(url: String): Option[Array[Byte]] = {
        EngageCalls.urls.add(url)
        val page = "&page=(\\d+)".r.findFirstMatchIn(url).map(_.group(1).toInt).getOrElse(0)
        if (page == 1 && failedOnce.putIfAbsent(url, true) == null)
          throw new java.io.IOException("HTTP 503 Service Unavailable")
        val n = if (page < 2) 2 else 1
        val results = (0 until n).map(i => s"""{"$$distinct_id":"p${page}_$i"}""")
        Some(s"""{"page":$page,"page_size":2,"session_id":"sess-r",
             |"results":[${results.mkString(",")}]}""".stripMargin.getBytes("UTF-8"))
      }
    }
    FetcherRegistry.put("engage-flaky", new graft.sources.Extract.RetryingFetcher(flaky, 3))
    EngageCalls.urls.clear()
    val df = spark.read.format("graft.sources.v2.HttpEngageSource")
      .option("baseUrl", "https://mp.example")
      .option("pageSize", "2")
      .option("fetcherKey", "engage-flaky")
      .load()
    val ids = df.collect().map(_.getString(1)).toSeq
    assert(ids.size == 5, s"dup or skip after retry: $ids")
    assert(ids.distinct.size == 5, s"duplicated profiles after retry: $ids")
    // exactly one extra call (the failed attempt), and the retried URL is
    // byte-identical to the failed one
    val urls = EngageCalls.urls.toArray.map(_.toString).toSeq
    assert(urls.size == 4, urls.toString)
    val p1 = urls.filter(_.contains("&page=1"))
    assert(p1.size == 2 && p1.distinct.size == 1, s"retry URL differs: $p1")
  }

  test("engage DSv2: retry budget exhausts loudly, does not loop or swallow") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val dead = new Fetcher {
      def get(url: String): Option[Array[Byte]] = {
        val page = "&page=(\\d+)".r.findFirstMatchIn(url).map(_.group(1).toInt).getOrElse(0)
        if (page == 1) { attempts.incrementAndGet(); throw new java.io.IOException("HTTP 503") }
        Some("""{"page":0,"page_size":2,"session_id":"s",
             |"results":[{"$distinct_id":"a"},{"$distinct_id":"b"}]}""".stripMargin
          .getBytes("UTF-8"))
      }
    }
    FetcherRegistry.put("engage-dead", new graft.sources.Extract.RetryingFetcher(dead, 3))
    val df = spark.read.format("graft.sources.v2.HttpEngageSource")
      .option("baseUrl", "https://mp.example")
      .option("pageSize", "2")
      .option("fetcherKey", "engage-dead")
      .load()
    val e = intercept[Exception] { df.count() }
    // the transport failure reaches the task (Spark wraps it), with the
    // retry budget spent exactly — the outer layer is Spark task retry
    assert(attempts.get() == 3, s"expected 3 attempts, got ${attempts.get()}")
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => String.valueOf(c.getMessage).contains("503")), e.toString)
  }

  test("engage DSv2: re-running a slice restarts a fresh idempotent cursor walk") {
    // a Spark task retry re-creates the reader; the walk must restart at
    // page 0 with no session_id and reproduce the identical row set
    FetcherRegistry.put("engage-fetcher", mkFetcher(pageSize = 2))
    val df = read()
    val first = df.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    EngageCalls.urls.clear()
    val second = df.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(first == second, "re-walk is not idempotent")
    val urls = EngageCalls.urls.toArray.map(_.toString).toSeq
    // the re-run's first call per cohort carries no stale cursor state
    assert(urls.count(!_.contains("session_id=")) == 3, urls.toString)
    assert(urls.size == 9, urls.toString)
  }

  test("engage DSv2: where-slices plan one partition per expression") {
    FetcherRegistry.put("engage-fetcher", new Fetcher {
      def get(url: String): Option[Array[Byte]] = {
        EngageCalls.urls.add(url)
        Some("""{"page":0,"page_size":1000,"session_id":"s","results":[{"$distinct_id":"u"}]}"""
          .getBytes("UTF-8"))
      }
    })
    EngageCalls.urls.clear()
    val df = spark.read
      .format("graft.sources.v2.HttpEngageSource")
      .option("baseUrl", "https://mp.example")
      .option("whereSlices",
        """properties["$last_seen"] < "2021-06" ;; properties["$last_seen"] >= "2021-06"""")
      .option("fetcherKey", "engage-fetcher")
      .load()
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 2)
    val urls = EngageCalls.urls.toArray.mkString(" ")
    assert(urls.contains("where="))
  }
}

object EngageCalls {
  val urls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}
