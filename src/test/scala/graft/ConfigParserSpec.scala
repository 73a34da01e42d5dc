package graft

import java.nio.file.Files

/** Reference-config compatibility: a toMixpanel user's JSON config parses
  * into our typed pipeline, and a full config-driven run works end-to-end.
  */
class ConfigParserSpec extends SparkSpec {

  test("reference csv config shape parses (configExample-csv.json surface)") {
    val cfg = ConfigParser.parse(
      """{
        |  "source": {
        |    "name": "csv",
        |    "params": {"filePath": "/data/events.csv", "event_name_col": "action",
        |               "distinct_id_col": "guid", "time_col": "time",
        |               "insert_id_col": "insert_id"},
        |    "options": {"ignore_cols": ["favoriteColor"], "create_profiles": true,
        |                "tag": "batch-1"}
        |  },
        |  "destination": {"name": "mixpanel", "project_id": "123", "token": "tok",
        |    "service_account_user": "u", "service_account_pass": "p",
        |    "options": {"is EU?": true}}
        |}""".stripMargin)
    val src = cfg.source.asInstanceOf[Pipeline.CsvSource]
    assert(src.path == "/data/events.csv")
    assert(src.roles == graft.operators.CsvTransform.CsvRoles(
      "action", "guid", "time", Some("insert_id"), Seq("favoriteColor"),
      Some("batch-1"), createProfiles = true))
    val dst = cfg.destination.asInstanceOf[Pipeline.HttpSink]
    assert(dst.vendor == "mixpanel")
    assert(dst.opts("project_id") == "123" && dst.opts("region") == "EU")
    assert(dst.opts("auth") == java.util.Base64.getEncoder.encodeToString("u:p".getBytes))
  }

  test("mixpanel config with where/event pushdown options parses") {
    val cfg = ConfigParser.parse(
      """{"source": {"name": "mixpanel",
        |  "params": {"token": "t", "secret": "s"},
        |  "options": {"path": "/staged/mp", "where": "defined(properties[\"$source\"])",
        |              "event": ["like", "share"]}},
        | "destination": {"name": "local", "path": "/tmp/out"}}""".stripMargin)
    val src = cfg.source.asInstanceOf[Pipeline.MixpanelStaged]
    assert(src.path == "/staged/mp")
    assert(src.where.contains("""defined(properties["$source"])"""))
    assert(src.events == Seq("like", "share"))
  }

  test("config-driven end-to-end run from a JSON file") {
    val dataDir = Files.createTempDirectory("cfg-data").toString
    Files.write(java.nio.file.Paths.get(dataDir, "e.csv"),
      "action,guid,time\nsignup,u1,1631894400\nview,u2,1631894401\n".getBytes)
    val outDir = Files.createTempDirectory("cfg-out").toString
    val cfgFile = Files.createTempDirectory("cfg").resolve("c.json")
    Files.write(cfgFile,
      s"""{"source": {"name": "csv",
         |  "params": {"filePath": "$dataDir", "event_name_col": "action",
         |             "distinct_id_col": "guid", "time_col": "time"},
         |  "options": {"create_profiles": true}},
         | "destination": {"name": "local", "path": "$outDir"}}""".stripMargin.getBytes)
    val report = Pipeline.run(spark, ConfigParser.parseFile(cfgFile.toString))
    assert(report.events == 2 && report.profiles == 2)
    assert(spark.read.json(s"$outDir/events").count() == 2)
  }

  test("unknown vendor names fail loudly (no switch fall-through)") {
    intercept[IllegalArgumentException] {
      ConfigParser.parse("""{"source": {"name": "vendorx"}, "destination": {"name": "local"}}""")
    }
    intercept[IllegalArgumentException] {
      ConfigParser.parse("""{"source": {"name": "csv", "params": {"filePath": "x"}},
        | "destination": {"name": "destx"}}""".stripMargin)
    }
  }
}
