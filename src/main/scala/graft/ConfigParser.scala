package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.operators.CsvTransform
import graft.sinks.BatchedHttpSink

/** JSON config surface compatible with the reference's config files
  * (examples/configExample-*.json in /root/reference; parsed at
  * index.js:29-47, dispatched at index.js:69-91).
  *
  *   {"source": {"name": "csv"|"amplitude"|"googleanalytics"|"mixpanel",
  *               "params": {...}, "options": {...}},
  *    "destination": {"name": "mixpanel"|..., "project_id": ..., ...}}
  *
  * A reference user's config parses directly; `path` (S11 pre-extracted
  * bypass — index.js:54-55) points a vendor source at staged local data
  * instead of live extraction. Jackson ships on the Spark classpath.
  */
object ConfigParser {

  def parseFile(path: String,
      transport: BatchedHttpSink.Transport = new BatchedHttpSink.JdkHttpTransport)
      : Pipeline.Config =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"), transport)

  def parse(json: String,
      transport: BatchedHttpSink.Transport = new BatchedHttpSink.JdkHttpTransport)
      : Pipeline.Config = {
    val root = new ObjectMapper().readTree(json)
    Pipeline.Config(parseSource(root.path("source")),
      parseDestination(root.path("destination"), transport))
  }

  private def str(n: JsonNode, field: String): Option[String] = {
    val v = n.path(field)
    if (v.isMissingNode || v.isNull) None else Some(v.asText())
  }

  private def parseSource(s: JsonNode): Pipeline.Source = {
    val params = s.path("params")
    val options = s.path("options")
    // staged-data bypass: options.path / params.path_to_data (index.js:54-55)
    def stagedPath: Option[String] =
      str(options, "path").orElse(str(params, "path_to_data"))
    s.path("name").asText().toLowerCase match {
      case "csv" =>
        Pipeline.CsvSource(
          str(params, "filePath").orElse(stagedPath).getOrElse(
            throw new IllegalArgumentException("csv source needs params.filePath")),
          CsvTransform.CsvRoles(
            eventNameCol = str(params, "event_name_col").getOrElse("event"),
            distinctIdCol = str(params, "distinct_id_col").getOrElse("distinct_id"),
            timeCol = str(params, "time_col").getOrElse("time"),
            insertIdCol = str(params, "insert_id_col"),
            ignoreCols = jsonArray(options.path("ignore_cols")),
            tag = str(options, "tag"),
            createProfiles = options.path("create_profiles").asBoolean(false)))
      case "amplitude" =>
        Pipeline.AmplitudeStaged(
          stagedPath.getOrElse(throw new IllegalArgumentException(
            "amplitude source: live /export extraction needs network — point " +
              "options.path at staged export data (Extract.amplitudeExport stages it)")),
          importTag = str(options, "tag"))
      case "googleanalytics" | "ga360" | "ga" =>
        Pipeline.GaStaged(stagedPath.getOrElse(throw new IllegalArgumentException(
          "googleanalytics source needs options.path to staged session data")))
      case "mixpanel" =>
        Pipeline.MixpanelStaged(
          stagedPath.getOrElse(throw new IllegalArgumentException(
            "mixpanel source needs options.path to staged export data")),
          where = str(options, "where"),
          events = jsonArray(options.path("event")),
          // reference dual-path flags (mixpanelETL.js:70,107)
          doEvents = options.path("doEvents").asBoolean(true),
          doPeople = options.path("doPeople").asBoolean(false),
          peoplePath = str(options, "people_path"))
      case other =>
        throw new IllegalArgumentException(s"unknown source name: $other")
    }
  }

  private def parseDestination(d: JsonNode,
      transport: BatchedHttpSink.Transport): Pipeline.Destination =
    d.path("name").asText().toLowerCase match {
      case "local" | "file" | "json" =>
        Pipeline.LocalJson(str(d, "path").getOrElse("./graft-out"))
      case name @ ("mixpanel" | "amplitude" | "woopra") =>
        val auth = (str(d, "service_account_user"), str(d, "service_account_pass")) match {
          case (Some(u), Some(p)) => java.util.Base64.getEncoder
            .encodeToString(s"$u:$p".getBytes("UTF-8"))
          case _ => ""
        }
        val eu = d.path("options").path("is EU?").asBoolean(false)
        Pipeline.HttpSink(name,
          Map(
            "project_id" -> str(d, "project_id").getOrElse(""),
            "token" -> str(d, "token").getOrElse(""),
            "api_key" -> str(d, "api_key").getOrElse(""),
            "auth" -> auth) ++
            (if (eu) Map("region" -> "EU") else Map.empty),
          transport)
      case other =>
        throw new IllegalArgumentException(s"unknown destination name: $other")
    }

  private def jsonArray(n: JsonNode): Seq[String] =
    if (n.isArray) (0 until n.size()).map(i => n.get(i).asText()) else Seq.empty
}
