package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** CSV → canonical transform (SURVEY §3.2 — the reference's minimum
  * end-to-end slice; connectors/csvETL.js:70-153). Column roles come from
  * config, not code: rename pack P1, drop P2, tag P3, time heuristic P7,
  * md5 insert-id P8, optional profile synthesis + first-wins dedup J3.
  */
object CsvTransform {

  /** Column-role config mirroring examples/configExample-csv.json:3-16. */
  case class CsvRoles(
      eventNameCol: String,
      distinctIdCol: String,
      timeCol: String,
      insertIdCol: Option[String] = None,
      ignoreCols: Seq[String] = Seq.empty,
      tag: Option[String] = None,
      createProfiles: Boolean = false)

  case class Outputs(events: DataFrame, profiles: Option[DataFrame])

  def events(csv: DataFrame, roles: CsvRoles): DataFrame = {
    val kept = csv.drop(roles.ignoreCols: _*) // P2
    val propCols = kept.columns.filterNot(c =>
      Set(roles.eventNameCol, roles.distinctIdCol, roles.timeCol)(c) ||
        roles.insertIdCol.contains(c))
    val propEntries = propCols.flatMap(c => Seq(lit(c), col(c).cast("string")))
    val tagged = roles.tag.map(t => Map(lit("import-tag") -> lit(t)))
      .getOrElse(Map.empty).flatMap { case (k, v) => Seq(k, v) }.toSeq
    val props =
      if (propEntries.isEmpty && tagged.isEmpty) map().cast("map<string,string>")
      else map_filter(map(propEntries ++ tagged: _*), (_, v) => v.isNotNull)
    val time = Fns.normalizeEpochSeconds(col(roles.timeCol)) // P7 heuristic
    val insertId = roles.insertIdCol
      .map(c => coalesce(col(c).cast("string"),
        Fns.mpInsertId(col(roles.eventNameCol), col(roles.distinctIdCol), time)))
      .getOrElse(Fns.mpInsertId(col(roles.eventNameCol), col(roles.distinctIdCol), time,
        to_json(props)))
    kept.select(
      col(roles.eventNameCol).cast("string").as("event"), // P1
      col(roles.distinctIdCol).cast("string").as("distinct_id"),
      time.as("time"),
      insertId.as("insert_id"),
      lit("csv").as("source"), // P3
      props.as("properties"))
  }

  /** Profile synthesis (csvETL.js:129-146): one $set bag per distinct_id,
    * first row wins deterministically (J3 fixed per SURVEY §2.7).
    */
  def profiles(csv: DataFrame, roles: CsvRoles): DataFrame = {
    val ev = events(csv, roles)
    // maps can't be sort keys: order by (time, serialized set) for a
    // deterministic first-wins pick
    Dedup.exactFirstWins(
      ev.select(col("distinct_id"), col("properties").as("set"), col("time"))
        .withColumn("__ord", to_json(col("set"))),
      Seq("distinct_id"), Seq("time", "__ord"))
      .drop("time", "__ord")
  }

  def apply(csv: DataFrame, roles: CsvRoles): Outputs =
    Outputs(events(csv, roles),
      if (roles.createProfiles) Some(profiles(csv, roles)) else None)
}
