package graft

import org.apache.spark.sql.SparkSession

/** Example driver: run a staged vendor pipeline from the command line.
  *
  *   runMain graft.Demo <vendor: amplitude|ga|csv> <inputDir> <outDir>
  *
  * Reads staged vendor files, transforms to the canonical model, writes
  * NDJSON outputs (events/profiles/mergeTables) to outDir, prints a
  * count-reconciliation report (SURVEY §5: extracted = transformed =
  * loaded).
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val Array(vendor, in, out) = args.take(3)
    val spark = Tables.tune(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val source = vendor match {
      case "amplitude" => Pipeline.AmplitudeStaged(in)
      case "ga" => Pipeline.GaStaged(in)
      case "csv" => Pipeline.CsvSource(in, graft.operators.CsvTransform.CsvRoles(
        eventNameCol = sys.env.getOrElse("CSV_EVENT_COL", "action"),
        distinctIdCol = sys.env.getOrElse("CSV_ID_COL", "guid"),
        timeCol = sys.env.getOrElse("CSV_TIME_COL", "time"),
        createProfiles = true))
      case other => sys.error(s"unknown vendor: $other (want amplitude|ga|csv)")
    }
    val report = Pipeline.run(spark, Pipeline.Config(source, Pipeline.LocalJson(out)))
    println(s"DEMO_REPORT vendor=$vendor events=${report.events} " +
      s"profiles=${report.profiles} merges=${report.merges} out=$out")
    spark.stop()
  }
}
