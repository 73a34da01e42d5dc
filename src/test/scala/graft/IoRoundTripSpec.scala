package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Canonical-model IO round trips across the engine's storage formats —
  * staging interop (SURVEY §2.1/§2.10 K9: everything stages through
  * NDJSON/parquet; csv for export surfaces).
  */
class IoRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private def canonical() = Seq(
    ("click", "u1", 1700000000L, "i1", "s", Map("a" -> "1", "b" -> "2")),
    ("view", "u2", 1700000100L, "i2", "s", Map.empty[String, String])
  ).toDF("event", "distinct_id", "time", "insert_id", "source", "properties")

  test("parquet round trip preserves schema and values") {
    val dir = Files.createTempDirectory("rt-parquet").toString
    canonical().write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    // parquet relaxes nullability on read; compare name/type shape
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      canonical().schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("insert_id").collect().toSeq ==
      canonical().orderBy("insert_id").collect().toSeq)
  }

  test("ndjson round trip with explicit schema preserves values") {
    val dir = Files.createTempDirectory("rt-json").toString
    canonical().write.mode("overwrite").json(dir)
    val back = spark.read.schema(graft.model.Model.mpEventSchema).json(dir)
    assert(back.count() == 2)
    val r = back.filter(col("insert_id") === "i1").head()
    assert(r.getAs[Map[String, String]]("properties") == Map("a" -> "1", "b" -> "2"))
    // empty map survives as empty (JSON writer drops it → null-guard read)
    val r2 = back.filter(col("insert_id") === "i2").head()
    assert(Option(r2.getAs[Map[String, String]]("properties")).forall(_.isEmpty))
  }

  test("orc round trip preserves schema and values (columnar interop)") {
    val dir = Files.createTempDirectory("rt-orc").toString
    canonical().write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      canonical().schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("insert_id").collect().toSeq ==
      canonical().orderBy("insert_id").collect().toSeq)
    // predicate pushdown reaches the ORC scan (the interop point of the
    // format: another engine's bucketed ORC lake stays cheap to probe)
    val plan = back.filter(col("event") === "click")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("pushedFilters"),
      s"no pushed filters in ORC scan plan:\n$plan")
  }

  test("csv export surface: maps serialize to JSON strings and parse back") {
    val dir = Files.createTempDirectory("rt-csv").toString
    canonical()
      .withColumn("properties", to_json(col("properties")))
      .write.mode("overwrite").option("header", "true").csv(dir)
    val back = graft.sources.Sources.csv(spark, dir)
      .withColumn("properties", from_json(col("properties"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)))
    assert(back.count() == 2)
    assert(back.filter(col("insert_id") === "i1").head()
      .getAs[Map[String, String]]("properties") == Map("a" -> "1", "b" -> "2"))
  }

  test("hive-partitioned write: day filter prunes partitions at the scan") {
    val dir = Files.createTempDirectory("rt-part").toString
    // three event-days; the partition column is derived, the layout is
    // the standard day=<epoch-day> lake layout a 100 TB store would use
    val df = Seq(
      ("i1", 86400L * 100 + 10, "click"), ("i2", 86400L * 100 + 20, "view"),
      ("i3", 86400L * 101 + 5, "click"), ("i4", 86400L * 102 + 1, "view"))
      .toDF("insert_id", "time", "event")
      .withColumn("day", col("time") / 86400 cast "long")
    df.write.mode("overwrite").partitionBy("day").parquet(dir)
    val back = spark.read.parquet(dir)
    // round trip: partition column comes back (as a read-side column)
    assert(back.count() == 4)
    val q = back.filter(col("day") === 101)
    assert(q.collect().map(_.getAs[String]("insert_id")).toSeq == Seq("i3"))
    // the day predicate must land in PartitionFilters (directory pruning),
    // NOT as a data filter — the difference between listing one directory
    // and scanning every file at scale
    val exec = q.queryExecution.executedPlan.toString
    assert(exec.contains("PartitionFilters") &&
      exec.split("PartitionFilters", 2)(1).split("]", 2)(0).contains("day"),
      s"day filter not in PartitionFilters:\n$exec")
    // dynamic partition overwrite: rewriting ONE day leaves others intact
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq(("i5", 86400L * 101 + 9, "click"))
        .toDF("insert_id", "time", "event")
        .withColumn("day", col("time") / 86400 cast "long")
        .write.mode("overwrite").partitionBy("day").parquet(dir)
      val after = spark.read.parquet(dir)
      assert(after.count() == 4, "only day=101 replaced")
      assert(after.filter(col("day") === 101).collect()
        .map(_.getAs[String]("insert_id")).toSeq == Seq("i5"))
      assert(after.filter(col("day") === 100).count() == 2, "day=100 untouched")
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }
}
