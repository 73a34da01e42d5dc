package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * Every operator claimed in SURVEY §2 is declared here as a named query;
  * where the semantics are ANSI-SQL-expressible the matching DuckDB oracle
  * is in [[oracleSql]] (driver hash-compares at sf0.01).
  */
object SparkEntry {

  /** All query modules, merged. Later modules must not reuse names. */
  private val modules: Seq[Map[String, QuerySpec]] = Seq(
    CoreAnalytics.specs,
    EtlOps.specs,
    TrainingDataOps.specs,
    ExtendedAnalytics.specs,
    ScalarOps.specs,
    VendorPackOps.specs,
    DssOps.specs,
    AnalysisOps.specs,
    QualityOps.specs,
    EntityOps.specs
  )

  private lazy val allSpecs: Map[String, QuerySpec] = {
    val merged = modules.flatten.toMap
    val dupes = modules.flatMap(_.keys).groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    require(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(",")}")
    merged
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allSpecs("q1_pricing_summary").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map { case (k, v) => k -> v.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allSpecs.collect { case (k, QuerySpec(_, Some(sql))) => k -> sql }

  /** Bench-only entries ([[graft.Bench]] runs `queries ++ benchQueries`):
    * perf-tracked deployment shapes (e.g. serving against a pre-built
    * index) that have no DuckDB-expressible oracle and therefore stay out
    * of the Verify/correctness surface.
    */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    BenchOnlyOps.specs
}
