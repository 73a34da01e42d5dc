package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one per JVM — suites reuse it
  * via getOrCreate).
  */
trait SparkSpec extends AnyFunSuite {

  /** Every physical node of a finalized plan, descending through AQE
    * wrappers, materialized query stages, and reused exchanges — the
    * string form HIDES empty partition specs (an unpartitioned Window
    * prints only two bracket groups, so regexes over toString cannot see
    * them), which is why plan locks about partitioning must walk the
    * tree.
    */
  def allPlanNodes(p: SparkPlan): Seq[SparkPlan] = {
    val next = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: next.flatMap(allPlanNodes)
  }

  /** Window nodes whose partition spec is EMPTY — each funnels its whole
    * input through one task (Spark's "Moving all data to a single
    * partition" WARN). The repo standard: zero tolerance, corpus-wide.
    * Bounded post-aggregate windows (offset prefix sums over ≤256-row
    * histograms) state their intent with partitionBy(lit(0)) and so pass
    * strictly — no bounded-relation exception exists to hide behind.
    */
  def partitionlessWindows(df: DataFrame): Seq[String] = {
    // precondition: an action already finalized the adaptive plan
    allPlanNodes(df.queryExecution.executedPlan).collect {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        s"WindowExec[${w.windowExpression.mkString(",").take(120)}]"
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
        s"WindowGroupLimitExec[${w.rankLikeFunction}]"
    }
  }
  lazy val spark: SparkSession = Tables.tune(
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
  )
  val sfDir = "/root/testdata/sf0.001"
}
