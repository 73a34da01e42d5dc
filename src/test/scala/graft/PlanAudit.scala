package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Dev tool: `Test/runMain graft.PlanAudit <sfDir> [query...]` — dump plan
  * health per query: pushed filters, broadcast vs sort-merge joins,
  * shuffle count, whole-stage-codegen span count.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val spark = Tables.tune(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only(name)) {
        try {
          val df = fn(spark, dir)
          df.count() // materialize so AQE finalizes the adaptive plan
          val s = df.queryExecution.executedPlan.toString
          val shuffles = s.linesIterator.count(_.contains("Exchange hashpartitioning"))
          val bhj = s.linesIterator.count(_.contains("BroadcastHashJoin"))
          val smj = s.linesIterator.count(_.contains("SortMergeJoin"))
          val pushed = s.linesIterator
            .filter(_.contains("PushedFilters: ["))
            .map(_.replaceAll(".*PushedFilters: \\[", "").replaceAll("\\].*", ""))
            .filter(_.nonEmpty).toSeq
          // codegen spans render as "*(n)" prefixes in executedPlan text
          val wscg = "\\*\\((\\d+)\\)".r.findAllMatchIn(s).map(_.group(1)).toSet.size
          println(f"AUDIT $name%-28s shuffles=$shuffles bhj=$bhj smj=$smj " +
            s"pushed=${pushed.size} wscg=$wscg")
          if (sys.env.contains("AUDIT_VERBOSE")) println(s)
        } catch { case e: Exception => println(s"AUDIT $name ERROR ${e.getMessage.take(100)}") }
      }
    }
    spark.stop()
  }
}
