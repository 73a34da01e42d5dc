package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Dev tool: print the FULL formatted plan of one graph-walk serve
  * (cutLineage=false so every round's joins are visible instead of hiding
  * behind checkpoint RDD scans) — the before/after evidence for
  * plans/r16/. Uses the ann_graph_search oracle row's config.
  */
object ExplainWalk {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = Tables.tune(SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.t(spark, dir, "embeddings")
    val graph = Ann.serveGraph(
      Ann.nnDescent(emb, "vec_id", "embedding", k = 4, iters = 2))
      .localCheckpoint() // the standing index — not under test
    val df = Ann.graphSearch(graph, emb, emb.filter(col("vec_id") < 8),
      "vec_id", "embedding", entryIds = Seq(0L), beamWidth = 16, hops = 2,
      topK = 5, cutLineage = false, expandHops = 2)
    df.count()
    df.explain("formatted")
    spark.stop()
  }
}
