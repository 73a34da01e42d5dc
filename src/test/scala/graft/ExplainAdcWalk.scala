package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Dev tool: print the FULL formatted plan of one ADC-scored graph walk
  * (cutLineage=false — every round visible), the plans/r16 evidence for
  * the graphSearchAdcCore barrier diet. Mirrors the ann_graph_adc_walk
  * oracle row's config.
  */
object ExplainAdcWalk {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = Tables.tune(SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.t(spark, dir, "embeddings")
    val adj = Ann.serveGraph(
      Ann.nnDescent(emb, "vec_id", "embedding", k = 4, iters = 2))
      .localCheckpoint()
    val books = Ann.pqCodebooks(emb, "vec_id", "embedding", m = 4, k = 8)
    val df = Ann.graphSearchAdc(adj,
      Ann.pqEncode(emb, "vec_id", "embedding", books).localCheckpoint(),
      books, k = 8, emb, emb.filter(col("vec_id") < 8),
      "vec_id", "embedding", entryIds = Seq(0L), beamWidth = 16, hops = 2,
      topK = 5, cutLineage = false, expandHops = 2)
    df.count()
    df.explain("formatted")
    spark.stop()
  }
}
