package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Dev-loop profiler: graph-walk serve recall/latency across (beam, hops)
  * at a given sf dir. Not a test — run with `Test/runMain graft.ProfGraph`.
  */
object ProfGraph {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.t(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val exact = Ann.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
      .localCheckpoint()
    val graph = Ann.serveGraph(
      Ann.nnDescent(emb, "vec_id", "embedding", k = 12, iters = 5,
        randomInit = true))
    val d = java.nio.file.Files.createTempDirectory("profgraph").toString
    graph.write.mode("overwrite").parquet(d)
    val adj = spark.read.parquet(d)
    val manyEntries = (0 until 8).map(i => (i * 269L) % 2000)
    for ((beam, hops, ent, eh) <- Seq(
        (64, 4, manyEntries, 1), (64, 2, manyEntries, 2),
        (48, 2, manyEntries, 2), (64, 3, manyEntries, 2),
        (64, 1, manyEntries, 3), (96, 2, manyEntries, 2))) {
      val approx = Ann.graphSearch(adj, emb, q, "vec_id", "embedding",
        ent, beam, hops, 10, expandHops = eh)
      val recall = Ann.recallEval(exact, approx, 10)
        .agg(avg("recall")).head.getDouble(0)
      // single-query latency, median of 5
      val ms = (0 until 5).map { i =>
        val t0 = System.nanoTime()
        Ann.graphSearch(adj, emb, emb.filter(col("vec_id") === i), "vec_id",
          "embedding", ent, beam, hops, 10, expandHops = eh).count()
        (System.nanoTime() - t0) / 1e6
      }.sorted.apply(2)
      // 100-query batch, median of 3
      val bms = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        Ann.graphSearch(adj, emb, emb.filter(col("vec_id") < 100), "vec_id",
          "embedding", ent, beam, hops, 10, expandHops = eh).count()
        (System.nanoTime() - t0) / 1e6
      }.sorted.apply(1)
      print(f"PROF-BATCH p50=${bms}%.0f ms ")
      println(f"PROF beam=$beam%3d hops=$hops eh=$eh recall@10=$recall%.3f p50=${ms}%.0f ms")
    }
    spark.stop()
  }
}
