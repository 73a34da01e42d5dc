package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Dev-loop profiler for the graph-walk serve path: counts the Spark jobs
  * and stages one single-query serve costs (the barrier budget that
  * dominates serve latency at local grain), prints the executed plan of
  * the final rank, and times single-query + batch grains. Not a test —
  * run with `Test/runMain graft.ProfWalk [sfDir]`.
  */
object ProfWalk {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobCount = new java.util.concurrent.atomic.AtomicInteger
    val stageCount = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobCount.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stageCount.incrementAndGet()
    })
    val emb = Tables.t(spark, dir, "embeddings")
    val graph = Ann.serveGraph(Ann.nnDescent(emb, "vec_id", "embedding",
      k = 12, iters = 5, randomInit = true))
    val d = java.nio.file.Files.createTempDirectory("profwalk").toString
    graph.write.mode("overwrite").parquet(d)
    val adj = spark.read.parquet(d)
    val entries = Ann.spreadEntries(emb.count())

    def serveOne(i: Int) = Ann.graphSearch(adj, emb,
      emb.filter(col("vec_id") === i), "vec_id", "embedding",
      entryIds = entries, beamWidth = 48, hops = 2, topK = 10,
      expandHops = 2)

    // warm
    serveOne(0).count(); serveOne(1).count()
    Thread.sleep(500)
    jobCount.set(0); stageCount.set(0)
    val ms = (2 until 10).map { i =>
      val t0 = System.nanoTime()
      serveOne(i).count()
      (System.nanoTime() - t0) / 1e6
    }.sorted
    Thread.sleep(500)
    println(f"PROFWALK single-query p50=${ms(4)}%.0f ms  " +
      s"jobs=${jobCount.get / 8.0} stages=${stageCount.get / 8.0} (per query, 8 queries)")

    jobCount.set(0); stageCount.set(0)
    val bms = (0 until 3).map { _ =>
      val t0 = System.nanoTime()
      Ann.graphSearch(adj, emb, emb.filter(col("vec_id") < 100), "vec_id",
        "embedding", entries, 48, 2, 10, expandHops = 2).count()
      (System.nanoTime() - t0) / 1e6
    }.sorted
    Thread.sleep(500)
    println(f"PROFWALK 100-query batch p50=${bms(1)}%.0f ms  " +
      s"jobs=${jobCount.get / 3.0} stages=${stageCount.get / 3.0} (per batch)")

    println("==== executed plan of one serve (final rank job) ====")
    val one = serveOne(3)
    one.count()
    one.explain("formatted")
    spark.stop()
  }
}
