package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** One-window A/B of graphInsertEdges walk bounds at a given sf dir —
  * the sweep behind SCALE.md's maxWalkBatch default. Test-scope dev
  * tool (not shipped): builds the SAME standing 90% graph fixture the
  * `ann_graph_insert_serve` bench row serves, then times the identical
  * 10% insert batch at each bound in one session so host-day factors
  * cancel. Usage:
  *   sbt "Test/runMain graft.InsertSweep /tmp/sf1full 2147483647 512 256 128"
  */
object InsertSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1full")
    val bounds = args.drop(1).map(_.toInt).toSeq match {
      case Nil => Seq(Int.MaxValue, 512, 256, 128)
      case bs  => bs
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.t(spark, sfDir, "embeddings")
    val n = emb.count()
    val corpus = emb.filter(col("vec_id") < (n * 9) / 10)
    val batch = emb.filter(col("vec_id") >= (n * 9) / 10)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val d = java.nio.file.Files.createTempDirectory("insert_sweep").toString
    Ann.serveGraph(Ann.nnDescent(corpus, "vec_id", "embedding",
        k = 12, iters = 5, randomInit = true))
      .write.mode("overwrite").parquet(s"$d/adj")
    corpus.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .write.mode("overwrite").parquet(s"$d/corp")
    val entries = Ann.spreadEntries((n * 9) / 10)
    println(s"[sweep] fixture ready: corpus ${(n * 9) / 10}, batch ${n - (n * 9) / 10}")

    val results = bounds.map { b =>
      // free the previous bound's localCheckpoint blocks so run order
      // cannot bleed storage pressure into the next measurement
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      val t0 = System.nanoTime()
      val edges = Ann.graphInsertEdges(
        spark.read.parquet(s"$d/adj"), spark.read.parquet(s"$d/corp"),
        batch, "vec_id", "embedding", kLink = 12, entryIds = entries,
        beamWidth = 32, hops = 2, expandHops = 2, maxWalkBatch = b)
      val cnt = edges.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[sweep] bound=$b%10d  edges=$cnt%8d  sec=$sec%8.2f")
      (b, cnt, sec)
    }
    println("[sweep] " + results.map { case (b, c, s) =>
      s"""{"bound":$b,"edges":$c,"sec":${f"$s%.2f"}}""" }.mkString("[", ",", "]"))
    spark.stop()
  }
}
