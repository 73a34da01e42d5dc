package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.operators.Ann

/** Bench-only entries: perf-tracked surfaces with NO DuckDB oracle row —
  * they are deliberately NOT part of [[graft.SparkEntry.queries]] (the
  * correctness gate stays 100% oracle-paired); [[graft.Bench]] appends
  * them so the numbers a deployment cares about are tracked
  * round-over-round in the committed artifact, not just in SCALE.md.
  *
  * `ann_ivfpq_serve`: the 7 oracle ANN rows all pay index TRAINING
  * in-query (the oracle-harness shape). A 100 TB serving path builds the
  * IvfPqIndex once, materializes the coded corpus to parquet (raw vectors
  * gone from the serving scan), and pays only nprobe-pruned ADC per query
  * batch — ScaleBench measured that split at 47×; this entry pins the
  * serve-side number per round. The build is paid ONCE per session
  * (lazily, outside what the median of 3 reps reports) — exactly the
  * deployment cost model.
  */
object BenchOnlyOps {

  // (sfDir -> served index) — one build per session per corpus; the
  // serve reps then measure pure batch-serving cost. Driver-side state
  // is bench-harness-only, not library surface.
  private val cache =
    scala.collection.mutable.HashMap.empty[String, Ann.IvfPqIndex]

  private def servedIndex(s: SparkSession, dir: String): Ann.IvfPqIndex =
    cache.synchronized {
      cache.getOrElseUpdate(dir, {
        val d = "/tmp/graft_bench_ivfpq"
        val idx = Ann.ivfPqBuild(t(s, dir, "embeddings"), "vec_id", "embedding",
          nLists = 64, m = 8, k = 16)
        idx.encoded.write.mode("overwrite").parquet(s"$d/encoded")
        idx.centroids.write.mode("overwrite").parquet(s"$d/centroids")
        Ann.IvfPqIndex(s.read.parquet(s"$d/encoded"),
          s.read.parquet(s"$d/centroids"), idx.books, idx.k, idx.byResidual)
      })
    }

  def specs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_ivfpq_serve" -> ((s, dir) =>
      Ann.ivfPqSearch(servedIndex(s, dir),
        t(s, dir, "embeddings").filter(col("vec_id") < 100),
        "vec_id", "embedding", nprobe = 8, topK = 10))
  )
}
