package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Ad-hoc profiler: layered vs flat graph serve at the bench config
  * (sf0.1, random-init k=12/iters=5 graphs) — recall@10 parity evidence
  * for SCALE.md. Run: `sbt "testOnly graft.ProfLayered"` with
  * SPARK_GRAFT_PROF=1.
  */
class ProfLayered extends SparkSpec {
  test("layered vs flat serve recall@10 at bench config (sf0.1)") {
    assume(sys.env.contains("SPARK_GRAFT_PROF"))
    val dir = "/root/testdata/sf0.1"
    val emb = Tables.t(spark, dir, "embeddings")
    val n = emb.count()
    val q = emb.filter(col("vec_id") < 100)
    val exact = Ann.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
      .localCheckpoint()
    val flat = Ann.serveGraph(Ann.nnDescent(emb, "vec_id", "embedding",
      k = 12, iters = 5, randomInit = true)).localCheckpoint()
    val rFlat = Ann.recallEval(exact,
        Ann.graphSearch(flat, emb, q, "vec_id", "embedding",
          entryIds = Ann.spreadEntries(n), beamWidth = 48, hops = 2,
          topK = 10, expandHops = 2), 10)
      .agg(avg("recall")).head.getDouble(0)
    val layers = Ann.layeredBuild(emb, "vec_id", "embedding",
      k = 12, iters = 5, p = 4, maxLevel = 1, randomInit = true)
      .localCheckpoint()
    println(f"PROF_LAYERED flat_recall@10=$rFlat%.4f")
    for (bu <- Seq(40, 48, 64); bb <- Seq(48, 64)) {
      val rLay = Ann.recallEval(exact,
          Ann.layeredSearch(layers, emb, q, "vec_id", "embedding",
            maxLevel = 1, entryId = Ann.layeredEntry(layers, 1),
            beamUpper = bu, beamBase = bb, hopsBase = 1, topK = 10,
            expandHops = 2, expandUpper = 2), 10)
        .agg(avg("recall")).head.getDouble(0)
      println(f"PROF_LAYERED bu=$bu bb=$bb layered_recall@10=$rLay%.4f")
    }
  }
}
