package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Round-5 operators: SemDeDup scale contract (cluster sizing + pair-volume
  * guard).
  */
class Round5OpsSpec extends SparkSpec {

  // ---- SemDeDup scale contract -------------------------------------------

  test("semanticDedupNLists: √n default, n/target when a target is given") {
    assert(Dedup.semanticDedupNLists(10000) == 100)
    assert(Dedup.semanticDedupNLists(1000000) == 1000)
    assert(Dedup.semanticDedupNLists(10000, Some(100L)) == 100)
    assert(Dedup.semanticDedupNLists(1000000, Some(200L)) == 5000)
    // degenerate corpora: at least 1 cluster, never more clusters than rows
    assert(Dedup.semanticDedupNLists(0) == 1)
    assert(Dedup.semanticDedupNLists(3, Some(1L)) == 3)
    assert(Dedup.semanticDedupNLists(5, Some(1000L)) == 1)
    intercept[IllegalArgumentException](Dedup.semanticDedupNLists(10, Some(0L)))
  }

  test("semanticDedup refuses an under-clustered call (pair-volume guard)") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    // nLists=1 puts the whole corpus in one cluster: Σ(cluster²) = n² —
    // exactly the all-pairs-in-disguise shape the guard exists to reject
    val e = intercept[IllegalArgumentException] {
      Dedup.semanticDedup(emb, "vec_id", "embedding",
        nLists = 1, threshold = 0.4, maxPairComparisons = 100L)
    }
    assert(e.getMessage.contains("pair volume"))
    assert(e.getMessage.contains("semanticDedupNLists"))
  }

  test("semanticDedupAuto sizes the quantizer from the corpus and runs") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val n = emb.count()
    val survivors = Dedup.semanticDedupAuto(emb, "vec_id", "embedding",
      threshold = 0.4)
    val rows = survivors.count()
    assert(rows > 0 && rows <= n)
    // centroid ids must span the √n-sized codebook, not a pinned constant
    val k = Dedup.semanticDedupNLists(n)
    val maxCentroid = survivors.agg(max(col("centroid"))).head().getInt(0)
    assert(maxCentroid < k)
  }
}
