package graft.queries

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for expensive query fixtures (VERDICT r14 #1b —
  * "share the session-scoped fixture/index builds across the ~30 ann_*
  * rows; each currently re-runs its own nnDescent").
  *
  * The correctness gate (`graft.Verify`) runs every oracle query in one
  * JVM on one SparkSession; five of the graph rows build the IDENTICAL
  * `serveGraph(nnDescent(embeddings, k=4, iters=2))` standing index and
  * two more the identical layered index. The builds are deterministic
  * (hash-seeded init, deterministic tie-breaks), so sharing one
  * localCheckpoint-materialized copy is result-identical to rebuilding —
  * it only removes the repeated build jobs from the verify wall time.
  *
  * Keys are scoped by `applicationId` so a cached frame never leaks
  * across SparkSessions (a checkpointed RDD dies with its context).
  * `computeIfAbsent` makes concurrent verify threads block on the ONE
  * in-flight build of their key instead of racing duplicate builds.
  * Entries are a handful of small standing indexes (sf0.01-scale edge
  * tables) — driver-memory-trivial, freed when the context stops.
  */
object FixtureCache {
  private val cache = new ConcurrentHashMap[String, DataFrame]()

  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cache.computeIfAbsent(s"${spark.sparkContext.applicationId}|$key",
      _ => build.localCheckpoint())

  /** Non-DataFrame fixtures (codebooks, composite indexes) — the caller
    * owns materialization (localCheckpoint any DataFrame members so the
    * shared copy is compute-once, not lineage-shared).
    */
  private val anyCache = new ConcurrentHashMap[String, AnyRef]()

  def cachedAny[T <: AnyRef](spark: SparkSession, key: String)(build: => T): T =
    anyCache.computeIfAbsent(s"${spark.sparkContext.applicationId}|$key",
      _ => build).asInstanceOf[T]
}
