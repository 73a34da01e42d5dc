package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation joins (SURVEY scale posture: "skewed keys → salting or
  * AQE skew-join").
  *
  * AQE's runtime skew-join splitting (`spark.sql.adaptive.skewJoin`) is
  * the first line of defense and is enabled by Tables.tune. Salting is the
  * explicit fallback for pathological keys (one user/device generating a
  * large fraction of events — common in product-analytics data, e.g. bot
  * traffic): the build side is replicated `salts` times and the probe side
  * scatters each key uniformly across the replicas, bounding any single
  * task's share of a hot key to 1/salts.
  */
object SkewJoin {

  /** Equi-join `left ⋈ right` on `key`, with the left (probe, skewed) side
    * salted across `salts` replicas of the right (build) side. Result is
    * row-identical to the direct join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // probe side: deterministic uniform scatter — hash the row identity,
    // not rand(), so retried tasks salt identically (idempotent under
    // task retry)
    val salted = left.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(salts)))
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
      salted(key) === replicated(key) && salted("__salt") === replicated("__salt"),
      joinType)
      .drop(replicated(key))
      .drop("__salt")
  }
}
