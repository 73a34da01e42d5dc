package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage) over noisy string names: the
  * blocking → pairwise-scoring → transitive-resolution pipeline every
  * master-data / identity system runs (Fellegi–Sunter shape; blocking per
  * Christen 2012). Reference analogue: the merge-pair emission and
  * first-wins canonicalization of the user-identity path
  * (`connectors/amplitudeETL.js` merge handling) generalized from exact
  * ids to fuzzy names.
  *
  * Scale contract — the corpus is NEVER pair-joined. All quadratic work
  * happens at the DISTINCT-NAME grain: real catalogs have name
  * vocabularies orders of magnitude smaller than row counts (here: 64
  * names over 2k..20M part rows), so
  *   1. `distinct()` contracts the fact table to the vocabulary (one
  *      keyed shuffle, map-side combined);
  *   2. multi-pass token blocking self-joins ONLY the vocabulary —
  *      candidate volume is Σ blockSize², bounded by the vocabulary,
  *      independent of corpus row count;
  *   3. the fact table is touched exactly twice more, both as keyed
  *      equi-joins on the name (broadcast-eligible at vocabulary sizes).
  * If the vocabulary itself were corpus-sized, blocking keys become the
  * LSH-band analogue and the [[Dedup]] PPJoin filters apply — documented
  * escape hatch, not this operator's regime.
  */
object EntityResolution {

  /** Distinct-name grain with the two blocking tokens (first and last
    * word). Multi-pass blocking: a candidate pair needs ANY shared token,
    * so matches survive a typo in the other token — single-pass blocking
    * misses exactly those.
    */
  private def nameGrain(df: DataFrame, nameCol: String): DataFrame = {
    val toks = split(col("name"), " ")
    df.select(col(nameCol).as("name")).filter(col("name").isNotNull)
      .distinct()
      .select(col("name"), toks.getItem(0).as("t1"),
        element_at(toks, -1).as("t2"))
  }

  /** Candidate pairs from two token-blocking passes, union-deduped,
    * ordered (name_a < name_b). Vocabulary-grain only.
    */
  def candidatePairs(df: DataFrame, nameCol: String): DataFrame = {
    val tok = nameGrain(df, nameCol)
    def pass(key: String): DataFrame =
      tok.select(col("name").as("name_a"), col(key).as("k"))
        .join(tok.select(col("name").as("name_b"), col(key).as("k")), "k")
        .filter(col("name_a") < col("name_b"))
        .select("name_a", "name_b")
    pass("t1").union(pass("t2")).distinct()
  }

  /** Levenshtein-similarity scores for the blocked candidates, integer
    * ppm (floor division — hash-stable), filtered to `minSimPpm`.
    * Codegen'd end-to-end: `levenshtein` is a native Catalyst expression.
    */
  def pairScores(df: DataFrame, nameCol: String,
      minSimPpm: Long = 700000L): DataFrame =
    candidatePairs(df, nameCol)
      .withColumn("lev", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .withColumn("max_len",
        greatest(length(col("name_a")), length(col("name_b"))).cast("long"))
      .withColumn("sim_ppm",
        expr("((max_len - lev) * 1000000) div max_len"))
      .filter(col("sim_ppm") >= minSimPpm)
      .select("name_a", "name_b", "lev", "sim_ppm")

  /** Per-blocking-key health profile: block size at the vocabulary grain
    * plus the corpus rows the block covers. The operational skew check —
    * a block holding half the vocabulary means the key is degenerate and
    * candidate volume explodes as blockSize².
    */
  def blockingProfile(df: DataFrame, nameCol: String): DataFrame = {
    val tok = nameGrain(df, nameCol)
    val keys = tok.select(lit("first_token").as("pass"), col("t1").as("key"),
        col("name"))
      .union(tok.select(lit("last_token").as("pass"), col("t2").as("key"),
        col("name")))
    val rows = df.select(col(nameCol).as("name")).groupBy("name")
      .agg(count(lit(1)).as("rows"))
    keys.join(rows, "name")
      .groupBy("pass", "key")
      .agg(countDistinct(col("name")).as("block_names"),
        sum("rows").as("block_rows"))
  }

  /** Full resolution: match edges → connected components (transitive
    * closure — A~B, B~C merges all three even when A!~C directly) →
    * entity rollup at the fact grain. Canonical entity id = lexicographic
    * min name in the component (the first-wins analogue of J3).
    *
    * Returns one row per entity: `entity`, `n_names`, `n_rows`,
    * `min_id` (the smallest `idCol` across the entity's fact rows).
    */
  /** name → canonical entity mapping (vocabulary grain): connected
    * components over the match edges, singletons self-mapped, canonical
    * id = lexicographic min name in the component.
    */
  def nameComponents(df: DataFrame, nameCol: String,
      minSimPpm: Long = 700000L): DataFrame = {
    val names = df.select(col(nameCol).as("name")).filter(col("name").isNotNull)
      .distinct()
    val edges = pairScores(df, nameCol, minSimPpm)
      .select(col("name_a").as("src"), col("name_b").as("dst"))
      // singleton names keep their own component via self-edges
      .union(names.select(col("name").as("src"), col("name").as("dst")))
    IdentityResolution.connectedComponentsString(edges)
      .select(col("node").as("name"), col("component").as("entity"))
  }

  def resolveEntities(df: DataFrame, idCol: String, nameCol: String,
      minSimPpm: Long = 700000L): DataFrame = {
    df.select(col(idCol).as("id"), col(nameCol).as("name"))
      .join(nameComponents(df, nameCol, minSimPpm), "name")
      .groupBy("entity")
      .agg(countDistinct(col("name")).as("n_names"),
        count(lit(1)).as("n_rows"),
        min(col("id")).as("min_id"))
  }
}
