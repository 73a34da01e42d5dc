package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.operators.{EntityResolution, LinkGraph}

/** Entity-resolution (record-linkage) and graph-traversal operators:
  * multi-pass token blocking, Levenshtein pair scoring, transitive entity
  * merge, and seeded BFS hop distance — the master-data tier that sits
  * next to identity resolution (the fuzzy-name generalization of the
  * reference's merge-pair path, `connectors/amplitudeETL.js`).
  *
  * House contracts: all quadratic work at the distinct-name grain
  * (vocabulary-bounded, never corpus-bounded), integer-ppm similarity
  * (floor division, hash-stable), components from the checkpoint-cut CC
  * loop, BFS rounds sized to the diameter and unrolled 1:1 in the oracle.
  */
object EntityOps {

  /** The blocked + scored candidate pairs both er_ queries share.
    * `//` in the oracle is DuckDB integer floor division = Spark `div`.
    */
  private val pairCtes: String =
    """names AS (SELECT DISTINCT p_name AS name FROM part
      |  WHERE p_name IS NOT NULL),
      |tok AS (SELECT name, string_split(name, ' ')[1] AS t1,
      |    string_split(name, ' ')[-1] AS t2 FROM names),
      |cand AS (
      |  SELECT a.name AS name_a, b.name AS name_b FROM tok a JOIN tok b
      |    ON a.t1 = b.t1 AND a.name < b.name
      |  UNION
      |  SELECT a.name, b.name FROM tok a JOIN tok b
      |    ON a.t2 = b.t2 AND a.name < b.name),
      |sc AS (SELECT name_a, name_b,
      |    CAST(levenshtein(name_a, name_b) AS BIGINT) AS lev,
      |    CAST(greatest(length(name_a), length(name_b)) AS BIGINT) AS max_len
      |  FROM cand),
      |pairs AS (SELECT name_a, name_b, lev,
      |    ((max_len - lev) * 1000000) // max_len AS sim_ppm
      |  FROM sc WHERE ((max_len - lev) * 1000000) // max_len >= 700000)""".stripMargin

  val specs: Map[String, QuerySpec] = Map(

    // ---- ER: blocking-key health profile -------------------------------
    // Block sizes per pass/key at BOTH grains: vocabulary (drives
    // candidate volume as blockSize²) and corpus rows covered. The skew
    // check run before any pair join is allowed to exist.
    "er_blocking_profile" -> QuerySpec(
      (s, dir) =>
        EntityResolution.blockingProfile(t(s, dir, "part"), "p_name")
          .orderBy("pass", "key"),
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part
        |  WHERE p_name IS NOT NULL),
        |tok AS (SELECT name, string_split(name, ' ')[1] AS t1,
        |    string_split(name, ' ')[-1] AS t2 FROM names),
        |per_name AS (SELECT p_name AS name, count(*) AS n_rows FROM part
        |  WHERE p_name IS NOT NULL GROUP BY 1),
        |keys AS (
        |  SELECT 'first_token' AS pass, t1 AS key, name FROM tok
        |  UNION ALL
        |  SELECT 'last_token', t2, name FROM tok)
        |SELECT pass, key,
        |  CAST(count(DISTINCT name) AS BIGINT) AS block_names,
        |  CAST(sum(n_rows) AS BIGINT) AS block_rows
        |FROM keys JOIN per_name USING (name)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ),

    // ---- ER: blocked candidate scoring ----------------------------------
    // Multi-pass token blocking (first OR last word shared) → Levenshtein
    // similarity in integer ppm ≥ 0.70. Candidate volume is Σ blockSize²
    // over the 64-name vocabulary — corpus-size-independent.
    "er_pair_scores" -> QuerySpec(
      (s, dir) =>
        EntityResolution.pairScores(t(s, dir, "part"), "p_name")
          .orderBy("name_a", "name_b"),
      s"""WITH $pairCtes
         |SELECT name_a, name_b, lev, CAST(sim_ppm AS BIGINT) AS sim_ppm
         |FROM pairs ORDER BY name_a, name_b""".stripMargin
    ),

    // ---- ER: transitive entity merge ------------------------------------
    // Match edges → connected components (A~B, B~C merges all three) →
    // part-grain rollup. Canonical entity = lexicographic min name (the
    // J3 first-wins analogue). Oracle replays the closure as a recursive
    // reachability CTE — exact fixpoint on both sides, so round counts
    // need not align.
    "er_entities" -> QuerySpec(
      (s, dir) =>
        EntityResolution.resolveEntities(t(s, dir, "part"), "p_partkey",
            "p_name")
          .orderBy("entity"),
      s"""WITH RECURSIVE $pairCtes,
         |sym AS (SELECT name_a AS s, name_b AS d FROM pairs
         |  UNION SELECT name_b, name_a FROM pairs),
         |reach(node, comp) AS (
         |  SELECT name, name FROM names
         |  UNION
         |  SELECT e.d, r.comp FROM reach r JOIN sym e ON e.s = r.node),
         |cc AS (SELECT node AS name, min(comp) AS entity FROM reach
         |  GROUP BY 1)
         |SELECT cc.entity,
         |  CAST(count(DISTINCT cc.name) AS BIGINT) AS n_names,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  min(p.p_partkey) AS min_id
         |FROM part p JOIN cc ON p.p_name = cc.name
         |GROUP BY 1 ORDER BY 1""".stripMargin
    ),

    // ---- personalized PageRank -------------------------------------------
    // Teleport mass concentrated on seed hosts {3, 11} over the
    // web_pagerank host graph: ranks measure seed proximity (the
    // related-entity / seed-biased-crawl score). Same integer fixed-point
    // replay contract as web_pagerank — the oracle unrolls all 5 rounds
    // with the seed-gated base term.
    "graph_ppr" -> QuerySpec(
      (s, dir) => {
        val d = col("doc_id")
        val docs = t(s, dir, "documents")
        val edges = docs.select((d % 37).as("src"), ((d * 3 + 1) % 37).as("dst"))
          .unionByName(
            docs.select((d % 37).as("src"), ((d * 7 + 5) % 37).as("dst")))
        val seeds = docs.select((d % 37).as("node")).filter(col("node").isin(3L, 11L))
        LinkGraph.personalizedPageRank(edges, "src", "dst", seeds, "node",
            iters = 5)
          .select(col("node").as("host"), col("rank"))
          .orderBy("host")
      },
      {
        val iterCte = (i: Int) => {
          val prev = s"r${i - 1}"
          s"""s$i AS (SELECT e.dst AS node, sum(r.rank // o.outdeg) AS mass
             |  FROM e0 e JOIN $prev r ON e.src = r.node
             |  JOIN od o ON e.src = o.src GROUP BY 1),
             |r$i AS (SELECT n.node,
             |    (CASE WHEN n.node IN (3, 11)
             |      THEN ((1000000000000 // 2) * 15) // 100 ELSE 0 END)
             |      + (85 * COALESCE(s.mass, 0)) // 100 AS rank
             |  FROM nodes n LEFT JOIN s$i s ON n.node = s.node)""".stripMargin
        }
        s"""WITH e0 AS (
           |  SELECT DISTINCT doc_id % 37 AS src, (doc_id * 3 + 1) % 37 AS dst
           |  FROM documents
           |  UNION
           |  SELECT doc_id % 37, (doc_id * 7 + 5) % 37 FROM documents),
           |nodes AS (SELECT src AS node FROM e0 UNION SELECT dst FROM e0),
           |od AS (SELECT src, count(*) AS outdeg FROM e0 GROUP BY 1),
           |r0 AS (SELECT node, CASE WHEN node IN (3, 11)
           |    THEN 1000000000000 // 2 ELSE 0 END AS rank FROM nodes),
           |${(1 to 5).map(iterCte).mkString(",\n")}
           |SELECT node AS host, CAST(rank AS BIGINT) AS rank FROM r5
           |ORDER BY host""".stripMargin
      }
    ),

    // ---- ER: master-data revenue rollup ------------------------------------
    // What entity resolution is FOR: revenue attributed to the canonical
    // entity instead of the raw name (unmerged names would split each
    // entity's revenue across its variants). Fact side touched twice,
    // both keyed equi-joins; the ER subtree is the vocabulary-grain
    // pipeline of er_entities.
    "er_entity_revenue" -> QuerySpec(
      (s, dir) => {
        val part = t(s, dir, "part")
        val mapping = EntityResolution.nameComponents(part, "p_name")
        val pk = part.select(col("p_partkey"), col("p_name").as("name"))
          .join(mapping, "name")
        t(s, dir, "lineitem")
          .join(pk, col("l_partkey") === col("p_partkey"))
          .groupBy("entity")
          .agg(QuerySpec.sumMoney(QuerySpec.dec4(col("l_extendedprice")))
            .as("revenue"),
            countDistinct(col("p_partkey")).as("n_parts"),
            count(lit(1)).as("n_lines"))
          .orderBy("entity")
      },
      s"""WITH RECURSIVE $pairCtes,
         |sym AS (SELECT name_a AS s, name_b AS d FROM pairs
         |  UNION SELECT name_b, name_a FROM pairs),
         |reach(node, comp) AS (
         |  SELECT name, name FROM names
         |  UNION
         |  SELECT e.d, r.comp FROM reach r JOIN sym e ON e.s = r.node),
         |cc AS (SELECT node AS name, min(comp) AS entity FROM reach
         |  GROUP BY 1)
         |SELECT cc.entity,
         |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2)
         |    AS DOUBLE) AS revenue,
         |  CAST(count(DISTINCT p.p_partkey) AS BIGINT) AS n_parts,
         |  CAST(count(*) AS BIGINT) AS n_lines
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |JOIN cc ON p.p_name = cc.name
         |GROUP BY 1 ORDER BY 1""".stripMargin
    ),

    // ---- ER: phonetic (Soundex) blocking keys ------------------------------
    // The third blocking pass real linkage systems run next to token
    // blocking: classic American Soundex of the head noun, as a chain of
    // codegen'd builtins (Fns.soundexKey — spec-verified against Spark's
    // native soundex; DuckDB lacks soundex, so the oracle replays the
    // identical translate/regexp chain). Misspelled-but-sound-alike
    // names land in one block even when no token matches exactly.
    "er_soundex_blocks" -> QuerySpec(
      (s, dir) => {
        val toks = split(col("p_name"), " ")
        val names = t(s, dir, "part")
          .filter(col("p_name").isNotNull)
          .select(col("p_name").as("name"),
            graft.functions.Fns.soundexKey(element_at(toks, -1)).as("key"))
        val perName = t(s, dir, "part").filter(col("p_name").isNotNull)
          .groupBy(col("p_name").as("name")).agg(count(lit(1)).as("n_rows"))
        names.distinct().join(perName, "name")
          .groupBy("key")
          .agg(countDistinct(col("name")).as("block_names"),
            sum("n_rows").as("block_rows"))
          .orderBy("key")
      },
      s"""WITH names AS (SELECT DISTINCT p_name AS name,
         |    ${graft.functions.Fns.duckSoundexSql("string_split(p_name, ' ')[-1]")} AS key
         |  FROM part WHERE p_name IS NOT NULL),
         |per_name AS (SELECT p_name AS name, count(*) AS n_rows FROM part
         |  WHERE p_name IS NOT NULL GROUP BY 1)
         |SELECT key, CAST(count(DISTINCT name) AS BIGINT) AS block_names,
         |  CAST(sum(n_rows) AS BIGINT) AS block_rows
         |FROM names JOIN per_name USING (name)
         |GROUP BY 1 ORDER BY 1""".stripMargin
    ),

    // ---- link prediction: common neighbors + Jaccard ----------------------
    // Candidate pairs = nodes sharing a neighbor (the 2-hop join — fan-out
    // Σdeg², degree-bounded, never all-pairs), scored by common-neighbor
    // count and neighborhood Jaccard in integer ppm. Bounded top-25
    // (TakeOrderedAndProject), deterministic tie-break.
    "graph_common_neighbors" -> QuerySpec(
      (s, dir) => {
        val d = col("doc_id")
        val docs = t(s, dir, "documents")
        val dir0 = docs.select((d % 37).as("a"), ((d * 3 + 1) % 37).as("b"))
          .unionByName(docs.select((d % 37).as("a"), ((d * 7 + 5) % 37).as("b")))
          .filter(col("a") =!= col("b"))
        val und = dir0.unionByName(dir0.select(col("b").as("a"), col("a").as("b")))
          .distinct()
        val deg = und.groupBy("a").agg(count(lit(1)).as("deg"))
        val cn = und.select(col("a").as("n"), col("b").as("x"))
          .join(und.select(col("a").as("n"), col("b").as("y")), "n")
          .filter(col("x") < col("y"))
          .groupBy("x", "y").agg(count(lit(1)).as("cn"))
        cn.join(deg.select(col("a").as("x"), col("deg").as("deg_x")), "x")
          .join(deg.select(col("a").as("y"), col("deg").as("deg_y")), "y")
          .withColumn("jaccard_ppm",
            expr("(cn * 1000000) div (deg_x + deg_y - cn)"))
          .select("x", "y", "cn", "jaccard_ppm")
          .orderBy(col("cn").desc, col("x"), col("y"))
          .limit(25)
      },
      """WITH dir0 AS (
        |  SELECT DISTINCT a, b FROM (
        |    SELECT doc_id % 37 AS a, (doc_id * 3 + 1) % 37 AS b FROM documents
        |    UNION ALL
        |    SELECT doc_id % 37, (doc_id * 7 + 5) % 37 FROM documents)
        |  WHERE a <> b),
        |und AS (SELECT a, b FROM dir0 UNION SELECT b, a FROM dir0),
        |deg AS (SELECT a, count(*) AS deg FROM und GROUP BY 1),
        |cn AS (SELECT p.b AS x, q.b AS y, count(*) AS cn
        |  FROM und p JOIN und q ON p.a = q.a AND p.b < q.b
        |  GROUP BY 1, 2)
        |SELECT x, y, cn,
        |  (cn * 1000000) // (dx.deg + dy.deg - cn) AS jaccard_ppm
        |FROM cn JOIN deg dx ON dx.a = x JOIN deg dy ON dy.a = y
        |ORDER BY cn DESC, x, y LIMIT 25""".stripMargin
    ),

    // ---- weighted shortest paths (Bellman–Ford rounds) --------------------
    // BFS generalized to integer weights over a three-edge-class graph
    // (forward ring w=2, back ring w=3, ×3 chord w=5): 10 synchronous
    // relaxations, exact for ≤10-edge paths, closed frontier (only
    // improved nodes relax). The oracle unrolls the same 10 rounds, so
    // equality holds whatever the true diameter.
    "graph_shortest_weighted" -> QuerySpec(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val n = col("doc_id") % 60
        val edges = docs.select(n.as("src"), ((n + 1) % 60).as("dst"), lit(2L).as("w"))
          .unionByName(docs.select(n.as("src"), ((n + 59) % 60).as("dst"), lit(3L).as("w")))
          .unionByName(docs.select(n.as("src"), ((n * 3) % 60).as("dst"), lit(5L).as("w")))
        val seeds = docs.select(n.as("node")).filter(col("node") === 0L)
        LinkGraph.shortestPaths(edges, "src", "dst", "w", seeds, "node",
            rounds = 10)
          .orderBy("node")
      },
      {
        val rounds = (1 to 10).map { i =>
          s"""d$i AS (SELECT node, min(dist) AS dist FROM (
             |  SELECT * FROM d${i - 1}
             |  UNION ALL
             |  SELECT e.dst AS node, d.dist + e.w AS dist
             |  FROM d${i - 1} d JOIN e ON e.src = d.node) GROUP BY 1)""".stripMargin
        }.mkString(",\n")
        s"""WITH raw AS (
           |  SELECT doc_id % 60 AS src, (doc_id % 60 + 1) % 60 AS dst, 2 AS w
           |  FROM documents
           |  UNION ALL
           |  SELECT doc_id % 60, (doc_id % 60 + 59) % 60, 3 FROM documents
           |  UNION ALL
           |  SELECT doc_id % 60, (doc_id % 60 * 3) % 60, 5 FROM documents),
           |e AS (SELECT src, dst, min(w) AS w FROM raw
           |  WHERE src <> dst GROUP BY 1, 2),
           |d0 AS (SELECT DISTINCT doc_id % 60 AS node, 0 AS dist
           |  FROM documents WHERE doc_id % 60 = 0),
           |$rounds
           |SELECT node, CAST(dist AS BIGINT) AS dist FROM d10
           |ORDER BY node""".stripMargin
      }
    ),

    // ---- seeded BFS hop distance ----------------------------------------
    // Crawl-frontier / blast-radius traversal: exact shortest hop count
    // from a seed set over a ring+chord graph (diameter 8 from the seeds,
    // verified — rounds = 8 reaches every node). The oracle unrolls the
    // same 8 frontier expansions.
    "graph_bfs_distance" -> QuerySpec(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val n = col("doc_id") % 60
        val edges = docs.select(n.as("src"), ((n + 1) % 60).as("dst"))
          .unionByName(docs.select(n.as("src"), ((n * 3) % 60).as("dst")))
        val seeds = docs.select(n.as("node")).filter(col("node").isin(0L, 7L))
        LinkGraph.bfsDistance(edges, "src", "dst", seeds, "node", rounds = 8)
          .orderBy("node")
      },
      {
        val rounds = (1 to 8).map { i =>
          s"""d$i AS (SELECT node, min(dist) AS dist FROM (
             |  SELECT * FROM d${i - 1}
             |  UNION ALL
             |  SELECT e.dst AS node, d.dist + 1 AS dist
             |  FROM d${i - 1} d JOIN e ON e.src = d.node) GROUP BY 1)""".stripMargin
        }.mkString(",\n")
        s"""WITH e AS (
           |  SELECT DISTINCT src, dst FROM (
           |    SELECT doc_id % 60 AS src, (doc_id % 60 + 1) % 60 AS dst
           |    FROM documents
           |    UNION ALL
           |    SELECT doc_id % 60, (doc_id % 60 * 3) % 60 FROM documents)
           |  WHERE src <> dst),
           |d0 AS (SELECT DISTINCT doc_id % 60 AS node, 0 AS dist
           |  FROM documents WHERE doc_id % 60 IN (0, 7)),
           |$rounds
           |SELECT node, CAST(dist AS BIGINT) AS dist FROM d8
           |ORDER BY node""".stripMargin
      }
    )
  )
}
