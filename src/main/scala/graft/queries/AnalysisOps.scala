package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.operators.{Retrieval, Sampling}
import graft.functions.Fns

/** Corpus-analysis + sketch-algebra operators: BM25 ranking, Zipf/Heaps
  * lexical statistics, sketch mergeability proofs (the 100 TB property —
  * per-partition sketches union WITHOUT rescanning the corpus), and
  * exact-k weighted sampling (sequential Poisson).
  *
  * House contracts throughout: integer-rational scoring (no float log in
  * any hash-compared column), driver materialization only for
  * provably-bounded sets (top-100 terms), bounded top-k selection
  * (TakeOrderedAndProject / TopKByScore) — never a global sort, never a
  * partition-less window.
  */
object AnalysisOps {

  val specs: Map[String, QuerySpec] = Map(

    // ---- BM25 top-k over the lexical index -----------------------------
    // The saturating, length-normalized default ranking of production
    // lexical search, in the engine's integer-rational form (milli-scaled
    // k1/b, ppm-scaled avgdl, floor-division contributions). Same query
    // batch as tx_tfidf_topk so the two rankings are directly comparable.
    "tx_bm25_topk" -> QuerySpec(
      (s, dir) => {
        import s.implicits._
        val queries = Seq(
          (0, "slow"), (0, "key"),
          (1, "table"), (1, "hash"), (1, "merge"),
          (2, "vector"), (2, "zzz_absent")).toDF("query_id", "term")
        Retrieval.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
            queries, k = 5)
          .orderBy("query_id", "rank")
      },
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |p AS (SELECT term, doc_id, count(*) AS tf FROM toks
        |  WHERE term != '' GROUP BY 1, 2),
        |nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        |dfq AS (SELECT term, count(*) AS df FROM p GROUP BY 1),
        |idf AS (SELECT term, (nd.n * 1000000) // df AS idf FROM dfq, nd),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM p GROUP BY 1),
        |ad AS (SELECT (sum(dl) * 1000000) // count(*) AS avgdl_ppm FROM dl),
        |q(query_id, term) AS (VALUES (0, 'slow'), (0, 'key'),
        |  (1, 'table'), (1, 'hash'), (1, 'merge'),
        |  (2, 'vector'), (2, 'zzz_absent')),
        |sc AS (SELECT q.query_id, p.doc_id,
        |    sum((idf.idf * p.tf * (1000 + 1200)) //
        |      (p.tf * 1000 + (1200 * ((1000 - 750) +
        |        (750 * dl.dl * 1000000) // ad.avgdl_ppm)) // 1000)) AS score
        |  FROM q JOIN p USING (term) JOIN idf USING (term)
        |    JOIN dl USING (doc_id), ad
        |  GROUP BY 1, 2),
        |rk AS (SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
        |  FROM sc)
        |SELECT CAST(query_id AS INTEGER) AS query_id,
        |  CAST(rnk AS INTEGER) AS rank, doc_id,
        |  CAST(score AS BIGINT) AS score
        |FROM rk WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin
    ),

    // ---- reciprocal-rank fusion (hybrid lexical + vector search) --------
    // The default hybrid-search combiner (Cormack et al. 2009): the
    // tx_tfidf_topk lexical ranking and a brute-force cosine ranking over
    // the paired embeddings fuse by rank alone — each hit contributes
    // ⌊1e6/(60+rank)⌋ micro-units, so BM25-unit and cosine-unit scores
    // need no calibration and the fusion is integer-exact.
    "tx_rrf_hybrid" -> QuerySpec(
      (s, dir) => {
        import s.implicits._
        val queries = Seq(
          (0, "slow"), (0, "key"),
          (1, "table"), (1, "hash"), (1, "merge"),
          (2, "vector"), (2, "zzz_absent")).toDF("query_id", "term")
        val lex = Retrieval.tfIdfTopK(t(s, dir, "documents"), "doc_id",
            "text", queries, k = 10)
          .select(col("query_id"), col("rank"), col("doc_id").as("id"))
        val emb = t(s, dir, "embeddings")
        val vec = graft.operators.Ann.bruteForceTopK(emb,
            emb.filter(col("vec_id") < 3), "vec_id", "embedding", 10)
          .select(col("query_id"), col("rank"),
            col("neighbor_id").as("id"))
        Retrieval.rrfFuse(Seq(lex, vec), kConst = 60, topK = 5)
          .orderBy("query_id", "rank")
      },
      {
        val cosqd = "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / " +
          "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * " +
          "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"
        s"""WITH toks AS (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
           |  FROM documents),
           |p AS (SELECT term, doc_id, count(*) AS tf FROM toks
           |  WHERE term != '' GROUP BY 1, 2),
           |nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
           |dfq AS (SELECT term, count(*) AS df FROM p GROUP BY 1),
           |q(query_id, term) AS (VALUES (0, 'slow'), (0, 'key'),
           |  (1, 'table'), (1, 'hash'), (1, 'merge'),
           |  (2, 'vector'), (2, 'zzz_absent')),
           |lsc AS (SELECT q.query_id, p.doc_id,
           |    sum(p.tf * ((nd.n * 1000000) // dfq.df)) AS score
           |  FROM q JOIN p USING (term) JOIN dfq USING (term), nd
           |  GROUP BY 1, 2),
           |lrk AS (SELECT query_id, doc_id AS id, row_number() OVER (
           |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
           |  FROM lsc),
           |vsc AS (SELECT a.vec_id AS query_id, b.vec_id AS id, $cosqd AS cos
           |  FROM embeddings a JOIN embeddings b
           |    ON a.vec_id < 3 AND b.vec_id <> a.vec_id),
           |vrk AS (SELECT query_id, id, row_number() OVER (
           |    PARTITION BY query_id ORDER BY cos DESC, id) AS rnk
           |  FROM vsc),
           |contrib AS (
           |  SELECT query_id, id, 1000000 // (60 + rnk) AS c
           |  FROM lrk WHERE rnk <= 10
           |  UNION ALL
           |  SELECT query_id, id, 1000000 // (60 + rnk) AS c
           |  FROM vrk WHERE rnk <= 10),
           |fused AS (SELECT query_id, id, sum(c) AS rrf_micro
           |  FROM contrib GROUP BY 1, 2),
           |rk AS (SELECT *, row_number() OVER (
           |    PARTITION BY query_id ORDER BY rrf_micro DESC, id) AS rnk
           |  FROM fused)
           |SELECT CAST(query_id AS BIGINT) AS query_id,
           |  CAST(rnk AS INTEGER) AS rank, CAST(id AS BIGINT) AS id,
           |  CAST(rrf_micro AS BIGINT) AS rrf_micro
           |FROM rk WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin
      }
    ),

    // ---- ColBERT-style MaxSim late-interaction re-rank ------------------
    // Multi-vector retrieval (Khattab & Zaharia 2020) in the PLAID
    // serving shape: slot-0 single-vector cosine proposes a 20-deep
    // candidate set per query; MaxSim (Σ over query slots of the max
    // doc-slot cosine, in exact 1e-4 integer units) re-ranks to top-5.
    // Multi-vector fixtures: embeddings grouped 4 slots per document.
    "tx_maxsim_rerank" -> QuerySpec(
      (s, dir) => {
        import graft.operators.Ann
        val emb = t(s, dir, "embeddings")
        val dv = emb.select(expr("vec_id div 4").as("doc_id"),
          (col("vec_id") % 4).cast("int").as("slot"),
          col("embedding").as("vec"))
        val qv = dv.filter(col("doc_id") < 2)
          .withColumnRenamed("doc_id", "query_id")
        val cand = Ann.bruteForceTopK(
            dv.filter(col("slot") === 0).select(col("doc_id"), col("vec")),
            qv.filter(col("slot") === 0)
              .select(col("query_id").as("doc_id"), col("vec")),
            "doc_id", "vec", 20)
          .select(col("query_id"), col("neighbor_id").as("doc_id"))
        Retrieval.maxSimRerank(cand, qv, dv, topK = 5)
          .orderBy("query_id", "rank")
      },
      {
        def cosv(l: String, r: String) =
          s"list_dot_product($l, $r) / (sqrt(list_dot_product($l, $l)) * " +
            s"sqrt(list_dot_product($r, $r)))"
        s"""WITH dv AS (SELECT vec_id // 4 AS doc_id, vec_id % 4 AS slot,
           |    embedding::DOUBLE[] AS v FROM embeddings),
           |qv AS (SELECT doc_id AS query_id, slot, v FROM dv WHERE doc_id < 2),
           |s0q AS (SELECT query_id, v FROM qv WHERE slot = 0),
           |s0d AS (SELECT doc_id, v FROM dv WHERE slot = 0),
           |csc AS (SELECT q.query_id, d.doc_id, ${cosv("q.v", "d.v")} AS cos
           |  FROM s0q q JOIN s0d d ON d.doc_id <> q.query_id),
           |cand AS (SELECT query_id, doc_id FROM (
           |  SELECT query_id, doc_id, row_number() OVER (
           |    PARTITION BY query_id ORDER BY cos DESC, doc_id) AS rn
           |  FROM csc) WHERE rn <= 20),
           |pr AS (SELECT c.query_id, c.doc_id, q.slot AS qslot,
           |    CAST(round(${cosv("q.v", "d.v")} * 10000) AS BIGINT) AS cm
           |  FROM cand c JOIN qv q ON q.query_id = c.query_id
           |    JOIN dv d ON d.doc_id = c.doc_id),
           |mx AS (SELECT query_id, doc_id, qslot, max(cm) AS best
           |  FROM pr GROUP BY 1, 2, 3),
           |sm AS (SELECT query_id, doc_id, sum(best) AS maxsim_micro
           |  FROM mx GROUP BY 1, 2),
           |rk AS (SELECT *, row_number() OVER (
           |    PARTITION BY query_id ORDER BY maxsim_micro DESC, doc_id) AS rnk
           |  FROM sm)
           |SELECT CAST(query_id AS BIGINT) AS query_id,
           |  CAST(rnk AS INTEGER) AS rank, CAST(doc_id AS BIGINT) AS doc_id,
           |  CAST(maxsim_micro AS BIGINT) AS maxsim_micro
           |FROM rk WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin
      }
    ),

    // ---- Zipf rank-frequency slope -------------------------------------
    // Corpus health check (natural text ⇒ slope ≈ −1; template/spam
    // corpora deviate). The distributed part is the term-frequency
    // aggregation + a bounded top-100 (TakeOrderedAndProject); the
    // 100-point log-log least squares runs on the driver (documented
    // bounded contract, like centroid/histogram materializations).
    // Rounded to 4 decimals — far above the ~1e-12 accumulation
    // difference between summation orders.
    "tx_zipf_slope" -> QuerySpec(
      (s, dir) => {
        import s.implicits._
        val top = t(s, dir, "documents")
          .select(explode(Fns.tokens(col("text"))).as("term"))
          .filter(col("term") =!= "")
          .groupBy("term").agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("term")).limit(100)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        val n = top.length
        val pts = top.zipWithIndex.map { case ((_, f), i) =>
          (math.log(i + 1.0), math.log(f.toDouble)) }
        val xm = pts.map(_._1).sum / n
        val ym = pts.map(_._2).sum / n
        val num = pts.map { case (x, y) => (x - xm) * (y - ym) }.sum
        val den = pts.map { case (x, _) => (x - xm) * (x - xm) }.sum
        val slope = BigDecimal(num / den)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        Seq((n, top.head._1, top.head._2, slope))
          .toDF("n_terms", "top_term", "top_freq", "slope")
      },
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |f AS (SELECT term, count(*) AS freq FROM toks
        |  WHERE term != '' GROUP BY 1),
        |tp AS (SELECT term, freq FROM f ORDER BY freq DESC, term LIMIT 100),
        |r AS (SELECT term, freq,
        |    ln(CAST(row_number() OVER (ORDER BY freq DESC, term) AS DOUBLE)) AS x,
        |    ln(CAST(freq AS DOUBLE)) AS y
        |  FROM tp)
        |SELECT CAST(count(*) AS INTEGER) AS n_terms,
        |  (SELECT term FROM tp ORDER BY freq DESC, term LIMIT 1) AS top_term,
        |  (SELECT freq FROM tp ORDER BY freq DESC, term LIMIT 1) AS top_freq,
        |  round(regr_slope(y, x), 4) AS slope
        |FROM r""".stripMargin
    ),

    // ---- Heaps' law: vocabulary growth curve ---------------------------
    // Distinct-vocabulary size at nested corpus prefixes (1/8, 1/4, 1/2,
    // full by doc_id — the ingest order). One corpus tokenize feeds BOTH
    // curves: first-seen doc per term (vocab side) and per-doc token
    // counts (token side); the 4 thresholds broadcast into keyed aggs —
    // no per-checkpoint rescan.
    "tx_heaps_law" -> QuerySpec(
      (s, dir) => {
        import s.implicits._
        val toks = t(s, dir, "documents")
          .select(col("doc_id"), explode(Fns.tokens(col("text"))).as("term"))
          .filter(col("term") =!= "")
        val mx = t(s, dir, "documents").agg((max("doc_id") + 1).as("m"))
        val thr = Seq(8L, 4L, 2L, 1L).toDF("den")
          .crossJoin(broadcast(mx))
          .select(col("den"), expr("m div den").as("thr"))
        val fs = toks.groupBy("term").agg(min("doc_id").as("fs"))
        val vocab = fs.crossJoin(broadcast(thr))
          .filter(col("fs") < col("thr"))
          .groupBy("den", "thr").agg(count(lit(1)).as("vocab"))
        val dlen = toks.groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
        val ntok = dlen.crossJoin(broadcast(thr))
          .filter(col("doc_id") < col("thr"))
          .groupBy(col("den").as("d2")).agg(sum("n_tok").as("n_tokens"))
        vocab.join(ntok, col("den") === col("d2"))
          .select(col("den"), col("thr"), col("n_tokens"), col("vocab"))
          .orderBy("den")
      },
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tk AS (SELECT doc_id, term FROM toks WHERE term != ''),
        |mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
        |thr AS (SELECT den, m // den AS thr
        |  FROM (SELECT unnest([8, 4, 2, 1]) AS den), mx),
        |fs AS (SELECT term, min(doc_id) AS fs FROM tk GROUP BY 1),
        |v AS (SELECT den, thr, count(*) AS vocab
        |  FROM fs, thr WHERE fs < thr GROUP BY 1, 2),
        |dlen AS (SELECT doc_id, count(*) AS n_tok FROM tk GROUP BY 1),
        |nt AS (SELECT den, sum(n_tok) AS n_tokens
        |  FROM dlen, thr WHERE doc_id < thr GROUP BY 1)
        |SELECT CAST(v.den AS BIGINT) AS den, v.thr,
        |  CAST(nt.n_tokens AS BIGINT) AS n_tokens,
        |  CAST(v.vocab AS BIGINT) AS vocab
        |FROM v JOIN nt ON v.den = nt.den
        |ORDER BY v.den""".stripMargin
    ),

    // ---- HLL mergeability: per-source registers ∪ == direct ------------
    // The sketch-algebra property a 100 TB deployment lives on: each
    // partition/source keeps its own 64-register vector; the global
    // distinct estimate is the ELEMENTWISE MAX of the vectors — no
    // rescan, no raw-key exchange. Output = merged vs direct registers
    // per bucket with the equality flag the oracle re-derives.
    "agg_hll_union" -> QuerySpec(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val merged = docs.groupBy("source")
          .agg(Fns.hllRegisters(col("text"), 64).as("regs"))
          .select(posexplode(col("regs")).as(Seq("bucket", "reg")))
          .groupBy("bucket").agg(max("reg").as("merged"))
        val direct = docs.agg(Fns.hllRegisters(col("text"), 64).as("regs"))
          .select(posexplode(col("regs")).as(Seq("b2", "direct")))
        merged.join(direct, col("bucket") === col("b2"))
          .select(col("bucket"), col("merged").cast("int").as("merged"),
            col("direct").cast("int").as("direct"),
            (col("merged") === col("direct")).as("mergeable"))
          .orderBy("bucket")
      },
      """WITH k AS (SELECT DISTINCT source, text AS key FROM documents),
        |hh AS (SELECT source, key, CASE WHEN key = '' THEN 0 ELSE list_reduce(
        |    list_transform(string_split(key, ''),
        |      x -> CAST(ascii(x) AS BIGINT)),
        |    (a, b) -> (a*31 + b) % 1000000007) END AS bh
        |  FROM k),
        |r AS (SELECT source, bh % 64 AS bucket,
        |    CASE WHEN (3*bh + 43) % 1000000007 = 0 THEN 31
        |      ELSE bit_count((((3*bh + 43) % 1000000007)
        |        & (-((3*bh + 43) % 1000000007))) - 1) + 1 END AS rank
        |  FROM hh),
        |ps AS (SELECT source, bucket, max(rank) AS register
        |  FROM r GROUP BY 1, 2),
        |m AS (SELECT bucket, max(register) AS merged FROM ps GROUP BY 1),
        |d AS (SELECT bucket, max(rank) AS direct FROM r GROUP BY 1)
        |SELECT CAST(b.bucket AS INTEGER) AS bucket,
        |  CAST(COALESCE(m.merged, 0) AS INTEGER) AS merged,
        |  CAST(COALESCE(d.direct, 0) AS INTEGER) AS direct,
        |  COALESCE(m.merged, 0) = COALESCE(d.direct, 0) AS mergeable
        |FROM (SELECT unnest(range(0, 64)) AS bucket) b
        |LEFT JOIN m ON b.bucket = m.bucket
        |LEFT JOIN d ON b.bucket = d.bucket
        |ORDER BY bucket""".stripMargin
    ),

    // ---- KMV theta sketch: audience-overlap estimation -------------------
    // The distinct-count sketch with SET ALGEBRA: the k smallest distinct
    // scattered hashes per audience ([[graft.functions.KmvSketch]], a
    // bounded mergeable aggregate — O(k) state, map-side combined) give
    // |A|, |B|, |A∪B|, |A∩B| estimates HLL registers cannot (no register
    // intersection). The scatter is an affine bijection mod p (the raw
    // rolling hash of short id strings clusters near 0 — measured est
    // 36.5M for 150 true before the scatter, 147 after). All estimators
    // are integer floor divisions over the emitted arrays; exact counts
    // ride along so the row shows the estimate quality. Audiences:
    // high-value purchasers × late-window error users.
    "agg_kmv_intersect" -> QuerySpec(
      (s, dir) => {
        import graft.Tables.epochS
        val k = 64
        val ev = t(s, dir, "events")
        val day = (epochS(col("ts")) / 86400).cast("long")
        def scatter(c: org.apache.spark.sql.Column) =
          (Fns.rollingHash(c.cast("string")) * lit(777767777L) + lit(13L)) %
            lit(1000000007L)
        def sketch(df: org.apache.spark.sql.DataFrame, label: String) =
          broadcast(df.select(col("user_id"), scatter(col("user_id")).as("h"))
            .agg(Fns.kmvMinima(col("h"), k).as(s"m_$label"),
              countDistinct(col("user_id")).as(s"exact_$label")))
        val a = sketch(ev.filter(col("event_type") === "purchase" &&
          col("value") > 75), "a")
        val b = sketch(ev.filter(col("event_type") === "error" &&
          day >= 19745), "b")
        def est(m: String) = when(size(col(m)) < k, size(col(m)).cast("long"))
          .otherwise(expr(
            s"(cast(63 as bigint) * 1000000007) div element_at($m, -1)"))
        a.crossJoin(b)
          .withColumn("mu", slice(array_sort(array_union(col("m_a"), col("m_b"))), 1, k))
          .withColumn("mi", array_intersect(col("m_a"), col("m_b")))
          .withColumn("est_union", when(size(col("mu")) < k,
            size(col("mu")).cast("long")).otherwise(expr(
            "(cast(63 as bigint) * 1000000007) div element_at(mu, -1)")))
          .withColumn("n_inter",
            size(array_intersect(col("mu"), col("mi"))).cast("long"))
          .select(col("exact_a"), col("exact_b"),
            est("m_a").as("est_a"), est("m_b").as("est_b"),
            col("est_union"),
            expr("(n_inter * est_union) div size(mu)").as("est_inter"))
      },
      {
        val h = "CASE WHEN CAST(user_id AS VARCHAR) IS NULL OR " +
          "CAST(user_id AS VARCHAR) = '' THEN 0 ELSE " +
          "list_reduce(list_transform(string_split(CAST(user_id AS VARCHAR),''), " +
          "x -> CAST(ascii(x) AS BIGINT)), (a,b) -> (a*31+b)%1000000007) END"
        s"""WITH ea AS (SELECT DISTINCT user_id, ($h * 777767777 + 13) % 1000000007 AS h
           |  FROM events WHERE event_type = 'purchase' AND value > 75),
           |eb AS (SELECT DISTINCT user_id, ($h * 777767777 + 13) % 1000000007 AS h
           |  FROM events WHERE event_type = 'error'
           |    AND (epoch_ms(ts)//1000)//86400 >= 19745),
           |ra AS (SELECT h, row_number() OVER (ORDER BY h) AS rn
           |  FROM (SELECT DISTINCT h FROM ea)),
           |rb AS (SELECT h, row_number() OVER (ORDER BY h) AS rn
           |  FROM (SELECT DISTINCT h FROM eb)),
           |ka AS (SELECT list(h ORDER BY h) AS ma FROM ra WHERE rn <= 64),
           |kb AS (SELECT list(h ORDER BY h) AS mb FROM rb WHERE rn <= 64),
           |xa AS (SELECT count(DISTINCT user_id) AS exact_a FROM ea),
           |xb AS (SELECT count(DISTINCT user_id) AS exact_b FROM eb),
           |c AS (SELECT * FROM ka, kb, xa, xb),
           |f AS (SELECT exact_a, exact_b,
           |    CASE WHEN len(ma) < 64 THEN len(ma)
           |      ELSE (CAST(63 AS BIGINT) * 1000000007) // ma[-1] END AS est_a,
           |    CASE WHEN len(mb) < 64 THEN len(mb)
           |      ELSE (CAST(63 AS BIGINT) * 1000000007) // mb[-1] END AS est_b,
           |    list_sort(list_distinct(list_concat(ma, mb)))[1:64] AS mu,
           |    list_intersect(ma, mb) AS mi
           |  FROM c),
           |g AS (SELECT exact_a, exact_b, est_a, est_b,
           |    CASE WHEN len(mu) < 64 THEN len(mu)
           |      ELSE (CAST(63 AS BIGINT) * 1000000007) // mu[-1] END AS est_union,
           |    len(list_intersect(mu, mi)) AS n_inter, len(mu) AS m_u
           |  FROM f)
           |SELECT CAST(exact_a AS BIGINT) AS exact_a,
           |  CAST(exact_b AS BIGINT) AS exact_b,
           |  CAST(est_a AS BIGINT) AS est_a, CAST(est_b AS BIGINT) AS est_b,
           |  CAST(est_union AS BIGINT) AS est_union,
           |  CAST((n_inter * est_union) // m_u AS BIGINT) AS est_inter
           |FROM g""".stripMargin
      }
    ),

    // ---- Count-Min mergeability: per-source matrices + == direct -------
    // The frequency-sketch sibling: CM counters are plain sums, so the
    // union of per-source sketches is the ELEMENTWISE SUM — again no
    // rescan. 3×64 row-major cells, merged vs direct.
    "agg_cms_union" -> QuerySpec(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val merged = docs.groupBy("source")
          .agg(Fns.countMin(col("text"), 3, 64).as("cm"))
          .select(posexplode(col("cm")).as(Seq("pos", "c")))
          .groupBy("pos").agg(sum("c").as("merged"))
        val direct = docs.agg(Fns.countMin(col("text"), 3, 64).as("cm"))
          .select(posexplode(col("cm")).as(Seq("p2", "direct")))
        merged.join(direct, col("pos") === col("p2"))
          .select(col("pos"), col("merged").cast("long").as("merged"),
            col("direct").cast("long").as("direct"),
            (col("merged") === col("direct")).as("mergeable"))
          .orderBy("pos")
      },
      """WITH s AS (SELECT source, text AS key FROM documents),
        |hh AS (SELECT source, CASE WHEN key = '' THEN 0 ELSE list_reduce(
        |    list_transform(string_split(key, ''),
        |      x -> CAST(ascii(x) AS BIGINT)),
        |    (a, b) -> (a*31 + b) % 1000000007) END AS bh
        |  FROM s),
        |sl AS (
        |  SELECT source, 0 AS row_i, ((1*bh + 41) % 1000000007) % 64 AS col_j FROM hh
        |  UNION ALL
        |  SELECT source, 1, ((3*bh + 43) % 1000000007) % 64 FROM hh
        |  UNION ALL
        |  SELECT source, 2, ((5*bh + 47) % 1000000007) % 64 FROM hh),
        |ps AS (SELECT source, row_i*64 + col_j AS pos, count(*) AS c
        |  FROM sl GROUP BY 1, 2),
        |m AS (SELECT pos, sum(c) AS merged FROM ps GROUP BY 1),
        |d AS (SELECT row_i*64 + col_j AS pos, count(*) AS direct
        |  FROM sl GROUP BY 1)
        |SELECT CAST(b.pos AS INTEGER) AS pos,
        |  CAST(COALESCE(m.merged, 0) AS BIGINT) AS merged,
        |  CAST(COALESCE(d.direct, 0) AS BIGINT) AS direct,
        |  COALESCE(m.merged, 0) = COALESCE(d.direct, 0) AS mergeable
        |FROM (SELECT unnest(range(0, 192)) AS pos) b
        |LEFT JOIN m ON b.pos = m.pos
        |LEFT JOIN d ON b.pos = d.pos
        |ORDER BY pos""".stripMargin
    ),

    // ---- Sequential Poisson weighted sample (exact k, integer-exact) ---
    // 100 docs weighted by length: P(in sample) ≈ n_chars-proportional.
    // Priority = (h·1e9) div w on the integer key hash — the selected
    // SET is bit-identical across engines/partitionings (no float
    // pow/log), selection is bounded top-k (TakeOrderedAndProject).
    "sp_weighted_sample" -> QuerySpec(
      (s, dir) =>
        Sampling.weightedSample(
          t(s, dir, "documents").select("doc_id", "n_chars"),
          "doc_id", col("n_chars"), k = 100),
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |    ((CASE WHEN CAST(doc_id AS VARCHAR) = '' THEN 0 ELSE list_reduce(
        |        list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
        |          x -> CAST(ascii(x) AS BIGINT)),
        |        (a, b) -> (a*31 + b) % 1000000007) END
        |      * 1315423911 + 2654435761) % 1000000007) AS ih
        |  FROM documents
        |  WHERE n_chars > 0 AND n_chars <= 1000000000)
        |SELECT doc_id, n_chars,
        |  (ih * 1000000000) // n_chars AS priority
        |FROM h ORDER BY priority, doc_id LIMIT 100""".stripMargin
    )
  )
}
