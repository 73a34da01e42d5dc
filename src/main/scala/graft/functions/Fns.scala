package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column-level function library.
  *
  * Everything here is composed from `org.apache.spark.sql.functions` builtins
  * (codegen'd, whole-stage-compatible) — no Scala UDFs in the hot path. Each
  * helper has a documented DuckDB-SQL equivalent so results can be
  * hash-verified against the driver's oracle.
  *
  * Reference provenance (see SURVEY.md §2.9): the reference's scalar surface
  * is md5 digests (/root/reference/connectors/csvETL.js:214-255), dayjs date
  * parsing (csvETL.js:80-90), the 13-digit epoch-ms heuristic
  * (csvETL.js:81-90), and JSON (de)serialization — all mapped to builtins
  * below.
  */
object Fns {

  /** Modulus for the deterministic polynomial rolling hash. Prime, small
    * enough that acc*31+255 never overflows a signed 64-bit long.
    */
  val HashMod: Long = 1000000007L

  /** Deterministic polynomial rolling hash of a string's ASCII codes:
    * `h = fold(0, h*31 + ascii(c) mod p)`.
    *
    * Engine-portable: DuckDB equivalent is
    * `list_reduce(list_transform(string_split(s,''), x -> ascii(x)),
    *              (a,b) -> (a*31+b)%1000000007)`
    * (DuckDB's seedless reduce starts at ascii(c0), identical to folding 0).
    * Used for document fingerprinting and as the base hash for MinHash /
    * SimHash / LSH so oracle SQL can reproduce signatures exactly.
    */
  /** Column↔Expression bridge for custom Catalyst expressions (Spark 4). */
  def ofExpr(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.GraftSqlBridge.column(e)
  def toExpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftSqlBridge.expression(c)

  /** Bounded per-group top-k (score desc, id asc) with map-side partial
    * aggregation — see [[TopKByScore]]. Returns array<struct<score,id>>
    * best-first.
    */
  /** Codegen'd squared L2 distance (element-order fold — see [[L2Dist]]). */
  def l2Dist(a: Column, b: Column): Column =
    ofExpr(L2Dist(toExpr(a), toExpr(b)))

  def topKByScore(score: Column, id: Column, k: Int): Column =
    ofExpr(TopKByScore(toExpr(score), toExpr(id), k).toAggregateExpression())

  /** [[topKByScore]] that additionally DEDUPS candidates by id inside the
    * aggregate buffer (O(k) membership scan, k = a beam width). Only valid
    * when every occurrence of an id within a group carries the same score —
    * the graph-walk rounds' contract — where it replaces a distinct()
    * exchange plus a seen-set anti-join per round (each a sequential AQE
    * job barrier at serve grain).
    */
  def topKByScoreDistinct(score: Column, id: Column, k: Int): Column =
    ofExpr(TopKByScore(toExpr(score), toExpr(id), k, distinctIds = true)
      .toAggregateExpression())

  /** [[topKByScore]] with a LONG score — integer-exact comparisons for
    * selection keys that exceed double's 2^53 mantissa (see
    * [[TopKByLongScore]]; same order contract: score desc, id asc).
    */
  def topKByLongScore(score: Column, id: Column, k: Int): Column =
    ofExpr(TopKByLongScore(toExpr(score), toExpr(id), k).toAggregateExpression())

  /** Banded Levenshtein: exact distance when ≤ bound, else bound + 1 —
    * O(len·bound) instead of O(len²) (see [[LevenshteinWithin]]; lossless
    * under any `lev ≤ bound` filter).
    */
  def levenshteinWithin(l: Column, r: Column, bound: Column): Column =
    ofExpr(LevenshteinWithin(toExpr(l), toExpr(r), toExpr(bound)))

  /** Bounded KMV theta sketch: the k smallest distinct hash values per
    * group, ascending (see [[KmvSketch]] — map-side partial aggregation,
    * supports intersection estimates HLL cannot).
    */
  def kmvMinima(h: Column, k: Int): Column =
    ofExpr(KmvSketch(toExpr(h), k).toAggregateExpression())

  /** Integer-exact log-bucketed quantile histogram (see [[LogHistogram]]
    * — DDSketch-class relative-error quantiles, order-independent
    * bucket-count sums, bounded state).
    */
  def logHistogram(v: Column, subBits: Int): Column =
    ofExpr(LogHistogram(toExpr(v), subBits).toAggregateExpression())

  /** Codegen'd PQ asymmetric-distance fold `Σ_s lut[s][codes[s]]` (see
    * [[AdcScore]] — subspace-ascending, oracle-identical).
    */
  def adcScore(codes: Column, lut: Column): Column =
    ofExpr(AdcScore(toExpr(codes), toExpr(lut)))

  /** Codegen'd literal-matrix rotation `R·(v − μ)` (see [[MatVec]] —
    * per-dim ascending fold, bit-identical to the HOF form it replaces).
    */
  def matVec(v: Column, mean: Array[Double],
      rot: Array[Array[Double]]): Column =
    ofExpr(MatVec(toExpr(v), mean, rot))

  /** The 128-bit line key of line-level dedup: `struct(h1, h2)` of two
    * independent xxhash64 seeds — 16-byte shuffle keys so line TEXT never
    * shuffles in the winner aggregation, with the collision contract of
    * [[graft.operators.Dedup.substringDedup]]. Registered in SQL as
    * `line_key128` so external pipelines reproduce the exact keying.
    */
  def lineKey128(line: Column): Column =
    struct(xxhash64(line).as("h1"), xxhash64(lit(1L), line).as("h2"))

  /** Misra–Gries heavy-hitters summary aggregate: map<string, bigint>
    * of ≤ k-1 candidate keys with lower-bound counters (see
    * [[MisraGries]] for the est/true/n-over-k guarantee contract).
    */
  def misraGries(key: Column, k: Int): Column =
    ofExpr(MisraGries(toExpr(key.cast("string")), k).toAggregateExpression())

  /** Count-Min sketch aggregate: d×w counter matrix as array<bigint>,
    * row-major (see [[CountMin]] — deterministic content, est ≥ true).
    */
  def countMin(key: Column, d: Int, w: Int): Column =
    ofExpr(CountMin(toExpr(key.cast("string")), d, w).toAggregateExpression())

  /** Single-pass Aho–Corasick blocklist hit count over a plan-time
    * pattern list (see [[MultiPatternCount]] — word-boundary contract,
    * multi-word phrases allowed).
    */
  def multiPatternCount(text: Column, patterns: Seq[String]): Column =
    ofExpr(MultiPatternCount(toExpr(text), patterns))

  /** HyperLogLog register-vector aggregate: m registers as array<int>
    * (see [[HllRegisters]] — deterministic content, elementwise-max
    * merge, portable-hash replayable).
    */
  def hllRegisters(key: Column, m: Int): Column =
    ofExpr(HllRegisters(toExpr(key.cast("string")), m).toAggregateExpression())

  /** Bloom bitset build aggregate over a BIGINT key column (see
    * [[BloomFilterAgg]]).
    */
  def bloomFilterBuild(key: Column, numBits: Int, numHashes: Int): Column =
    ofExpr(BloomFilterAgg(toExpr(key), numBits, numHashes).toAggregateExpression())

  /** Codegen'd bloom membership probe against a plan-time constant bitset
    * (see [[BloomMightContain]]).
    */
  def bloomMightContain(key: Column, bloom: Array[Byte], numHashes: Int): Column =
    ofExpr(BloomMightContain(toExpr(key), bloom, numHashes))

  def rollingHash(s: Column): Column =
    // native codegen'd expression (graft.functions.RollingHash); the
    // composable HOF fold (aggregate∘transform∘split) computes the same
    // value but interprets a lambda per character — ~10× slower in the
    // MinHash/fingerprint hot path. Null maps to 0 to match the oracle's
    // CASE guard.
    when(s.isNull, lit(0L))
      .otherwise(ofExpr(RollingHash(toExpr(s))))

  /** i-th MinHash permutation of a base hash: (a_i * h + b_i) mod p with
    * a_i = 2i+1 (odd), b_i = i^2+i+41. Deterministic and oracle-expressible.
    */
  def permuteHash(h: Column, i: Int): Column =
    (h * lit(2L * i + 1) + lit(1L * i * i + i + 41)) % lit(HashMod)

  /** Classic American Soundex as a chain of codegen'd builtins (upper →
    * consonant digits → H/W transparency after position 1 → run collapse
    * → vowel strip → 4-pad). Verified character-identical to Spark's
    * native `soundex` on LETTER-LEADING input (canonical names:
    * Ashcraft→A261, Pfister→P236, Tymczak→T522, Honeyman→H555) — the
    * equivalence claim is scoped to that domain: for non-letter-leading
    * input Spark's builtin returns the value unchanged ('123'→'123')
    * while this chain emits a padded digit key ('123'→'1230'); callers
    * feeding arbitrary strings get the chain's contract, not the
    * builtin's. Oracle-replicable either way: DuckDB has no soundex, but
    * has the identical translate/regexp_replace/rpad chain
    * ([[duckSoundexSql]]). Null/empty pass through null.
    */
  def soundexKey(c: Column): Column = {
    import org.apache.spark.sql.functions.{concat, length, regexp_replace,
      rpad, substring, translate, upper, when}
    val u = upper(c)
    val cAll = translate(u, "BFPVCGJKQSXZDTLMNR", "111122222222334556")
    val cHw = concat(substring(cAll, 1, 1),
      translate(substring(cAll, 2, 1000000), "HW", ""))
    val coll = regexp_replace(cHw, "([1-6])\\1+", "$1")
    val key0 = concat(substring(u, 1, 1),
      translate(substring(coll, 2, 1000000), "AEIOUY", ""))
    when(c.isNotNull && length(u) > 0, rpad(substring(key0, 1, 4), 4, "0"))
  }

  /** DuckDB SQL fragment computing [[soundexKey]] of the expression `e`
    * (same chain, `\\1`+`g`-flag replacement syntax).
    */
  def duckSoundexSql(e: String): String = {
    val u = s"upper($e)"
    val cAll = s"translate($u, 'BFPVCGJKQSXZDTLMNR', '111122222222334556')"
    val cHw = s"concat(substr($cAll, 1, 1), translate(substr($cAll, 2), 'HW', ''))"
    val coll = s"regexp_replace($cHw, '([1-6])\\1+', '\\1', 'g')"
    val key0 = s"concat(substr($u, 1, 1), translate(substr($coll, 2), 'AEIOUY', ''))"
    s"CASE WHEN $e IS NOT NULL AND length($u) > 0 " +
      s"THEN rpad(substr($key0, 1, 4), 4, '0') END"
  }

  /** Whitespace tokenization matching DuckDB's
    * `string_split_regex(trim(s), '\s+')`. Lowercases first.
    */
  def tokens(s: Column): Column =
    split(trim(lower(s)), "\\s+")

  /** Word n-gram shingles of a text column as an array of strings
    * (space-joined n-grams). Empty array when fewer than n tokens.
    * DuckDB equivalent: unnest(range(...)) + list_slice + array_to_string.
    */
  def shingles(s: Column, n: Int): Column = {
    val ts = tokens(s)
    // NB: HOF lambdas are interpreted (no codegen) — fine for per-row use;
    // corpus-scale shingling uses the relational formulation in
    // graft.operators.Dedup.shingleIndex instead.
    when(size(ts) < n, array().cast("array<string>")).otherwise(
      transform(
        sequence(lit(0), size(ts) - n),
        i => concat_ws(" ", slice(ts, i + 1, lit(n)))
      )
    )
  }

  /** Deterministic surrogate key: md5 over '|'-joined column values
    * (SURVEY §2.2 P8; reference: transform/amplitudeToMixpanel.js:160-163).
    * Canonical field order is the caller's argument order — documented
    * divergence from the reference's JS-object-serialization hash
    * (SURVEY §7.4.3): same event ⇒ same id is the contract, not
    * byte-parity with the reference.
    */
  def mpInsertId(cols: Column*): Column =
    md5(concat_ws("|", cols: _*))

  /** Time normalization with the reference's 13-digit epoch-ms heuristic
    * (connectors/csvETL.js:81-90): numeric strings of >=13 digits are epoch
    * millis, shorter are epoch seconds; non-numeric strings are parsed as
    * timestamps. Returns epoch seconds as long.
    */
  def normalizeEpochSeconds(c: Column): Column = {
    val digits = c.cast("string")
    // nested (not repeated) branches: one rlike per value and a smaller
    // codegen tree — this helper is often instantiated several times in
    // one projection
    when(digits.rlike("^[0-9]+$"),
      when(length(digits) >= 13, (digits.cast("long") / 1000L).cast("long"))
        .otherwise(digits.cast("long")))
      .otherwise(unix_timestamp(to_timestamp(digits)))
  }

  /** First non-empty-string, non-null wins (reference ID coalescing treats
    * "" as missing: transform/gaToMixpanel.js:135). */
  def coalesceNonEmpty(cols: Column*): Column =
    coalesce(cols.map(c => when(c.isNull || c.cast("string") === "", lit(null)).otherwise(c.cast("string"))): _*)

  /** Map-merge with later-wins precedence (JS object-spread semantics,
    * SURVEY §2.2 P9; transform/amplitudeToMixpanel.js:138). Requires
    * spark.sql.mapKeyDedupPolicy=LAST_WIN (set in GraftSession).
    */
  def mapMergeLastWins(maps: Column*): Column =
    map_concat(maps: _*)

  /** Dot product of two equal-length numeric array columns as double.
    * Sequential left-fold ⇒ deterministic; oracle uses unnest+sum with
    * round() absorbing the reordering error.
    */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d),
      (acc, v) => acc + v
    )

  /** L2 norm of a numeric array column. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity of two embedding columns — interpreted HOF form
    * (kept as the readable reference implementation and for non-double
    * arrays; the hot paths use [[cosineSim]]).
    */
  def cosine(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine similarity via the native codegen'd [[CosineSim]] expression —
    * bit-identical to [[cosine]] (same element-order fold) but stays inside
    * whole-stage codegen; use for all-pairs / top-k scoring loops. Inputs
    * must be `array<double>`.
    */
  def cosineSim(a: Column, b: Column): Column =
    ofExpr(CosineSim(toExpr(a.cast("array<double>")), toExpr(b.cast("array<double>"))))
}
