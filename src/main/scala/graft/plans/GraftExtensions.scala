package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{ConcatWs, CreateNamedStruct, Expression, Literal, Md5, RegExpReplace, StringReplace, StringTrim, XxHash64}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{AdcScore, CommonPrefixLen, CosineSim, CountMin, Fns, HllRegisters, KmvSketch, L2Dist, LevenshteinWithin, MisraGries, MultiPatternCount, RollingHash, TopKByScore}

/** Engine SQL-surface registration (SURVEY §2.12):
  *
  *  - `rolling_hash(s)`       — native codegen'd portable hash
  *  - `mp_insert_id(c1, ...)` — deterministic surrogate key (md5 of
  *                              '|'-joined values; SURVEY P8)
  *  - `explode_session(t, h)` — session→events Generator (SURVEY X1)
  *  - `cosine_sim(a, b)`      — codegen'd cosine of two array<double>
  *  - `l2_dist(a, b)`         — codegen'd squared L2 distance
  *  - `topk_by_score(s, id, k)` — bounded per-group top-k aggregate
  *                              (k must be a foldable integer literal)
  *  - `adc_score(codes, lut)` — codegen'd PQ asymmetric-distance fold
  *  - `strip_markup(s)`       — HTML tag/entity/whitespace cleanup (the
  *                              r8 markup-stripping kernel, same
  *                              expression tree as the column API)
  *  - `line_key128(s)`        — line dedup's 128-bit shuffle key
  *  - `common_prefix_len(a, b, cap)` — codegen'd capped char-LCP (the
  *                              suffix-array dup-span kernel; cap must
  *                              be an integer literal)
  *  - `misra_gries(key, k)`   — mergeable heavy-hitters summary
  *                              aggregate (k must be an integer literal)
  *  - `count_min(key, d, w)`  — Count-Min sketch aggregate, d×w counter
  *                              matrix (d, w integer literals)
  *  - `kmv_minima(hash, k)`   — bottom-k theta sketch aggregate (set
  *                              algebra: intersect/union estimates)
  *  - `levenshtein_within(a, b, bound)` — banded edit distance, exact
  *                              ≤ bound, bound+1 above (per-row bound)
  *
  * Two registration paths: `withExtensions(new GraftExtensions)` at
  * session build, or [[GraftExtensions.register]] on a live session
  * (used by Tables.tune so any harness-created session gets the SQL
  * functions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._
  override def apply(e: SparkSessionExtensions): Unit =
    functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def mpInsertId(args: Seq[Expression]): Expression =
    Md5(org.apache.spark.sql.catalyst.expressions.Cast(
      ConcatWs(Literal("|") +: args), org.apache.spark.sql.types.BinaryType))

  /** Catalyst mirror of [[graft.operators.TextAnalysis.stripMarkup]] —
    * registry builders must return directly-resolvable trees (the
    * Column→Expression bridge leaves `functions._` sugar as
    * UnresolvedFunction nodes the analyzer never visits inside a
    * builder), so the chain is restated in catalyst nodes;
    * SqlSurfaceSpec pins SQL == column API so the two cannot drift.
    */
  private def stripMarkup(s: Expression): Expression = {
    val noTags = RegExpReplace(s, Literal("<[^>]*>"), Literal(" "))
    val ents = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    val decoded = ents.foldLeft(noTags: Expression) {
      case (c, (e, r)) => StringReplace(c, Literal(e), Literal(r))
    }
    StringTrim(RegExpReplace(decoded, Literal("\\s+"), Literal(" ")))
  }

  /** Foldable-integer argument for registry builders (k, cap, ...). */
  private def litInt(e: Expression, msg: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => other.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case _ => throw new IllegalArgumentException(msg)
    }
  }

  /** Catalyst mirror of [[graft.functions.Fns.lineKey128]] (same
    * builder-resolvability constraint; xxhash64's default seed is 42).
    */
  private def lineKey128(s: Expression): Expression =
    CreateNamedStruct(Seq(
      Literal("h1"), XxHash64(Seq(s), 42L),
      Literal("h2"), XxHash64(Seq(Literal(1L), s), 42L)))

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("rolling_hash",
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (args: Seq[Expression]) => RollingHash(args.head)),
    ("mp_insert_id",
      new ExpressionInfo("graft.plans.GraftExtensions", "mp_insert_id"),
      (args: Seq[Expression]) => mpInsertId(args)),
    ("explode_session",
      new ExpressionInfo(classOf[ExplodeSession].getName, "explode_session"),
      (args: Seq[Expression]) => ExplodeSession(args(0), args(1))),
    ("cosine_sim",
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))),
    ("l2_dist",
      new ExpressionInfo(classOf[L2Dist].getName, "l2_dist"),
      (args: Seq[Expression]) => L2Dist(args(0), args(1))),
    ("topk_by_score",
      new ExpressionInfo(classOf[TopKByScore].getName, "topk_by_score"),
      (args: Seq[Expression]) => TopKByScore(args(0), args(1),
        litInt(args(2), "topk_by_score(score, id, k): k must be an " +
          "integer literal")).toAggregateExpression()),
    ("common_prefix_len",
      new ExpressionInfo(classOf[CommonPrefixLen].getName, "common_prefix_len"),
      (args: Seq[Expression]) => CommonPrefixLen(args(0), args(1),
        litInt(args(2), "common_prefix_len(a, b, cap): cap must be an " +
          "integer literal"))),
    ("misra_gries",
      new ExpressionInfo(classOf[MisraGries].getName, "misra_gries"),
      (args: Seq[Expression]) => MisraGries(args(0),
        litInt(args(1), "misra_gries(key, k): k must be an integer " +
          "literal")).toAggregateExpression()),
    ("count_min",
      new ExpressionInfo(classOf[CountMin].getName, "count_min"),
      (args: Seq[Expression]) => CountMin(args(0),
        litInt(args(1), "count_min(key, d, w): d must be an integer literal"),
        litInt(args(2), "count_min(key, d, w): w must be an integer literal"))
        .toAggregateExpression()),
    ("adc_score",
      new ExpressionInfo(classOf[AdcScore].getName, "adc_score"),
      (args: Seq[Expression]) => AdcScore(args(0), args(1))),
    ("kmv_minima",
      new ExpressionInfo(classOf[KmvSketch].getName, "kmv_minima"),
      (args: Seq[Expression]) => KmvSketch(args(0),
        litInt(args(1), "kmv_minima(hash, k): k must be an integer " +
          "literal")).toAggregateExpression()),
    ("log_histogram",
      new ExpressionInfo(classOf[graft.functions.LogHistogram].getName,
        "log_histogram"),
      (args: Seq[Expression]) => graft.functions.LogHistogram(args(0),
        litInt(args(1), "log_histogram(v, subBits): subBits must be an " +
          "integer literal")).toAggregateExpression()),
    ("levenshtein_within",
      new ExpressionInfo(classOf[LevenshteinWithin].getName,
        "levenshtein_within"),
      (args: Seq[Expression]) => LevenshteinWithin(args(0), args(1), args(2))),
    ("strip_markup",
      new ExpressionInfo("graft.operators.TextAnalysis", "strip_markup"),
      (args: Seq[Expression]) => stripMarkup(args.head)),
    ("line_key128",
      new ExpressionInfo("graft.functions.Fns", "line_key128"),
      (args: Seq[Expression]) => lineKey128(args.head)),
    ("hll_registers",
      new ExpressionInfo(classOf[HllRegisters].getName, "hll_registers"),
      (args: Seq[Expression]) => HllRegisters(args(0),
        litInt(args(1), "hll_registers(key, m): m must be an integer " +
          "literal")).toAggregateExpression()),
    // pattern list as one comma-separated string literal (patterns with
    // commas are not expressible here -- use Fns.multiPatternCount)
    ("multi_pattern_count",
      new ExpressionInfo(classOf[MultiPatternCount].getName,
        "multi_pattern_count"),
      (args: Seq[Expression]) => MultiPatternCount(args(0), args(1).eval() match {
        case s: org.apache.spark.unsafe.types.UTF8String =>
          s.toString.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
        case _ => throw new IllegalArgumentException(
          "multi_pattern_count(text, patterns): patterns must be a " +
            "comma-separated string literal")
      }))
  )

  /** Idempotent runtime registration on an existing session. Skips names
    * already present: an unconditional `createOrReplaceTempFunction` logs
    * a `SimpleFunctionRegistry` replacement WARN on every call, and this
    * is invoked per table load — thousands of WARN lines per bench run
    * flooding the harness's bounded output capture.
    */
  def register(spark: SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (name, _, builder) =>
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
