package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Vocabulary construction over a corpus — the front end of tokenizer
  * training (BPE/WordPiece start from exactly these two tables: token
  * frequencies and adjacent-pair frequencies).
  *
  * Scale shape: one explode + one map-side-combined count aggregation,
  * then a BOUNDED top-k — `orderBy(…).limit(k)` deliberately, because
  * Catalyst compiles sort+limit into `TakeOrderedAndProject`: each
  * partition keeps its local top-k and the driver merges k×partitions
  * rows. The corpus-sized count table is never globally sorted.
  */
object Vocab {

  /** Top-k corpus tokens by frequency (ties broken token-ascending).
    * Output: (token, cnt), frequency-descending.
    */
  def topTokens(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(Fns.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)

  /** Top-k adjacent token pairs by frequency — BPE's merge-candidate
    * table (Sennrich et al. 2016 count symbol pairs per iteration; at
    * corpus scale the pair count IS the expensive step, the argmax is
    * driver-trivial). Pairs keep ALL occurrences (unlike the distinct
    * shingle index) and are stitched relationally — posexplode + window
    * `lead` — because interpreted HOF slicing was measured ~3.5× slower
    * than the codegen'd window form at corpus scale.
    * Output: (pair, cnt), frequency-descending.
    */
  def topPairs(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc").orderBy("p")
    docs
      .select(col(idCol).as("doc"),
        posexplode(Fns.tokens(col(textCol))).as(Seq("p", "w")))
      .withColumn("w2", lead("w", 1).over(w))
      .filter(col("w2").isNotNull)
      .select(concat_ws(" ", col("w"), col("w2")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(k)
  }

  /** Greedy longest-match-first wordpiece encoding (Wu et al. 2016,
    * arXiv:1609.08144 §4.1 — the WordPiece inference algorithm; same
    * shape as HuggingFace's `WordPiece.tokenize`): each whitespace token
    * is segmented left-to-right, at every position taking the LONGEST
    * vocab entry that prefixes the remainder (continuation pieces carry
    * the `##` prefix); a position with no match emits `[UNK]` for the
    * whole token. The vocab set is broadcast (driver-bounded — a
    * tokenizer vocab is ≤ ~100k entries); the corpus pass is a typed
    * mapPartitions, the documented last-resort tier for genuinely
    * imperative per-row logic (SURVEY §7.3) — a greedy while-loop has no
    * declarative form. Output: (doc, token_idx, token, pieces).
    */
  def wordpieceEncode(docs: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String]): DataFrame = {
    import org.apache.spark.sql.Encoders
    val spark = docs.sparkSession
    val bv = spark.sparkContext.broadcast(vocab.toSet)
    val maxLen = if (vocab.isEmpty) 0 else vocab.map(_.stripPrefix("##").length).max
    implicit val enc = Encoders.product[(Long, Int, String, Seq[String])]
    docs.select(col(idCol).cast("long"), Fns.tokens(col(textCol)))
      .as[(Long, Seq[String])](Encoders.product[(Long, Seq[String])])
      .mapPartitions { rows =>
        val v = bv.value
        def encode(tok: String): Seq[String] = {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < tok.length) {
            val prefix = if (i == 0) "" else "##"
            var j = math.min(tok.length, i + maxLen)
            var found: String = null
            while (j > i && found == null) {
              val cand = prefix + tok.substring(i, j)
              if (v(cand)) found = cand else j -= 1
            }
            if (found == null) return Seq("[UNK]")
            out += found
            i = j
          }
          out.toSeq
        }
        rows.flatMap { case (doc, toks) =>
          toks.iterator.zipWithIndex.collect {
            case (t, idx) if t.nonEmpty => (doc, idx, t, encode(t))
          }
        }
      }
      .toDF("doc", "token_idx", "token", "pieces")
  }

  /** BPE merge TRAINING (Sennrich et al. 2016, arXiv:1508.07909 §3.2):
    * `nMerges` rounds of (count adjacent symbol pairs over the corpus,
    * weighted by word frequency; merge the most frequent pair everywhere;
    * recount). Starts from characters; returns the learned merge table
    * (merge_rank, lhs, rhs, merged, freq) — the artifact a BPE tokenizer
    * ships. Ties break (freq desc, lhs asc, rhs asc) — deterministic.
    * Stops early when no pair remains (every word fused to one symbol).
    *
    * Scale shape: the CORPUS is touched exactly once — one explode + one
    * map-side-combined count into the word-TYPE table (vocabulary-sized,
    * ≪ corpus). Every merge round then runs over word types only: pair
    * counts are one keyed aggregation, the argmax is a bounded
    * `TakeOrderedAndProject` + 1-row collect (the IVF-centroid
    * driver-bounded contract — nMerges rows total), and the merge
    * APPLICATION is a pure projection. Greedy left-to-right non-
    * overlapping merge semantics (Sennrich's `re.sub`) are encoded
    * declaratively: each word is a DOUBLE-SPACE-delimited symbol string
    * (`"  a  b  c  "`) and the merge is the literal replace
    * `" l  r " → " lr "` — consuming one delimiter space on each side so
    * adjacent matches can't share one ("a a a a" merges to "aa aa", as a
    * sequential fold would), while replace's continue-after-replacement
    * scan gives exactly the left-to-right greedy pass. Each round's word
    * table is cached and the predecessor unpersisted, so lineage stays
    * one round deep.
    */
  def bpeTrain(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    require(nMerges >= 1 && nMerges <= 10000, s"bad nMerges $nMerges")
    val spark = docs.sparkSession
    var words = docs.select(explode(Fns.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .select(concat(lit("  "), regexp_replace(col("token"), "(.)", "$1  ")).as("w"),
        col("cnt"))
      .cache()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var prev: Option[DataFrame] = None
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      val syms = split(trim(col("w")), "  ")
      // this argmax job is ALSO the materialization of `words`' cache —
      // one job per round, not a separate count(); the predecessor's
      // blocks are only dropped after it completes (words no longer
      // re-reads them once its own cache is populated)
      val top = words
        .select(syms.as("syms"), col("cnt"))
        .filter(size(col("syms")) >= 2)
        .select(explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (x, y) => struct(x.as("l"), y.as("r")))).as("pr"), col("cnt"))
        .select(col("pr.l"), col("pr.r"), col("cnt"))
        .groupBy("l", "r").agg(sum("cnt").as("freq"))
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1).collect()
      prev.foreach(_.unpersist(blocking = false))
      prev = Some(words)
      if (top.isEmpty) done = true
      else {
        val (l, rr, freq) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, l, rr, l + rr, freq))
        words = words.select(
          replace(col("w"), lit(" " + l + "  " + rr + " "), lit(" " + l + rr + " ")).as("w"),
          col("cnt")).cache()
      }
      r += 1
    }
    words.unpersist(blocking = false)
    prev.foreach(_.unpersist(blocking = false))
    import spark.implicits._
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "merged", "freq")
  }

  /** Merge-table size up to which [[bpeEncode]] compiles the whole merge
    * sequence into one composed expression chain (codegen-friendly; the
    * tree depth equals the merge count, so past this the analyzer and
    * codegen costs grow with the table, not the data). Beyond it the
    * ranked-loop tier runs — per-token cost independent of table size.
    */
  val MaxInlineMerges: Int = 64

  /** BPE ENCODING with a learned merge table — the inference half of
    * [[bpeTrain]]: every whitespace token is split to characters and the
    * merge list is applied in rank order (same greedy left-to-right
    * semantics as training, so train→encode round-trips exactly).
    *
    * Scale shape — TWO tiers, same semantics (equivalence property-
    * tested), both zero-shuffle/zero-join and stream-safe:
    *  - ≤ [[MaxInlineMerges]]: ONE pure projection — the merge sequence
    *    folds into a composed literal-replace expression chain over the
    *    exploded token stream, fully inside whole-stage codegen.
    *  - larger tables (a production tokenizer ships 30k-50k merges — a
    *    50k-deep expression tree would break codegen and make ANALYSIS
    *    cost scale with the table): broadcast (pair → rank) map + a
    *    per-token lowest-rank-first merge loop in typed mapPartitions
    *    (the standard BPE-apply algorithm; per-token cost depends on
    *    token length only). Applying merges as complete passes in rank
    *    order is equivalent: a pair of rank r is built only from
    *    products of ranks < r, so later merges can never create an
    *    earlier pair.
    * Output: (doc, token_idx, token, pieces).
    */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    if (merges.size <= MaxInlineMerges) {
      val toks = docs
        .select(col(idCol).as("doc"),
          posexplode(Fns.tokens(col(textCol))).as(Seq("token_idx", "token")))
        .filter(col("token") =!= "")
      val delim = concat(lit("  "), regexp_replace(col("token"), "(.)", "$1  "))
      val encoded = merges.foldLeft(delim) { case (e, (l, r)) =>
        replace(e, lit(" " + l + "  " + r + " "), lit(" " + l + r + " "))
      }
      toks.select(col("doc"), col("token_idx"), col("token"),
        split(trim(encoded), "  ").as("pieces"))
    } else bpeEncodeRanked(docs, idCol, textCol, merges)

  private def bpeEncodeRanked(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.Encoders
    val spark = docs.sparkSession
    val table = merges.toIndexedSeq
    val bRank = spark.sparkContext.broadcast(
      table.zipWithIndex.toMap: Map[(String, String), Int])
    val bTable = spark.sparkContext.broadcast(table)
    implicit val enc = Encoders.product[(Long, Int, String, Seq[String])]
    docs.select(col(idCol).cast("long"), Fns.tokens(col(textCol)))
      .as[(Long, Seq[String])](Encoders.product[(Long, Seq[String])])
      .mapPartitions { rows =>
        val rank = bRank.value
        val tbl = bTable.value
        def encode(tok: String): Seq[String] = {
          var syms: Array[String] = {
            // split to code points (what `.` matches in both regex engines)
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < tok.length) {
              val n = Character.charCount(tok.codePointAt(i))
              out += tok.substring(i, i + n)
              i += n
            }
            out.toArray
          }
          var continue = true
          while (continue && syms.length > 1) {
            var best = Int.MaxValue
            var i = 0
            while (i < syms.length - 1) {
              val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
              if (r < best) best = r
              i += 1
            }
            if (best == Int.MaxValue) continue = false
            else {
              val (l, r) = tbl(best)
              // complete greedy left-to-right pass for this rank
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              var j = 0
              while (j < syms.length) {
                if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
                  out += l + r; j += 2
                } else { out += syms(j); j += 1 }
              }
              syms = out.toArray
            }
          }
          scala.collection.immutable.ArraySeq.unsafeWrapArray(syms)
        }
        rows.flatMap { case (doc, toks) =>
          toks.iterator.zipWithIndex.collect {
            case (t, idx) if t.nonEmpty => (doc, idx, t, encode(t))
          }
        }
      }
      .toDF("doc", "token_idx", "token", "pieces")
  }

  /** Vocab size up to which [[piecesToIds]] inlines the piece→id mapping
    * as a literal map expression (a flat CreateMap — depth 1 — but its
    * child count, analysis cost, and codegen constant pool all scale
    * with the vocab). Past it, the broadcast-map tier runs.
    */
  val MaxInlineVocab: Int = 1024

  /** Map encoded pieces to integer vocabulary ids — the tensor-ready
    * output a training pipeline writes. `vocab` is the rank-ordered piece
    * list (id = position); pieces outside it map to `unkId`.
    *
    * Two tiers, identical semantics (like [[bpeEncode]]): vocabs ≤
    * [[MaxInlineVocab]] inline as a LITERAL map expression (pure
    * codegen'd projection); production vocabs (~50k pieces) broadcast a
    * HashMap into a typed mapPartitions — per-row cost independent of
    * vocab size. Both tiers: no join, no shuffle, stream-safe.
    * Input: [[bpeEncode]] output; output: (doc, token_idx, token, ids).
    */
  def piecesToIds(encoded: DataFrame, vocab: Seq[String],
      unkId: Int = -1): DataFrame = {
    require(vocab.nonEmpty, "empty vocabulary")
    // a duplicate entry would surface as Spark's opaque duplicate-map-key
    // runtime error deep in the projection — fail at the API instead
    require(vocab.distinct.size == vocab.size,
      "vocabulary contains duplicate pieces")
    if (vocab.size <= MaxInlineVocab) {
      val m = map(vocab.zipWithIndex.flatMap {
        case (p, i) => Seq(lit(p), lit(i))
      }: _*)
      encoded.select(col("doc"), col("token_idx"), col("token"),
        transform(col("pieces"),
          p => coalesce(element_at(m, p), lit(unkId))).as("ids"))
    } else {
      import org.apache.spark.sql.Encoders
      val spark = encoded.sparkSession
      val bm = spark.sparkContext.broadcast(vocab.zipWithIndex.toMap)
      implicit val enc = Encoders.product[(Long, Int, String, Seq[Int])]
      encoded.select(col("doc").cast("long"), col("token_idx").cast("int"),
          col("token"), col("pieces"))
        .as[(Long, Int, String, Seq[String])](
          Encoders.product[(Long, Int, String, Seq[String])])
        .mapPartitions { rows =>
          val m = bm.value
          rows.map { case (doc, idx, tok, pieces) =>
            (doc, idx, tok, pieces.map(m.getOrElse(_, unkId)))
          }
        }
        .toDF("doc", "token_idx", "token", "ids")
    }
  }

  /** Vocabulary coverage / OOV rate for a candidate top-`k` vocabulary —
    * the metric that sizes a tokenizer vocab: what fraction of corpus
    * token OCCURRENCES (not types) the vocab covers, overall token mass,
    * and the OOV residual. The vocab is [[topTokens]]'s own output
    * (driver-bounded by k, broadcast into the probe join); the corpus
    * pass is one explode + broadcast-semi probe + one aggregation.
    * Output: 1 row (vocab_size, total_tokens, covered_tokens, oov_rate).
    */
  def vocabCoverage(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val vocab = topTokens(docs, textCol, k).select(col("token"), lit(1L).as("in_v"))
    docs.select(explode(Fns.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .join(broadcast(vocab), Seq("token"), "left")
      .agg(count(lit(1)).as("total_tokens"),
        sum(coalesce(col("in_v"), lit(0L))).as("covered_tokens"))
      .select(lit(k).as("vocab_size"), col("total_tokens"), col("covered_tokens"),
        round(lit(1.0) - col("covered_tokens") / col("total_tokens").cast("double"), 4)
          .as("oov_rate"))
  }
}
