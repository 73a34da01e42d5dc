package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Fns

/** Skip-gram training prep (word2vec; Mikolov et al. 2013,
  * arXiv:1310.4546 §2.3 subsampling, §2.2 negative sampling) — the
  * classical-embedding sibling of the tokenizer arc: windowed
  * (center, context) pair generation with deletion-subsampling, and the
  * unigram^(3/4) negative-sampling table.
  *
  * Scale shape: the corpus is touched once into the positioned token
  * stream; subsampling is a broadcast join against the vocabulary-sized
  * count table plus one scalar total; pair generation is ONE
  * doc-partitioned window (lag/lead at fixed offsets — no self-join, no
  * per-pair shuffle) followed by one map-side-combined count; the
  * negative table is one histogram plus one broadcast scalar. Every
  * stage is deterministic (RNG-free) and engine-portable.
  */
object SkipGram {

  /** Hash-uniform denominator for the subsampling decision. Prime, so
    * `rolling_hash % SubsampleMod` is near-uniform over [0, mod).
    */
  val SubsampleMod: Long = 1000003L

  /** Positioned, subsampled token stream: (doc, pos, token) for the
    * occurrences that SURVIVE word2vec deletion-subsampling with
    * threshold `t` — keep probability `min(1, sqrt(t·T/c) + t·T/c)`
    * for a word with count `c` in a corpus of `T` token occurrences
    * (the published formula, with the uniform draw replaced by the
    * deterministic portable hash of `doc:pos`, making runs reproducible
    * and the rule oracle-expressible: keep iff
    * `hash % SubsampleMod < p · SubsampleMod`).
    */
  def subsampledTokens(docs: DataFrame, idCol: String, textCol: String,
      t: Double = 1e-3): DataFrame = {
    val toks = docs.select(col(idCol).as("doc"),
        posexplode(Fns.tokens(col(textCol))).as(Seq("pos", "token")))
      .filter(col("token") =!= "")
    val cnts = toks.groupBy("token").agg(count(lit(1)).as("c"))
    val tot = toks.agg(count(lit(1)).as("T"))
    // x and the comparison are built by the SAME operation sequence the
    // DuckDB oracle uses (t·T first, then /c), so the IEEE doubles match
    // bit for bit; sqrt is exactly rounded by definition.
    val x = lit(t) * col("T") / col("c")
    val p = least(lit(1.0), sqrt(x) + x)
    toks.join(broadcast(cnts), "token")
      .crossJoin(broadcast(tot))
      .filter(pmod(Fns.rollingHash(concat_ws(":", col("doc"), col("pos"))),
        lit(SubsampleMod)) < p * SubsampleMod)
      .select("doc", "pos", "token")
  }

  /** Skip-gram (center, context) pair counts over the subsampled stream:
    * contexts are the surviving tokens within `window` positions on
    * either side IN THE COMPACTED ORDER (word2vec semantics — deletion
    * widens effective windows across removed frequent words). One
    * doc-partitioned window provides all 2·window contexts via
    * lag/lead at fixed offsets; pairs then reduce by key.
    * Output: (center, context, cnt).
    */
  def skipgramPairs(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 2, t: Double = 1e-3): DataFrame = {
    require(window >= 1 && window <= 16, s"bad window $window")
    val kept = subsampledTokens(docs, idCol, textCol, t)
    val w = Window.partitionBy("doc").orderBy("pos")
    val ctx = array((1 to window).flatMap(k =>
      Seq(lag(col("token"), k).over(w), lead(col("token"), k).over(w))): _*)
    kept.select(col("token").as("center"), ctx.as("__ctx"))
      .select(col("center"), explode(col("__ctx")).as("context"))
      .filter(col("context").isNotNull)
      .groupBy("center", "context").agg(count(lit(1)).as("cnt"))
  }

  /** GloVe-style distance-weighted co-occurrence counts (Pennington et
    * al. 2014 §3: context word at distance d contributes 1/d): the FULL
    * token stream (GloVe does not subsample), ONE doc-partitioned
    * lag/lead window, weights kept integer as ppm (`1e6 div d` summed —
    * exact, order-independent, engine-portable). Output:
    * (center, context, cnt, weight_ppm).
    */
  def gloveCooccurrence(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 3): DataFrame = {
    require(window >= 1 && window <= 16, s"bad window $window")
    val toks = docs.select(col(idCol).as("doc"),
        posexplode(Fns.tokens(col(textCol))).as(Seq("pos", "token")))
      .filter(col("token") =!= "")
    val w = Window.partitionBy("doc").orderBy("pos")
    val ctx = array((1 to window).flatMap { k =>
      val wppm = lit(1000000L / k)
      Seq(struct(lag(col("token"), k).over(w).as("c"), wppm.as("wppm")),
        struct(lead(col("token"), k).over(w).as("c"), wppm.as("wppm")))
    }: _*)
    toks.select(col("token").as("center"), ctx.as("__ctx"))
      .select(col("center"), explode(col("__ctx")).as("x"))
      .filter(col("x.c").isNotNull)
      .groupBy(col("center"), col("x.c").as("context"))
      .agg(count(lit(1)).as("cnt"), sum(col("x.wppm")).as("weight_ppm"))
  }

  /** FastText-style subword n-grams (Bojanowski et al. 2017 §3.2): each
    * DISTINCT corpus token, boundary-marked as `<token>`, decomposed into
    * its char n-grams for n ∈ [minN, maxN], each hashed into one of
    * `buckets` subword-embedding slots — how an embedding table serves
    * OOV words. Vocabulary-grain work (distinct tokens, not occurrences):
    * one distinct + one HOF projection + one explode; no corpus re-scan.
    * Grams repeat inside a token ("aaaa" → "aaa" ×2) and are COUNTED,
    * matching fastText's multiset semantics.
    * Output: (token, ng, bucket, cnt).
    */
  def subwordNgrams(docs: DataFrame, textCol: String,
      minN: Int = 3, maxN: Int = 6, buckets: Int = 2000): DataFrame = {
    require(1 <= minN && minN <= maxN && maxN <= 16, s"bad n range $minN..$maxN")
    require(buckets > 0, "buckets must be positive")
    val toks = docs.select(explode(Fns.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "").distinct()
    val marked = concat(lit("<"), col("token"), lit(">"))
    val grams = flatten(array((minN to maxN).map { n =>
      // sequence(a, b) DESCENDS when a > b — guard short tokens explicitly
      when(length(marked) >= n,
        transform(sequence(lit(1), length(marked) - n + 1),
          i => marked.substr(i, lit(n))))
        .otherwise(array().cast("array<string>"))
    }: _*))
    toks.select(col("token"), explode(grams).as("ng"))
      .groupBy(col("token"), col("ng"),
        pmod(Fns.rollingHash(col("ng")), lit(buckets.toLong)).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Loud ceiling for the driver-side Huffman build — the vocabulary-
    * bounded collect contract (IVF-centroid / BPE-word-type class).
    */
  val MaxHuffmanVocab: Int = 1000000

  /** Deterministic negative DRAWS — the full word2vec minibatch shape:
    * for every (center, context) pair type from [[skipgramPairs]],
    * `numNeg` negatives selected by hashing `center|context|j` into the
    * [[negativeTable]]'s cumulative slot ranges. The slot table is
    * vocabulary-bounded, so the lookup is a BROADCAST binary search per
    * row (never a row-count-scaled join); both the draw hash (the
    * engine's portable rolling hash — ASCII-token contract) and the
    * slot layout (tokens in code-point order, exact integer cumsums)
    * are oracle-replayable. Output: (center, context, j, neg_token).
    */
  def negativeDraws(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 2, numNeg: Int = 2, minCount: Long = 5L): DataFrame = {
    require(numNeg >= 1 && numNeg <= 64, s"bad numNeg $numNeg")
    val spark = docs.sparkSession
    val pairs = skipgramPairs(docs, idCol, textCol, window)
      .select("center", "context")
    val tbl = negativeTable(docs, textCol, minCount)
      .select("token", "neg_slots")
      .limit(MaxHuffmanVocab + 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(tbl.length <= MaxHuffmanVocab,
      s"negativeDraws: vocab exceeds $MaxHuffmanVocab — raise minCount")
    require(tbl.nonEmpty, "negativeDraws: empty vocabulary")
    def cpLt(a: String, b: String): Boolean = {
      var i = 0; var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i); val cb = b.codePointAt(j)
        if (ca != cb) return ca < cb
        i += Character.charCount(ca); j += Character.charCount(cb)
      }
      (a.length - i) < (b.length - j)
    }
    val sorted = tbl.sortWith { case ((t1, _), (t2, _)) => cpLt(t1, t2) }
    val toks = sorted.map(_._1)
    val his = sorted.scanLeft(0L) { case (acc, (_, s)) => acc + s }.drop(1)
    val total = his.last
    require(total > 0, "negativeDraws: zero total slots")
    val bToks = spark.sparkContext.broadcast(toks)
    val bHis = spark.sparkContext.broadcast(his)
    import org.apache.spark.sql.types._
    implicit val enc = Encoders.row(StructType(Seq(
      StructField("center", StringType, nullable = true),
      StructField("context", StringType, nullable = true),
      StructField("j", IntegerType, nullable = false),
      StructField("neg_token", StringType, nullable = true))))
    val nNeg = numNeg
    val tot = total
    pairs.mapPartitions { rows =>
      val ts = bToks.value
      val hs = bHis.value
      rows.flatMap { r =>
        val c = r.getString(0); val x = r.getString(1)
        (0 until nNeg).iterator.map { j =>
          val d = graft.functions.RollingHash.hash(
            org.apache.spark.unsafe.types.UTF8String.fromString(
              s"$c|$x|$j")) % tot
          // first index with his > d (zero-slot tokens are never hit)
          var lo = 0; var hi = hs.length - 1
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (hs(mid) > d) hi = mid else lo = mid + 1
          }
          Row(c, x, j, ts(lo))
        }
      }
    }
  }

  /** Hierarchical-softmax Huffman code table (Mikolov et al. 2013 §2.1
    * — the training-time alternative to negative sampling): each vocab
    * word's root-to-leaf branch bitstring, code length = its softmax
    * path depth. Fully deterministic and engine-replayable: leaves are
    * numbered 0..V-1 by (count asc, token asc by CODE POINT — both
    * engines' binary string order); the queue merges the two smallest
    * by (weight asc, id asc), the smaller taking bit '0'; merged node
    * iter i gets id V+i. The build is driver-side over the
    * vocabulary-sized histogram (bounded-or-loud, [[MaxHuffmanVocab]]);
    * the corpus is touched exactly once for the counts.
    * Output: (token, cnt, code, depth).
    */
  def huffmanCodes(docs: DataFrame, textCol: String,
      minCount: Long = 5L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cnts = docs.select(explode(Fns.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .limit(MaxHuffmanVocab + 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(cnts.length <= MaxHuffmanVocab,
      s"huffmanCodes: vocab exceeds $MaxHuffmanVocab — raise minCount")
    require(cnts.length >= 2, "huffmanCodes: need at least 2 vocab words")
    def cpLt(a: String, b: String): Boolean = {
      var i = 0; var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i); val cb = b.codePointAt(j)
        if (ca != cb) return ca < cb
        i += Character.charCount(ca); j += Character.charCount(cb)
      }
      (a.length - i) < (b.length - j)
    }
    val leaves = cnts.sortWith { case ((t1, c1), (t2, c2)) =>
      if (c1 != c2) c1 < c2 else cpLt(t1, t2)
    }
    val v = leaves.length
    // queue of (weight, id); parent(child) = (parentId, bit)
    val queue = scala.collection.mutable.TreeSet.empty[(Long, Int)]
    leaves.zipWithIndex.foreach { case ((_, c), i) => queue += ((c, i)) }
    val parent = new Array[(Int, Char)](v + v) // ids < 2V-1
    var iter = 0
    while (queue.size > 1) {
      val a = queue.head; queue -= a
      val b = queue.head; queue -= b
      val nid = v + iter
      parent(a._2) = (nid, '0')
      parent(b._2) = (nid, '1')
      queue += ((a._1 + b._1, nid))
      iter += 1
    }
    val root = v + iter - 1
    val rows = leaves.zipWithIndex.map { case ((t, c), i) =>
      val sb = new StringBuilder
      var node = i
      while (node != root) {
        val (p, bit) = parent(node)
        sb.insert(0, bit)
        node = p
      }
      (t, c, sb.toString, sb.length)
    }
    spark.sparkContext.parallelize(rows.toSeq)
      .toDF("token", "cnt", "code", "depth")
  }

  /** Unigram^(3/4) negative-sampling table over the FULL corpus vocab
    * (min_count-filtered, word2vec's default 5): each word's slot share
    * of a 1e6-slot table, `slots = w_int·1e6 div W` with
    * `w_int = floor(sqrt(sqrt(c³))·1000)` — the ¾ power computed as two
    * exactly-rounded sqrts (libm `pow` is NOT bit-portable across
    * engines; `sqrt` is), then floored to an integer so the
    * normalizing sum W is EXACT integer addition — order-independent,
    * hence partitioning-invariant. Output: (token, cnt, neg_slots).
    */
  def negativeTable(docs: DataFrame, textCol: String,
      minCount: Long = 5L): DataFrame = {
    val cnts = docs
      .select(explode(Fns.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    val wInt: Column =
      floor(sqrt(sqrt(col("cnt").cast("double") * col("cnt") * col("cnt")))
        * 1000).cast("long")
    val weighted = cnts.withColumn("__w", wInt)
    val total = weighted.agg(sum("__w").as("W"))
    weighted.crossJoin(broadcast(total))
      .select(col("token"), col("cnt"),
        expr("(__w * 1000000) div W").as("neg_slots"))
  }
}
