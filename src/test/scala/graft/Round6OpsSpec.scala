package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Round-6 operators: BPE merge training, string-keyed identity
  * resolution, corrupt-media quarantine (quarantine tests live in
  * Round5OpsSpec next to the codec tests).
  */
class Round6OpsSpec extends SparkSpec {

  // ---- BPE merge training ------------------------------------------------

  test("bpeTrain learns the classic merge sequence with overlap semantics") {
    import spark.implicits._
    // "aaa"×2: pairs (a,a) counted WITH overlap (freq 4); greedy
    // left-to-right application merges "a a a" → "aa a", never "a aa"
    val docs = Seq("aaa aaa", "ab").toDF("text")
    val got = Vocab.bpeTrain(docs, "text", 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1, "a", "a", "aa", 4L),   // 2 per "aaa" occurrence × 2 occurrences
      (2, "aa", "a", "aaa", 2L), // greedy left-to-right: [aa, a], not [a, aa]
      (3, "a", "b", "ab", 1L)))
  }

  test("bpeTrain stops early when every word is a single symbol") {
    import spark.implicits._
    val docs = Seq("aa aa aa").toDF("text")
    val got = Vocab.bpeTrain(docs, "text", 5).collect()
    assert(got.length == 1) // after merging (a,a) no pair remains
    assert(got(0).getString(3) == "aa" && got(0).getLong(4) == 3L)
  }

  test("bpeTrain frequency ties break lexicographically") {
    import spark.implicits._
    // (b,c) and (x,y) both freq 2 in round 1 → (b,c) wins (lhs asc)
    val docs = Seq("bc bc xy xy").toDF("text")
    val got = Vocab.bpeTrain(docs, "text", 1).collect()
    assert(got(0).getString(1) == "b" && got(0).getString(2) == "c")
  }

  test("bpeEncode round-trips bpeTrain's merges and reconstructs tokens") {
    import spark.implicits._
    val docs = Seq((1L, "aaa aaa ab"), (2L, "ba aaa")).toDF("doc_id", "text")
    val merges = Vocab.bpeTrain(docs, "text", 3)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = Vocab.bpeEncode(docs, "doc_id", "text", merges)
    // after (a,a)→aa, (aa,a)→aaa, (a,b)→ab: "aaa" and "ab" are single
    // pieces; "ba" never merged and stays charwise
    val got = enc.orderBy("doc", "token_idx").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getSeq[String](3).toList)).toList
    assert(got == List(
      (1L, "aaa", List("aaa")), (1L, "aaa", List("aaa")), (1L, "ab", List("ab")),
      (2L, "ba", List("b", "a")), (2L, "aaa", List("aaa"))))
    // pieces always concatenate back to the token (lossless segmentation)
    assert(enc.filter(concat_ws("", col("pieces")) =!= col("token")).count() == 0)
  }

  // ---- exact-k per-stratum sampling --------------------------------------

  test("exactKPerStratum: exact sizes, monotone in k, small strata whole") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i.toLong, if (i < 480) "big" else "small"))
      .toDF("id", "cls")
    val k20 = Sampling.exactKPerStratum(df, "id", "cls", 20)
    val sizes = k20.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("big" -> 20L, "small" -> 20L))
    // a stratum smaller than k comes back whole
    val k50 = Sampling.exactKPerStratum(df, "id", "cls", 50)
    val sizes50 = k50.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes50 == Map("big" -> 50L, "small" -> 20L))
    // monotone: the k=20 selection is a subset of the k=50 selection
    val ids20 = k20.select("id").collect().map(_.getLong(0)).toSet
    val ids50 = k50.select("id").collect().map(_.getLong(0)).toSet
    assert(ids20.subsetOf(ids50))
    // deterministic: re-run selects the identical set
    val again = Sampling.exactKPerStratum(df, "id", "cls", 20)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == ids20)
  }

  test("exactKPerStratum shortfall fallback still yields exact k") {
    import spark.implicits._
    // k=1 gives the prefilter its weakest margin (rate 4/n, expected 4
    // survivors) — exercise it across many tiny-expectation strata; the
    // count-verify + re-rank fallback guarantees exactness regardless
    val df = (0 until 2000).map(i => (i.toLong, s"c${i % 5}")).toDF("id", "cls")
    val got = Sampling.exactKPerStratum(df, "id", "cls", 1)
      .groupBy("cls").count().collect().map(r => r.getLong(1))
    assert(got.length == 5 && got.forall(_ == 1L))
  }

  // ---- string-keyed identity resolution ----------------------------------

  test("connectedComponentsString resolves string ids to min-string canon") {
    import spark.implicits._
    // two components: {u1,d9,u2} (via shared device) and {u3,d2}
    val edges = Seq(("u1", "d9"), ("u2", "d9"), ("u3", "d2"))
      .toDF("src", "dst")
    val got = IdentityResolution.connectedComponentsString(edges)
      .orderBy("node").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(
      ("d2", "d2"), ("d9", "d9"), ("u1", "d9"), ("u2", "d9"), ("u3", "d2")))
  }

  test("connectedComponentsString canon is the LEXICOGRAPHIC min, chains resolve") {
    import spark.implicits._
    // chain a-b-c-d collapses to one component canonized at "a10";
    // note "a10" < "a9" lexicographically — string order, not numeric
    val edges = Seq(("a9", "b"), ("b", "c"), ("c", "a10")).toDF("src", "dst")
    val got = IdentityResolution.connectedComponentsString(edges)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got.values.toSet == Set("a10"))
    assert(got.keySet == Set("a9", "a10", "b", "c"))
  }

  // ---- BPE property test vs an independent in-memory reference -----------

  /** Straight-line Sennrich 2016: pair counts with overlap, argmax by
    * (freq desc, lhs asc, rhs asc), greedy left-to-right non-overlapping
    * application — written independently of the operator (sequential
    * fold, no delimited-replace trick) so the two implementations can
    * only agree if the SEMANTICS agree.
    */
  private def refBpe(words: Seq[String], nMerges: Int): Seq[(String, String, String, Long)] = {
    var tbl = words.filter(_.nonEmpty).groupBy(identity).toVector
      .map { case (w, ws) => (w.map(_.toString).toVector, ws.size.toLong) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, Long)]
    var done = false
    for (_ <- 1 to nMerges if !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- tbl; i <- 0 until syms.length - 1)
        counts(syms(i) -> syms(i + 1)) = counts.getOrElse(syms(i) -> syms(i + 1), 0L) + c
      if (counts.isEmpty) done = true
      else {
        val ((l, r), f) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((l, r, l + r, f))
        tbl = tbl.map { case (syms, c) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              acc += l + r; i += 2
            } else { acc += syms(i); i += 1 }
          }
          (acc.toVector, c)
        }
      }
    }
    out.toSeq
  }

  test("bpeTrain matches the independent reference on 30 random corpora") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    for (trial <- 0 until 30) {
      val words = Seq.fill(3 + rng.nextInt(25))(
        (0 until 1 + rng.nextInt(6)).map(_ => ('a' + rng.nextInt(2)).toChar).mkString)
      val n = 1 + rng.nextInt(4)
      val expected = refBpe(words, n)
      val docs = words.mkString(" ") :: Nil map Tuple1.apply toDF "text"
      def collected(df: org.apache.spark.sql.DataFrame) = df
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
      val got = collected(Vocab.bpeTrain(docs, "text", n))
      assert(got == expected, s"trial $trial corpus=${words.mkString(" ")} n=$n")
      // the INCREMENTAL tier on the same corpus and merge count — the
      // tier-equivalence claim in its scaladoc — plus n=40, which on these
      // small corpora runs many rounds and usually exhausts every pair
      // (exercising the delta maintenance AND the early-stop path)
      val gotInc = collected(Vocab.bpeTrainIncremental(docs, "text", n))
      assert(gotInc == expected,
        s"incremental trial $trial corpus=${words.mkString(" ")} n=$n")
      val gotInc40 = collected(Vocab.bpeTrainIncremental(docs, "text", 40))
      assert(gotInc40 == refBpe(words, 40),
        s"incremental trial $trial corpus=${words.mkString(" ")} n=40")
    }
  }

  test("bpeTrain dispatches to the incremental tier past 64 merges, same result") {
    import spark.implicits._
    // enough distinct structure to sustain >64 merges: 40 words over a
    // 4-letter alphabet, lengths up to 12
    val rng = new scala.util.Random(21)
    val words = Seq.fill(40)(
      (0 until 4 + rng.nextInt(9)).map(_ => ('a' + rng.nextInt(4)).toChar).mkString)
    val docs = words.mkString(" ") :: Nil map Tuple1.apply toDF "text"
    val got = Vocab.bpeTrain(docs, "text", 80) // > MaxJobPerMergeRounds
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
    assert(got == refBpe(words, 80))
    assert(got.size > Vocab.MaxJobPerMergeRounds,
      "corpus must actually sustain >64 merges for the dispatch to matter")
  }

  test("bpeTrainIncremental rejects merge counts past the hard ceiling") {
    import spark.implicits._
    val docs = Seq("ab").toDF("text")
    intercept[IllegalArgumentException] {
      Vocab.bpeTrainIncremental(docs, "text", Vocab.MaxIncrementalMerges + 1)
    }
  }

  test("piecesToIds maps via the literal vocab, unknown pieces to unkId") {
    import spark.implicits._
    val docs = Seq((1L, "ab zq")).toDF("doc_id", "text")
    val enc = Vocab.bpeEncode(docs, "doc_id", "text", Seq(("a", "b")))
    val ids = Vocab.piecesToIds(enc, Seq("ab", "z", "q"), unkId = -1)
      .orderBy("token_idx").collect()
      .map(r => (r.getString(2), r.getSeq[Int](3).toList)).toList
    assert(ids == List(("ab", List(0)), ("zq", List(1, 2))))
    // a piece outside the vocab maps to unkId, not an error
    val ids2 = Vocab.piecesToIds(enc, Seq("ab"), unkId = -1)
      .orderBy("token_idx").collect().map(_.getSeq[Int](3).toList).toList
    assert(ids2 == List(List(0), List(-1, -1)))
  }

  test("bpeEncode tiers agree: inline replace chain == ranked merge loop") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    for (trial <- 0 until 15) {
      val corpus = Seq.fill(5 + rng.nextInt(20))(
        (0 until 1 + rng.nextInt(7)).map(_ => ('a' + rng.nextInt(3)).toChar).mkString)
        .mkString(" ")
      val docs = Seq((1L, corpus)).toDF("doc_id", "text")
      val merges = Vocab.bpeTrain(docs, "text", 1 + rng.nextInt(6))
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      def run(df: org.apache.spark.sql.DataFrame) = df
        .orderBy("token_idx").collect()
        .map(r => (r.getInt(1), r.getString(2), r.getSeq[String](3).toList)).toList
      // force BOTH tiers on the same merges: inline via the public entry
      // (small table), ranked by padding the table past the threshold with
      // never-matching pairs (rank order preserved; inert pairs are no-ops)
      val inline = run(Vocab.bpeEncode(docs, "doc_id", "text", merges))
      val padded = merges ++ (0 until Vocab.MaxInlineMerges + 1).map(i => (s"#$i", "#"))
      val ranked = run(Vocab.bpeEncode(docs, "doc_id", "text", padded))
      assert(ranked == inline, s"trial $trial corpus=$corpus merges=$merges")
    }
  }

  test("bpeEncode ranked tier preserves STRING doc ids (no cast-to-null)") {
    import spark.implicits._
    // crawled-corpus ids are often URLs/hashes; crossing the tier
    // threshold must not change the id column's type or values
    val docs = Seq(("https://x.example/a", "abab ab"), ("sha:9f", "ba"))
      .toDF("doc_id", "text")
    val merges = Seq(("a", "b"))
    val padded = merges ++ (0 until Vocab.MaxInlineMerges + 1).map(i => (s"#$i", "#"))
    def run(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("doc", "token_idx").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getSeq[String](3).toList)).toList
    val inline = run(Vocab.bpeEncode(docs, "doc_id", "text", merges))
    val ranked = run(Vocab.bpeEncode(docs, "doc_id", "text", padded))
    assert(ranked == inline)
    assert(inline.map(_._1).distinct.sorted ==
      List("https://x.example/a", "sha:9f"))
  }

  test("piecesToIds tiers agree, incl. string doc ids past MaxInlineVocab") {
    import spark.implicits._
    val docs = Seq(("u:1", "abab ab q"), ("u:2", "ba ab")).toDF("doc_id", "text")
    val enc = Vocab.bpeEncode(docs, "doc_id", "text", Seq(("a", "b"), ("ab", "ab")))
    val vocab = Seq("abab", "ab", "b", "a")
    // pad past the inline threshold with never-occurring pieces — rank
    // order of the real entries is preserved, so ids must be identical
    val padded = vocab ++ (0 until Vocab.MaxInlineVocab + 1).map(i => s"#pad$i")
    def run(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("doc", "token_idx").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getSeq[Int](3).toList)).toList
    val inline = run(Vocab.piecesToIds(enc, vocab))
    val broad = run(Vocab.piecesToIds(enc, padded))
    assert(broad == inline)
    assert(inline.exists(_._4.contains(-1))) // "q" is OOV in both tiers
  }

  test("connectedComponentsString matches naive union-find on 10 random graphs") {
    import spark.implicits._
    val rng = new scala.util.Random(21)
    for (trial <- 0 until 10) {
      val ids = (0 until 4 + rng.nextInt(20)).map(i => s"n${rng.nextInt(30)}").distinct
      val edges = Seq.fill(2 + rng.nextInt(25))(
        (ids(rng.nextInt(ids.size)), ids(rng.nextInt(ids.size))))
      // naive reference: union-find over strings, canon = lexicographic min
      val parent = scala.collection.mutable.HashMap.empty[String, String]
      def find(x: String): String = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        r
      }
      edges.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
      val expected = parent.keys.map(n => n -> find(n)).toMap
      val got = IdentityResolution.connectedComponentsString(edges.toDF("src", "dst"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == expected, s"trial $trial edges=$edges")
    }
  }

  test("substringDedup matches a naive reference on 12 random corpora") {
    import spark.implicits._
    val rng = new scala.util.Random(33)
    val words = Array("x", "y", "z")
    for (trial <- 0 until 12) {
      val docs = (0 until 4 + rng.nextInt(5)).map(i =>
        (i.toLong, Seq.fill(3 + rng.nextInt(6))(words(rng.nextInt(3))).mkString(" ")))
      val w = 3
      val crossOnly = rng.nextBoolean()
      val minDocs = 2 + rng.nextInt(2)
      // naive reference, written from the Lee et al. semantics directly
      val toks = docs.map { case (id, t) =>
        id -> t.trim.toLowerCase.split("\\s+", -1).toSeq }.toMap
      val occs = toks.toSeq.flatMap { case (id, ts) =>
        (0 to ts.length - w).map(p => (ts.slice(p, p + w).mkString(" "), id, p)) }
      val losers = occs.groupBy(_._1).values.flatMap { os =>
        val metric = if (crossOnly) os.map(_._2).distinct.size else os.size
        if (metric >= minDocs) {
          val sorted = os.map(o => (o._2, o._3)).sorted
          sorted.tail // all but the globally-first occurrence
        } else Nil
      }
      val covered = losers.toSeq.flatMap { case (id, p) =>
        (p until p + w).map(id -> _) }.toSet
      val expected = toks.map { case (id, ts) =>
        val kept = ts.zipWithIndex.filterNot { case (_, p) => covered(id -> p) }
        (id, ts.length.toLong, kept.length.toLong, kept.map(_._1).mkString(" "))
      }.toSet
      val got = Dedup.substringDedup(docs.toDF("doc_id", "text"), "doc_id", "text",
          w, minDocs, crossDocOnly = crossOnly)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      assert(got == expected,
        s"trial $trial crossOnly=$crossOnly minDocs=$minDocs docs=$docs")
    }
  }
}
