package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Round-8 operators: WAV/RIFF + MP4 (ISO-BMFF) header decode and the
  * audio/video quarantine channel.
  */
class Round8OpsSpec extends SparkSpec {

  import Multimodal.{WavSpec, Mp4Spec}

  private def decodeOne(payload: Array[Byte]): Multimodal.AvMeta = {
    import spark.implicits._
    val df = Seq((1L, payload)).toDF("doc_id", "payload")
    Multimodal.decodeAvMeta(spark, df).collect().head
  }

  test("WAV header decode agrees with the JDK's own AudioSystem parser") {
    import spark.implicits._
    // cross-check against an INDEPENDENT public parser: javax.sound reads
    // the same RIFF bytes, so rate/channels/bits must agree exactly
    val specs = Seq(
      WavSpec(1, 8000, 1, 8, 100), WavSpec(2, 16000, 2, 16, 777),
      WavSpec(3, 44100, 2, 16, 4410), WavSpec(4, 22050, 1, 16, 221))
    val rows = Multimodal.synthesizeWav(spark, specs.toDS()).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).sortBy(_._1)
    for (((id, bytes), spec) <- rows.zip(specs)) {
      val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      assert(fmt.getFormat.getSampleRate.toInt == spec.sample_rate, s"doc $id")
      assert(fmt.getFormat.getChannels == spec.channels, s"doc $id")
      assert(fmt.getFormat.getSampleSizeInBits == spec.bits, s"doc $id")
      assert(fmt.getFrameLength == spec.n_samples, s"doc $id")
      val got = decodeOne(bytes)
      assert(got.format == "wav" && got.status == "ok")
      assert(got.sample_rate == spec.sample_rate)
      assert(got.channels == spec.channels)
      assert(got.bits_per_sample == spec.bits)
      assert(got.duration_ms == spec.n_samples * 1000L / spec.sample_rate)
    }
  }

  test("WAV quarantine: truncation and zero byte-rate get stable reasons") {
    import spark.implicits._
    val full = Multimodal.synthesizeWav(spark, Seq(WavSpec(1, 16000, 1, 16, 50)).toDS())
      .collect().head.getAs[Array[Byte]](1)
    val truncated = decodeOne(full.take(20))
    assert(truncated.status == "corrupt" && truncated.err.contains("truncated"))
    assert(truncated.format == "wav" && truncated.duration_ms == 0)
    // data chunk content cut short (declared size survives, bytes do not)
    val shortData = decodeOne(full.take(full.length - 10))
    assert(shortData.status == "corrupt" && shortData.err.contains("truncated"))
    // byte rate patched to zero: header walk succeeds, division must not
    val zeroRate = full.clone()
    for (i <- 28 until 32) zeroRate(i) = 0 // fmt byteRate field
    val bad = decodeOne(zeroRate)
    assert(bad.status == "corrupt" && bad.err.contains("bad_byte_rate"))
  }

  test("MP4 header decode recovers mvhd duration and tkhd 16.16 geometry") {
    import spark.implicits._
    val specs = Seq(Mp4Spec(1, 600, 3600, 640, 480), Mp4Spec(2, 90000, 450000, 1920, 1080))
    val rows = Multimodal.synthesizeMp4(spark, specs.toDS()).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).sortBy(_._1)
    for (((_, bytes), spec) <- rows.zip(specs)) {
      assert(bytes.length == 232)
      val got = decodeOne(bytes)
      assert(got.format == "mp4" && got.status == "ok")
      assert(got.width == spec.w && got.height == spec.h)
      assert(got.duration_ms == spec.duration_units * 1000L / spec.timescale)
    }
    val cut = decodeOne(rows.head._2.take(40))
    assert(cut.status == "corrupt" && cut.err.contains("truncated"))
  }

  test("MP4 version-1 mvhd/tkhd (64-bit times) parse at their shifted offsets") {
    // hand-built v1 boxes: the synthesis writer only emits v0, so this is
    // the only coverage of the version-1 field layout
    def box(tpe: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length).put(tpe.getBytes("ISO-8859-1")).put(body)
      bb.array()
    }
    val mvhdBody = {
      val bb = java.nio.ByteBuffer.allocate(112)
      bb.putInt(0x01000000) // version 1
      bb.putLong(0L).putLong(0L) // creation, modification (64-bit)
      bb.putInt(1000) // timescale
      bb.putLong(2500L) // duration (64-bit)
      bb.putInt(0x00010000).putShort(0x0100.toShort).put(new Array[Byte](10))
      bb.put(new Array[Byte](36)).put(new Array[Byte](24)).putInt(2)
      bb.array()
    }
    val tkhdBody = {
      val bb = java.nio.ByteBuffer.allocate(96)
      bb.putInt(0x01000000) // version 1
      bb.putLong(0L).putLong(0L) // creation, modification
      bb.putInt(1).putInt(0) // track id, reserved
      bb.putLong(2500L) // duration (64-bit)
      bb.put(new Array[Byte](8)).putShort(0).putShort(0).putShort(0).putShort(0)
      bb.put(new Array[Byte](36))
      bb.putInt(320 << 16).putInt(240 << 16)
      bb.array()
    }
    val ftyp = {
      val bb = java.nio.ByteBuffer.allocate(16)
      bb.putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
      bb.array()
    }
    val moov = box("moov", box("mvhd", mvhdBody) ++ box("trak", box("tkhd", tkhdBody)))
    val got = decodeOne(ftyp ++ moov)
    assert(got.status == "ok" && got.format == "mp4")
    assert(got.duration_ms == 2500L * 1000 / 1000)
    assert(got.width == 320 && got.height == 240)
  }

  test("payloads neither container claims fall through to a loud stub row") {
    val got = decodeOne("plain text, no container".getBytes)
    assert(got.format == "unknown" && got.status == "stub" && got.err.isEmpty)
  }

  // ---- WordPiece vocab training ----------------------------------------

  /** Independent sequential WordPiece trainer (Schuster & Nakajima 2012
    * likelihood criterion): written map-over-vector style, no delimited-
    * replace trick, so agreement with the operator proves the SEMANTICS.
    */
  private def refWordpiece(words: Seq[String], nMerges: Int): Seq[(String, String, String, Long)] = {
    var tbl = words.filter(_.nonEmpty).groupBy(identity).toVector
      .map { case (w, ws) =>
        (w.zipWithIndex.map { case (c, i) =>
          if (i == 0) c.toString else "##" + c }.toVector, ws.size.toLong)
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, Long)]
    var done = false
    for (_ <- 1 to nMerges if !done) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val syms = scala.collection.mutable.HashMap.empty[String, Long]
      for ((s, c) <- tbl) {
        for (x <- s) syms(x) = syms.getOrElse(x, 0L) + c
        for (i <- 0 until s.length - 1)
          pairs(s(i) -> s(i + 1)) = pairs.getOrElse(s(i) -> s(i + 1), 0L) + c
      }
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), fp) = pairs.toSeq.minBy { case ((a, b), n) =>
          (-(n.toDouble / (syms(a).toDouble * syms(b).toDouble)), a, b)
        }
        out += ((l, r, l + r.stripPrefix("##"), fp))
        val merged = l + r.stripPrefix("##")
        tbl = tbl.map { case (s, c) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < s.length) {
            if (i < s.length - 1 && s(i) == l && s(i + 1) == r) {
              acc += merged; i += 2
            } else { acc += s(i); i += 1 }
          }
          (acc.toVector, c)
        }
      }
    }
    out.toSeq
  }

  test("wordpieceTrain matches the independent reference on 25 random corpora, both tiers") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    for (trial <- 0 until 25) {
      val words = Seq.fill(3 + rng.nextInt(20))(
        (0 until 1 + rng.nextInt(6)).map(_ => ('a' + rng.nextInt(3)).toChar).mkString)
      val n = 1 + rng.nextInt(5)
      val expected = refWordpiece(words, n)
      val docs = words.mkString(" ") :: Nil map Tuple1.apply toDF "text"
      def collected(df: org.apache.spark.sql.DataFrame) = df
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
      assert(collected(Vocab.wordpieceTrainDistributed(docs, "text", n)) == expected,
        s"distributed trial $trial corpus=${words.mkString(" ")} n=$n")
      assert(collected(Vocab.wordpieceTrainIncremental(docs, "text", n)) == expected,
        s"incremental trial $trial corpus=${words.mkString(" ")} n=$n")
      // deep run: most corpora exhaust every pair, exercising early stop
      assert(collected(Vocab.wordpieceTrainIncremental(docs, "text", 40)) ==
        refWordpiece(words, 40), s"incremental trial $trial n=40")
    }
  }

  test("wordpieceTrain merges favor exclusive pairs over frequent ones") {
    import spark.implicits._
    // "ab" appears 4x but a also occurs apart (az); "xy" appears 2x and
    // x,y occur ONLY together — likelihood ratio must pick (x,##y) first
    // (score 2/(2*2)=0.5 beats 4/(5*4)=0.2), where raw-frequency BPE
    // picks (a,b)
    val docs = Seq("ab ab ab ab xy xy az").toDF("text")
    val wp = Vocab.wordpieceTrain(docs, "text", 1).collect()
    assert(wp.head.getString(1) == "x" && wp.head.getString(2) == "##y")
    val bpe = Vocab.bpeTrain(docs, "text", 1).collect()
    assert(bpe.head.getString(1) == "a" && bpe.head.getString(2) == "b")
  }

  test("wordpieceTrain round-trips through wordpieceEncode with no [UNK]") {
    import spark.implicits._
    val corpus = Seq("the merge table the table scan scan the merge")
    val docs = corpus.map(Tuple1.apply).toDF("text")
    val merges = Vocab.wordpieceTrain(docs, "text", 8)
      .orderBy("merge_rank").collect().map(_.getString(3)).toSeq
    // vocab = every single character (bare + continuation) + the learned
    // pieces — the artifact a WordPiece tokenizer ships
    val chars = corpus.flatMap(_.split("\\s+")).flatMap(_.toSeq).distinct
      .flatMap(c => Seq(c.toString, "##" + c))
    val vocab = (chars ++ merges).distinct
    val idDocs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val enc = Vocab.wordpieceEncode(idDocs, "doc_id", "text", vocab).collect()
    assert(enc.nonEmpty)
    for (row <- enc) {
      val tok = row.getString(2)
      val pieces = row.getSeq[String](3)
      assert(!pieces.contains("[UNK]"), s"token $tok hit [UNK]")
      assert(pieces.head + pieces.tail.map(_.stripPrefix("##")).mkString == tok,
        s"pieces $pieces do not reconstruct $tok")
    }
    // the trained merges are actually USED: at least one multi-char piece
    assert(enc.exists(_.getSeq[String](3).exists(p => p.stripPrefix("##").length > 1)))
  }

  // ---- independent sequential unigram-LM reference (fresh code written
  // from the Vocab.unigramTrain spec: substring seed, Viterbi hard-EM
  // rounds, count prune, final recount) ----
  private def refUnigramTrain(words: Seq[String], vocabSize: Int, seedSize: Int,
      maxPieceLen: Int, emIters: Int): Seq[(String, Long)] = {
    val hist: Map[String, Long] =
      words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sub = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, c) <- hist; i <- w.indices; l <- 1 to math.min(maxPieceLen, w.length - i)) {
      val p = w.substring(i, i + l)
      sub(p) = sub.getOrElse(p, 0L) + c
    }
    val singles = sub.iterator.filter(_._1.length == 1).toMap
    var vocab: Map[String, Long] = sub.toSeq.sortBy { case (p, c) => (-c, p) }
      .take(seedSize).toMap ++ singles
    def seg(w: String, probs: Map[String, Double]): List[String] = {
      val n = w.length
      val best = new Array[(Double, String)](n + 1)
      best(0) = (1.0, "")
      for (i <- 1 to n) {
        var cands = List.empty[(Double, String)]
        for (l <- 1 to math.min(maxPieceLen, i); j = i - l; if best(j) != null) {
          val p = w.substring(j, i)
          probs.get(p).foreach(pr => cands ::= ((best(j)._1 * pr, p)))
        }
        if (cands.nonEmpty)
          best(i) = cands.sortBy { case (v, p) => (-v, p) }.head
      }
      var pos = n
      var out = List.empty[String]
      while (pos > 0) { val p = best(pos)._2; out ::= p; pos -= p.length }
      out
    }
    def estep(v: Map[String, Long]): Map[String, Long] = {
      val t = v.values.sum
      val probs = v.map { case (p, c) => (p, c.toDouble / t.toDouble) }
      val cnt = scala.collection.mutable.HashMap.empty[String, Long]
      for ((w, c) <- hist; p <- seg(w, probs)) cnt(p) = cnt.getOrElse(p, 0L) + c
      cnt.toMap
    }
    for (_ <- 0 until emIters) {
      val c = estep(vocab)
      vocab = c ++ singles.keysIterator.filterNot(c.contains).map(_ -> 0L)
    }
    val kept = vocab.toSeq.sortBy { case (p, c) => (-c, p) }.take(vocabSize).toMap ++
      singles.keysIterator.map(s => s -> vocab(s)).toMap
    val fc = estep(kept)
    kept.keysIterator.map(p => (p, fc.getOrElse(p, 0L))).toSeq
      .sortBy { case (p, c) => (-c, p) }
  }

  test("unigramTrain matches the independent sequential reference on 25 random corpora") {
    import spark.implicits._
    val rng = new scala.util.Random(8)
    for (trial <- 0 until 25) {
      val words = Seq.fill(3 + rng.nextInt(20))(
        (0 until 1 + rng.nextInt(6)).map(_ => ('a' + rng.nextInt(3)).toChar).mkString)
      val vs = 4 + rng.nextInt(10)
      val expected = refUnigramTrain(words, vs, seedSize = vs + 30,
        maxPieceLen = 3, emIters = 2)
      val docs = Seq(words.mkString(" ")).toDF("text")
      val got = Vocab.unigramTrain(docs, "text", vs, seedSize = vs + 30,
          maxPieceLen = 3, emIters = 2)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == expected,
        s"trial $trial corpus=${words.mkString(" ")} vocabSize=$vs")
    }
  }

  test("unigram Viterbi path is maximum-probability (brute-force over all segmentations)") {
    val rng = new scala.util.Random(21)
    for (_ <- 0 until 200) {
      val w = (0 until 1 + rng.nextInt(7)).map(_ => ('a' + rng.nextInt(3)).toChar).mkString
      val pieces = (for (i <- w.indices; l <- 1 to math.min(4, w.length - i))
        yield w.substring(i, i + l)).distinct
      val withC = pieces.filter(p => p.length == 1 || rng.nextBoolean())
        .map(p => (p, 1L + rng.nextInt(9))).toMap
      val t = withC.values.sum
      val probs = withC.map { case (p, c) => (p, c.toDouble / t.toDouble) }
      val path = Vocab.viterbiPath(w.map(_.toString).toArray, probs, 4)
      assert(path != null && path.mkString == w)
      def segs(s: String): Seq[List[String]] =
        if (s.isEmpty) Seq(Nil)
        else (1 to math.min(4, s.length)).flatMap { l =>
          val h = s.substring(0, l)
          if (probs.contains(h)) segs(s.substring(l)).map(h :: _) else Nil
        }
      // left-to-right fold — the exact multiplication order the dp uses,
      // so max-equality is bit-exact, not approximate
      val all = segs(w).map(_.foldLeft(1.0)((acc, x) => acc * probs(x)))
      val mine = path.foldLeft(1.0)((acc, x) => acc * probs(x))
      assert(all.nonEmpty && mine == all.max, s"word $w")
    }
  }

  test("unigramTrain round-trips: encoding the training corpus reproduces trained counts") {
    import spark.implicits._
    val corpus = Seq(
      "the merge table the table scan scan the merge unigram model",
      "merge the scan table model unigram the")
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val trained = Vocab.unigramTrain(docs, "text", vocabSize = 30, seedSize = 200,
        maxPieceLen = 5, emIters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // character-coverage invariant: every corpus code point survives prune
    val chars = corpus.flatMap(_.split("\\s+")).flatten.map(_.toString).distinct
    assert(chars.forall(c => trained.exists(_._1 == c)))
    val enc = Vocab.unigramEncode(docs, "doc_id", "text", trained, maxPieceLen = 5)
    val encCounts = enc.select(explode(col("pieces")).as("p")).groupBy("p")
      .count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(!encCounts.contains("[UNK]"))
    for ((p, c) <- trained)
      assert(encCounts.getOrElse(p, 0L) == c, s"piece $p trained=$c")
    assert(trained.exists { case (p, c) => p.length > 1 && c > 0 })
  }

  test("forward-backward expected counts match brute-force enumeration over all segmentations") {
    val rng = new scala.util.Random(33)
    for (_ <- 0 until 200) {
      val w = (0 until 1 + rng.nextInt(7)).map(_ => ('a' + rng.nextInt(3)).toChar).mkString
      val pieces = (for (i <- w.indices; l <- 1 to math.min(3, w.length - i))
        yield w.substring(i, i + l)).distinct
      val withC = pieces.filter(p => p.length == 1 || rng.nextBoolean())
        .map(p => (p, 1L + rng.nextInt(9))).toMap
      val t = withC.values.sum
      val probs = withC.map { case (p, c) => (p, c.toDouble / t.toDouble) }
      def segs(s: String): Seq[List[String]] =
        if (s.isEmpty) Seq(Nil)
        else (1 to math.min(3, s.length)).flatMap { l =>
          val h = s.substring(0, l)
          if (probs.contains(h)) segs(s.substring(l)).map(h :: _) else Nil
        }
      val all = segs(w)
      val z = all.map(_.map(probs).product).sum
      val expected = all.flatMap(seg => seg.map(p => (p, seg.map(probs).product / z)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val got = Vocab.forwardBackwardCounts(w.map(_.toString).toArray, probs, 3)
        .toSeq.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(got.keySet == expected.keySet, s"word $w")
      for ((p, e) <- expected)
        assert(math.abs(got(p) - e) <= 1e-9 * math.max(1.0, e), s"word $w piece $p")
      // expectation of covered length = word length (paths tile the word)
      val covered = got.iterator.map { case (p, e) => p.length * e }.sum
      assert(math.abs(covered - w.length) <= 1e-9 * w.length)
    }
  }

  test("soft-EM iterations never decrease corpus likelihood") {
    val rng = new scala.util.Random(5)
    for (_ <- 0 until 30) {
      val words = Seq.fill(4 + rng.nextInt(12))(
        (0 until 1 + rng.nextInt(6)).map(_ => ('a' + rng.nextInt(3)).toChar).mkString)
      val hist = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sub = scala.collection.mutable.HashMap.empty[String, Long]
      for ((w, c) <- hist; i <- w.indices; l <- 1 to math.min(3, w.length - i)) {
        val p = w.substring(i, i + l)
        sub(p) = sub.getOrElse(p, 0L) + c
      }
      var counts: Map[String, Double] =
        sub.toMap.map { case (p, c) => (p, c.toDouble) }
      def alphaN(w: String, probs: Map[String, Double]): Double = {
        val n = w.length
        val a = new Array[Double](n + 1); a(0) = 1.0
        for (i <- 1 to n; l <- 1 to math.min(3, i))
          probs.get(w.substring(i - l, i)).foreach(p => a(i) += a(i - l) * p)
        a(n)
      }
      def likelihood(probs: Map[String, Double]): Double =
        hist.iterator.map { case (w, c) => c * math.log(alphaN(w, probs)) }.sum
      var prev = Double.NegativeInfinity
      for (iter <- 0 until 4) {
        val total = counts.values.sum
        val probs = counts.map { case (p, v) => (p, v / total) }
        val ll = likelihood(probs)
        assert(ll >= prev - 1e-9 * math.abs(prev), s"iter $iter: $ll < $prev")
        prev = ll
        counts = hist.iterator.flatMap { case (w, c) =>
          Vocab.forwardBackwardCounts(w.map(_.toString).toArray, probs, 3)
            .map { case (p, e) => (p, e * c) }
        }.toSeq.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
  }

  test("unigramTrainEm ships a normalized log-prob distribution with character coverage") {
    import spark.implicits._
    val corpus = Seq("abc abc abc abc xyz xyz xyz q abc xyz")
    val docs = corpus.map(Tuple1.apply).toDF("text")
    val out = Vocab.unigramTrainEm(docs, "text", vocabSize = 9, seedSize = 60,
        maxPieceLen = 3, emItersPerRound = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // normalized: sum of probabilities = 1
    val mass = out.iterator.map { case (_, lp) => math.exp(lp) }.sum
    assert(math.abs(mass - 1.0) <= 1e-9, s"mass $mass")
    // character coverage survives pruning
    for (c <- "abcxyzq")
      assert(out.exists(_._1 == c.toString), s"single $c pruned")
    // the structured pieces dominate: abc and xyz carry the most mass
    val top2 = out.sortBy { case (_, lp) => -lp }.take(2).map(_._1).toSet
    assert(top2 == Set("abc", "xyz"), s"top2 $top2")
    // both tiers surface the same dominant pieces
    val hard = Vocab.unigramTrain(docs, "text", vocabSize = 9, seedSize = 60,
        maxPieceLen = 3, emIters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val hardTop2 = hard.sortBy { case (p, c) => (-c, p) }.take(2).map(_._1).toSet
    assert(hardTop2 == Set("abc", "xyz"), s"hard tier top2 $hardTop2")
  }

  test("unigramTrainEm shrink loop reaches the target vocab and stops at coverage floor") {
    import spark.implicits._
    val docs = Seq("aa ab ba bb aab abb bab").map(Tuple1.apply).toDF("text")
    // target below the character count: coverage floor (2 singles) wins
    val floor = Vocab.unigramTrainEm(docs, "text", vocabSize = 1, seedSize = 30,
        maxPieceLen = 3, emItersPerRound = 1)
      .collect().map(_.getString(0)).toSeq
    assert(floor.toSet.intersect(Set("a", "b")) == Set("a", "b"))
    // normal target reached exactly
    val sized = Vocab.unigramTrainEm(docs, "text", vocabSize = 5, seedSize = 30,
        maxPieceLen = 3, emItersPerRound = 1)
      .collect().map(_.getString(0)).toSeq
    assert(sized.size >= 2 && sized.size <= 5, s"got ${sized.size} pieces")
  }

  test("decodeIds round-trips encode→ids→decode and tiers agree past MaxInlineVocab") {
    import spark.implicits._
    val docs = Seq(("u:1", "abab ab q ba"), ("u:2", "ba ab abab")).toDF("doc_id", "text")
    val enc = Vocab.bpeEncode(docs, "doc_id", "text", Seq(("a", "b"), ("ab", "ab")))
    val vocab = Seq("abab", "ab", "b", "a")
    val padded = vocab ++ (0 until Vocab.MaxInlineVocab + 1).map(i => s"#pad$i")
    def run(ids: org.apache.spark.sql.DataFrame, v: Seq[String]) =
      Vocab.decodeIds(ids, v)
        .orderBy("doc", "token_idx").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2),
          r.getSeq[String](3).toList, r.getString(4))).toList
    val inline = run(Vocab.piecesToIds(enc, vocab), vocab)
    val broad = run(Vocab.piecesToIds(enc, padded), padded)
    assert(broad == inline)
    // every in-vocab token decodes to itself; OOV "q" decodes to the sentinel
    inline.foreach { case (_, _, token, _, decoded) =>
      if (token == "q") assert(decoded == "[UNK]")
      else assert(decoded == token, s"round-trip broke for $token")
    }
  }

  test("stripMarkup drops tags, single-decodes entities, collapses whitespace") {
    import spark.implicits._
    val out = Seq(
      "<p>a  <b>b</b></p>",
      "&amp;lt; stays &lt; becomes",
      "<!-- x --><div class='k'>c&nbsp;d</div>",
      "no markup at all").toDF("t")
      .select(TextAnalysis.stripMarkup(col("t"))).as[String].collect().toList
    assert(out == List("a b", "&lt; stays < becomes", "c d", "no markup at all"))
  }

  test("temperatureMix: tau=1 keeps all, kept sets are monotone in tau, smallest domain whole") {
    import spark.implicits._
    val df = (0 until 300).map(i =>
      (i.toLong, if (i % 10 < 6) "a" else if (i % 10 < 9) "b" else "c"))
      .toDF("id", "domain")
    def kept(tau: Double) = Sampling.temperatureMix(df, "id", "domain", tau)
      .select("id").as[Long].collect().toSet
    assert(kept(1.0).size == 300)
    val k0 = kept(0.0); val k5 = kept(0.5)
    assert(k0.subsetOf(k5) && k5.subsetOf(kept(1.0)))
    // the smallest domain (c, 30 rows) is never down-sampled
    val cIds = (0 until 300).filter(_ % 10 >= 9).map(_.toLong).toSet
    assert(cIds.subsetOf(k0) && cIds.subsetOf(k5))
    // tau=0 equalizes in expectation: every domain's keep-count is near 30
    val byDom = df.filter(col("id").isInCollection(k0)).groupBy("domain").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom.values.forall(n => n >= 15 && n <= 45), byDom.toString)
  }

  test("lineDedup keeps first occurrence corpus-wide, exempts empty lines") {
    import spark.implicits._
    val docs = Seq(
      (1L, "header\n\nalpha\nbeta\n\nfooter"),
      (2L, "header\ngamma\n\nfooter\nalpha"),
      (3L, "header\nfooter")).toDF("id", "txt")
    val out = Dedup.lineDedup(docs, "id", "txt")
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 1 is first everywhere: all 6 lines survive (incl. 2 empties)
    assert(out(0) == ((1L, 6L, 6L, "header\n\nalpha\nbeta\n\nfooter")))
    // doc 2 loses header/footer/alpha to doc 1, keeps gamma + its empty
    assert(out(1) == ((2L, 5L, 2L, "gamma\n")))
    // doc 3 loses everything
    assert(out(2) == ((3L, 2L, 0L, "")))
  }

  test("quantizeInt8: codes span 0..255 per dim, reconstruction error bounded by half a step") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Seq(0.0, -1.0, 5.0)), (1L, Seq(1.0, 1.0, 5.0)),
      (2L, Seq(0.25, 0.0, 5.0)), (3L, Seq(0.75, 0.5, 5.0)))
      .toDF("vec_id", "embedding")
    val out = Ann.quantizeInt8(vecs, "vec_id", "embedding")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toList, r.getSeq[Double](2).toList))
    // dim 0 range [0,1]: extremes hit the endpoints of the code space
    assert(out(0)._2(0) == 0 && out(1)._2(0) == 255)
    // constant dim 2 quantizes to 0 and dequantizes to the constant
    assert(out.forall(_._2(2) == 0) && out.forall(_._3(2) == 5.0))
    // reconstruction error <= half a quantization step per dim
    val raw = vecs.orderBy("vec_id").collect()
      .map(_.getSeq[Double](1).toList)
    val ranges = List(1.0, 2.0, 0.0)
    for ((o, r) <- out.zip(raw); d <- 0 until 3)
      assert(math.abs(o._3(d) - r(d)) <= ranges(d) / 255.0 / 2.0 + 1e-12,
        s"vec ${o._1} dim $d: deq ${o._3(d)} vs raw ${r(d)}")
  }

  test("PQ: codes are bounded, ADC ranks same-cluster neighbors first on separable data") {
    import spark.implicits._
    // two well-separated clusters in 16 dims; even ids near +1, odd near -1
    val vecs = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) 1.0 else -1.0
      (i, (0 until 16).map(d => base + 0.01 * ((i + d) % 5)))
    }.toDF("vec_id", "embedding")
    val books = Ann.pqCodebooks(vecs, "vec_id", "embedding", m = 4, k = 4)
    assert(books.size == 4 && books.forall(_.forall(_._2.size == 4)))
    val codes = Ann.pqEncode(vecs, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(codes.values.forall(cs => cs.size == 4 && cs.forall(c => c >= 0 && c < 4)))
    // every top-3 ADC neighbor of a query shares its parity (its cluster)
    val top = Ann.pqTopK(vecs, vecs.filter(col("vec_id") < 4), "vec_id",
        "embedding", m = 4, k = 4, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(top.length == 12)
    top.foreach { case (q, n) =>
      assert(q % 2 == n % 2, s"query $q got cross-cluster neighbor $n")
    }
  }

  test("residual IVF-PQ approximates true L2 better than absolute PQ on clustered data") {
    import spark.implicits._
    // two tight clusters far apart: residual coding spends the code
    // budget on the small within-cluster spread instead of the gap
    val vecs = (0L until 60L).map { i =>
      val base = if (i % 2 == 0) 10.0 else -10.0
      (i, (0 until 16).map(d => base + 0.05 * ((i * 7 + d * 3) % 11)))
    }.toDF("vec_id", "embedding")
    val raw = vecs.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def trueL2(a: Long, b: Long): Double =
      raw(a).zip(raw(b)).map { case (x, y) => (x - y) * (x - y) }.sum
    def meanAdcErr(byResidual: Boolean): Double = {
      val out = Ann.ivfPqTopK(vecs, vecs.filter(col("vec_id") < 6), "vec_id",
          "embedding", nLists = 2, nprobe = 1, m = 4, k = 4, topK = 5,
          byResidual = byResidual)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      assert(out.nonEmpty)
      out.map { case (q, n, adc) => math.abs(adc - trueL2(q, n)) }.sum / out.length
    }
    val (abs, res) = (meanAdcErr(false), meanAdcErr(true))
    assert(res < abs, s"residual err $res should beat absolute err $abs")
  }

  test("pqCodebooks/pqEncode match an independent sequential k-means on 15 random corpora") {
    import spark.implicits._
    val rng = new scala.util.Random(88)
    for (trial <- 0 until 15) {
      val m = if (trial % 2 == 0) 2 else 4
      val k = if (trial % 3 == 0) 2 else 4
      val dims = 8
      val sub = dims / m
      val n = k + 8 + rng.nextInt(28)
      val vecs = (0L until n.toLong).map(i =>
        (i, Seq.fill(dims)(math.rint(rng.nextDouble() * 100) / 100.0)))
      // independent sequential reference: same protocol (init = ids < k,
      // element-order L2 folds, tie -> lowest c, empty clusters drop),
      // plain-double means (centroid compare is approximate)
      def l2(a: Seq[Double], b: Seq[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
        s
      }
      def refBooks: Seq[Seq[(Int, Seq[Double])]] = (0 until m).map { s =>
        var cents: Seq[(Int, Seq[Double])] = vecs.filter(_._1 < k)
          .sortBy(_._1).map { case (id, v) =>
            (id.toInt, v.slice(s * sub, (s + 1) * sub)) }
        for (_ <- 0 until 2) {
          val grouped = vecs.groupBy { case (_, v) =>
            val sv = v.slice(s * sub, (s + 1) * sub)
            cents.minBy { case (c, ctr) => (l2(sv, ctr), c) }._1
          }
          cents = grouped.toSeq.map { case (c, members) =>
            val svs = members.map(_._2.slice(s * sub, (s + 1) * sub))
            (c, (0 until sub).map(d => svs.map(_(d)).sum / svs.size))
          }.sortBy(_._1)
        }
        cents
      }
      val df = vecs.toDF("vec_id", "embedding")
      val books = Ann.pqCodebooks(df, "vec_id", "embedding", m, k)
      val ref = refBooks
      assert(books.map(_.map(_._1)) == ref.map(_.map(_._1)),
        s"trial $trial: cluster-id structure diverged")
      for ((bs, rs) <- books.zip(ref); ((c1, v1), (c2, v2)) <- bs.zip(rs)) {
        assert(c1 == c2)
        v1.zip(v2).foreach { case (a, b) =>
          assert(math.abs(a - b) < 1e-9, s"trial $trial center $c1: $a vs $b") }
      }
      // codes agree with reference argmin under the reference books
      val codes = Ann.pqEncode(df, "vec_id", "embedding", books)
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
      for ((id, v) <- vecs) {
        val want = (0 until m).map { s =>
          val sv = v.slice(s * sub, (s + 1) * sub)
          ref(s).minBy { case (c, ctr) => (l2(sv, ctr), c) }._1
        }.toList
        assert(codes(id) == want, s"trial $trial vec $id")
      }
    }
  }

  test("pqTopK serving overload with pre-trained books equals the training path") {
    import spark.implicits._
    val vecs = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) 1.0 else -1.0
      (i, (0 until 16).map(d => base + 0.01 * ((i + d) % 5)))
    }.toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") < 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toList
    val trained = rows(Ann.pqTopK(vecs, q, "vec_id", "embedding",
      m = 4, k = 4, topK = 3))
    val books = Ann.pqCodebooks(vecs, "vec_id", "embedding", m = 4, k = 4)
    val served = rows(Ann.pqTopK(vecs, q, "vec_id", "embedding", books,
      k = 4, topK = 3))
    assert(served == trained)
  }

  test("ivfPqSearch serves a FRESH query batch against a built index") {
    import spark.implicits._
    val corpus = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) 1.0 else -1.0
      (i, (0 until 16).map(d => base + 0.01 * ((i + d) % 5)))
    }.toDF("vec_id", "embedding")
    val index = Ann.ivfPqBuild(corpus, "vec_id", "embedding",
      nLists = 2, m = 4, k = 4, byResidual = true)
    // queries NOT in the corpus: one per cluster
    val fresh = Seq(
      (1000L, (0 until 16).map(_ => 1.02)),
      (1001L, (0 until 16).map(_ => -0.98))).toDF("vec_id", "embedding")
    val out = Ann.ivfPqSearch(index, fresh, "vec_id", "embedding",
        nprobe = 1, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.length == 6)
    out.foreach { case (q, n) =>
      val wantEven = q == 1000L
      assert((n % 2 == 0) == wantEven, s"fresh query $q got neighbor $n")
    }
  }

  test("quantizeInt8 codes match the naive per-dim formula exactly") {
    import spark.implicits._
    val rng = new scala.util.Random(77)
    val vecs = (0L until 50L).map(i =>
      (i, Seq.fill(6)(rng.nextDouble() * 20 - 10)))
    val df = vecs.toDF("vec_id", "embedding")
    val mins = (0 until 6).map(d => vecs.map(_._2(d)).min)
    val maxs = (0 until 6).map(d => vecs.map(_._2(d)).max)
    val got = Ann.quantizeInt8(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    for ((id, v) <- vecs) {
      val want = (0 until 6).map { d =>
        val rg = maxs(d) - mins(d)
        if (rg == 0) 0
        else math.min(255, math.max(0,
          math.floor((v(d) - mins(d)) * 255.0 / rg + 0.5).toInt))
      }.toList
      assert(got(id) == want, s"vec $id")
    }
  }

  test("decodeIds maps out-of-range ids (including unkId) to the sentinel") {
    import spark.implicits._
    val ids = Seq(("d1", 0, "tok", Seq(0, -1, 7, 1)))
      .toDF("doc", "token_idx", "token", "ids")
    val out = Vocab.decodeIds(ids, Seq("x", "y")).collect().head
    assert(out.getSeq[String](3).toList == List("x", "[UNK]", "[UNK]", "y"))
    assert(out.getString(4) == "x[UNK][UNK]y")
  }
}
