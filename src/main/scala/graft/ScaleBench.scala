package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Ann, Dedup, Sampling, SuffixArray, Vocab}

/** Headline-operator scale sweep — the committed, re-runnable form of the
  * SCALE.md stress protocol (the sf1ish/sf10ish amplified corpora: every
  * sf0.1 document/embedding duplicated into N near-identical copies, the
  * adversarial shape for similarity operators).
  *
  * Unlike Bench (which runs the ORACLE-pinned query parameterizations,
  * e.g. numPlanes=6 / nLists=8 so DuckDB can rebuild identical state),
  * this runs the SCALE-CONTRACT parameterizations the operators document
  * for growing corpora: auto-sized LSH planes, auto-sized IVF cluster
  * counts, the ngram stop-shingle cap. Single run per op (these are
  * multi-minute measurements, contention noise is secondary to the
  * orders-of-magnitude question), rows + seconds printed per op and as a
  * final JSON line.
  *
  * Usage: runMain graft.ScaleBench [corpusDir] [op ...]
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10ish")
    val only = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs = Tables.t(spark, dir, "documents")
    def emb = Tables.t(spark, dir, "embeddings")

    // Build-once IVF-PQ index, MATERIALIZED to parquet (the on-disk form
    // a serving fleet loads; books/centroid table are driver-small and
    // ride in the case class). First caller pays the build; the serve
    // ops below then measure pure batch-serving cost against the coded
    // corpus — which never re-reads raw vectors.
    var ivfPqCache: Option[Ann.IvfPqIndex] = None
    def materializedIvfPq(): Ann.IvfPqIndex = ivfPqCache.getOrElse {
      val d = "/tmp/graft_ivfpq_index"
      val idx = Ann.ivfPqBuild(emb, "vec_id", "embedding",
        nLists = 64, m = 8, k = 16)
      idx.encoded.write.mode("overwrite").parquet(s"$d/encoded")
      idx.centroids.write.mode("overwrite").parquet(s"$d/centroids")
      val served = Ann.IvfPqIndex(spark.read.parquet(s"$d/encoded"),
        spark.read.parquet(s"$d/centroids"), idx.books, idx.k, idx.byResidual)
      ivfPqCache = Some(served)
      served
    }

    // 90% standing graph (bench config k=12/iters=5 random-init) + the
    // 10%/5% tails staged as NDJSON — built once, ~32 part files per
    // staging dir so maxFilesPerTrigger dials the batch count
    lazy val graphIngestFix: (String, Seq[Long], Long) = {
      val d = java.nio.file.Files
        .createTempDirectory("graft_scale_ingest_fix").toString
      val n = emb.count()
      val cut = (n * 9) / 10
      val corpus = emb.filter(col("vec_id") < cut)
      Ann.serveGraph(Ann.nnDescent(corpus, "vec_id", "embedding",
          k = 12, iters = 5, randomInit = true))
        .write.mode("overwrite").parquet(s"$d/adj")
      corpus.select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
        .write.mode("overwrite").parquet(s"$d/corp")
      def stage(pred: org.apache.spark.sql.Column, name: String): Unit =
        emb.filter(pred)
          .select(to_json(struct(col("vec_id"),
            col("embedding").cast("array<double>").as("embedding"),
            (lit(1700000000L) + col("vec_id")).as("ingest_ts"))).as("value"))
          // 32 part files so maxFilesPerTrigger can DIAL the batch count
          // (a single-file drop is always one micro-batch — measured:
          // mft had no effect until this repartition)
          .repartition(32)
          .write.mode("overwrite").text(s"$d/$name")
      stage(col("vec_id") >= cut, "staging10")
      stage(col("vec_id") >= (n * 95) / 100, "staging5")
      (d, Ann.spreadEntries(cut), n - cut)
    }

    def streamIngestProfile(mft: Option[Int], stagingName: String): Long = {
      val (d, entries, drop10) = graphIngestFix
      val root = java.nio.file.Files
        .createTempDirectory("graft_scale_ingest_rep").toString
      spark.read.parquet(s"$d/adj").write.parquet(s"$root/adj")
      spark.read.parquet(s"$d/corp").write.parquet(s"$root/corp")
      val jobs = new java.util.concurrent.atomic.AtomicLong()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val q = graft.streaming.StreamingAnn.graphIngestToParquet(spark,
        s"$d/$stagingName", s"$root/adj", s"$root/corp", s"$root/ckpt",
        kLink = 12, entryIds = entries, beamWidth = 32, hops = 2,
        expandHops = 2, maxFilesPerTrigger = mft)
      try q.processAllAvailable() finally q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      val batches = q.recentProgress.count(_.numInputRows > 0)
      println(f"STREAM_INGEST staging=$stagingName mft=${mft.getOrElse(0)}%d " +
        f"drop10=$drop10 batches=$batches jobs=${jobs.get}%d sec=$sec%.1f " +
        f"jobs_per_batch=${if (batches > 0) jobs.get.toDouble / batches else 0.0}%.1f")
      spark.read.parquet(s"$root/adj").count()
    }


    val ops: Seq[(String, () => Long)] = Seq(
      // stop-shingle cap = the documented dial for duplication-adversarial
      // corpora (shingles in more docs than the cap are dropped from
      // candidate generation; uncapped, candidate volume grows with the
      // SQUARE of the duplication rate)
      "ngram_jaccard_cap300" -> (() =>
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8,
          maxShingleFreq = Some(300)).count()),
      "substring_dedup_w5" -> (() =>
        Dedup.substringDedup(docs, "doc_id", "text", 5).count()),
      // containment UNCAPPED: for τ-high directed near-dups the prefix +
      // positional filters (ranked on the FULL frequency table) are the
      // scale dial — a stop-shingle cap backfires here, because dropping
      // shingles shifts survivor ranks DOWN until whole docs fit inside
      // the prefix bound (measured cold-session vs cold-session on the
      // 10× copyvar corpus: cap300 45.7 s, uncapped 32.2 s — 14 s warm).
      // The cap remains the right dial for the RESEMBLANCE join
      // (ngram_jaccard_cap300 above), whose bound tightens with both
      // docs' sizes.
      "containment_tau90" -> (() =>
        Dedup.containmentPairs(docs, "doc_id", "text", 3, 900000L).count()),
      // vocabulary-grain entity resolution over part names (quadratic
      // work bounded by the name vocabulary, not the fact table)
      "er_entities_parts" -> (() =>
        graft.operators.EntityResolution.resolveEntities(
          Tables.t(spark, dir, "part"), "p_partkey", "p_name").count()),
      // dynamic-batching padding report (per-shard banded windows)
      "length_batching_b16" -> (() =>
        graft.operators.Packing.lengthBatchedWaste(
          docs.withColumn("n_tokens",
            graft.operators.TextAnalysis.tokenCount(col("text")).cast("long")),
          "doc_id", "n_tokens", "source", 16L, 16).count()),
      "semantic_dedup_auto" -> (() =>
        Dedup.semanticDedupAuto(emb, "vec_id", "embedding", 0.4,
          targetClusterSize = Some(200L)).count()),
      "knn_join_auto_k2" -> (() =>
        Ann.knnJoinAuto(emb, "vec_id", "embedding", k = 2).count()),
      "bpe_train_job8" -> (() =>
        Vocab.bpeTrainDistributed(docs, "text", 8).count()),
      "bpe_train_incr500" -> (() =>
        Vocab.bpeTrainIncremental(docs, "text", 500).count()),
      "wordpiece_train8" -> (() =>
        Vocab.wordpieceTrainDistributed(docs, "text", 8).count()),
      "unigram_train300" -> (() =>
        Vocab.unigramTrain(docs, "text", 300, seedSize = 3000,
          maxPieceLen = 6, emIters = 2).count()),
      "bpe_encode8" -> (() => {
        val m = Vocab.bpeTrain(docs, "text", 8).orderBy("merge_rank")
          .collect().map(r => (r.getString(1), r.getString(2))).toSeq
        Vocab.bpeEncode(docs, "doc_id", "text", m).count()
      }),
      // full tensor path: encode → ids → decode (two extra projections
      // over the encode cost — the round-trip gate at corpus scale)
      "bpe_ids_decode8" -> (() => {
        val m = Vocab.bpeTrain(docs, "text", 8).orderBy("merge_rank")
          .collect().map(r => (r.getString(1), r.getString(2))).toSeq
        val vocab = Vocab.bpeEncode(docs, "doc_id", "text", m)
          .select(explode(col("pieces")).as("p"))
          .groupBy("p").count()
          .orderBy(desc("count"), col("p"))
          .collect().map(_.getString(0)).toSeq
        Vocab.decodeIds(
          Vocab.piecesToIds(Vocab.bpeEncode(docs, "doc_id", "text", m), vocab),
          vocab).count()
      }),
      // corpus-wide line dedup over synthesized pages (same construction
      // as dd_line_dedup: overlapping membership + shared boilerplate)
      "line_dedup_pages" -> (() => {
        val l = docs.select(col("doc_id"), substring(col("text"), 1, 100).as("l"))
        val pg = floor(col("doc_id") / 5)
        val mem = l.select(col("doc_id"), col("l"),
          explode(when(col("doc_id") % 5 < 2 && col("doc_id") >= 5,
            array(pg, pg - 1)).otherwise(array(pg))).as("page"))
        val pages = mem.groupBy("page").agg(
          concat_ws("\n", lit("HEADER: shared boilerplate"),
            array_join(transform(
              array_sort(collect_list(struct(col("doc_id"), col("l")))),
              x => x.getField("l")), "\n"),
            lit("FOOTER: (c) legal text")).as("text"))
        Dedup.lineDedup(pages, "page", "text").count()
      }),
      "quantize_int8" -> (() =>
        Ann.quantizeInt8(emb, "vec_id", "embedding").count()),
      "pq_encode_m8k16" -> (() => {
        val books = Ann.pqCodebooks(emb, "vec_id", "embedding", m = 8, k = 16)
        Ann.pqEncode(emb, "vec_id", "embedding", books).count()
      }),
      "pq_adc_q100_top10" -> (() =>
        Ann.pqTopK(emb, emb.filter(col("vec_id") < 100),
          "vec_id", "embedding", m = 8, k = 16, topK = 10).count()),
      // the production layout: coarse lists prune ~nprobe/nLists of the
      // corpus before the ADC scan
      "ivfpq_q100_top10" -> (() =>
        Ann.ivfPqTopK(emb, emb.filter(col("vec_id") < 100),
          "vec_id", "embedding", nLists = 64, nprobe = 8, m = 8, k = 16,
          topK = 10).count()),
      "temperature_mix_05" -> (() =>
        Sampling.temperatureMix(docs, "doc_id", "source", tau = 0.5).count()),
      // suffix array: rounds grow log4(maxDocLen), NOT with corpus size —
      // the 10×/100× ratio should track the per-round exchange volume
      // (≈ corpus chars) times a CONSTANT round count
      "suffix_ranks_full" -> (() =>
        SuffixArray.suffixRanks(docs, "doc_id", "text").count()),
      "dup_spans_min20" -> (() =>
        SuffixArray.dupSpans(docs, "doc_id", "text", 20, 64).count()),
      // ---- build/serve split: the numbers a deployment actually sees.
      // `ivfpq_q100_top10` above pays TRAINING in-query (the oracle-
      // harness shape); a 100 TB serving path builds the IvfPqIndex once,
      // MATERIALIZES the coded corpus (parquet — the index persists like
      // any FAISS index file; raw vectors are gone from the serving
      // scan), and pays only nprobe-pruned ADC per query batch.
      "ivfpq_build_materialize" -> (() => materializedIvfPq().encoded.count()),
      "ivfpq_serve_q100_top10" -> (() =>
        Ann.ivfPqSearch(materializedIvfPq(),
          emb.filter(col("vec_id") < 100), "vec_id", "embedding",
          nprobe = 8, topK = 10).count()),
      "ivfpq_serve_q1000_top10" -> (() =>
        Ann.ivfPqSearch(materializedIvfPq(),
          emb.filter(col("vec_id") < 1000), "vec_id", "embedding",
          nprobe = 8, topK = 10).count()),
      "pq_serve_flat_q100_top10" -> (() => {
        // flat (unpruned) ADC over the SAME materialized codes — the
        // serve-side contrast that isolates what nprobe pruning buys
        val idx = materializedIvfPq()
        Ann.pqAdcTopK(idx.encoded, idx.books, idx.k,
          emb.filter(col("vec_id") < 100), "vec_id", "embedding",
          topK = 10).count()
      }),

      // ---- streaming NSW ingest decomposition (r15 directive #8):
      // batches × per-batch-walk pricing. The fixture (90% standing
      // graph + two NDJSON drops, 10% and 5% of the corpus) is built
      // once; each op replays a fresh copy of the index with a chosen
      // micro-batch split and prints batches / Spark jobs / seconds —
      // the claim under test: per-batch cost = ONE bounded walk (a
      // fixed job count per batch, NOT per vector), so total time is
      // ~linear in BATCH COUNT at fixed drop and SUB-linear in drop
      // size at fixed batch count (barriers amortize).
      // untimed-in-spirit warmup: identical work to the rows below; its
      // number absorbs the one-time JVM/codegen/page-cache cost that
      // otherwise lands on whichever row runs first (measured: the same
      // 28-job single-batch ingest was 256 s as run-1 and 33 s as run-4)
      "stream_ingest_warmup" -> (() => streamIngestProfile(Some(2), "staging10")),
      "stream_ingest_10pct_1batch" -> (() => streamIngestProfile(None, "staging10")),
      "stream_ingest_5pct_1batch" -> (() => streamIngestProfile(None, "staging5")),
      "stream_ingest_10pct_4batches" -> (() => streamIngestProfile(Some(8), "staging10")),
      "stream_ingest_10pct_16batches" -> (() => streamIngestProfile(Some(2), "staging10"))
    )
    val results = ops
      .filter { case (n, _) => only.isEmpty || only(n) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        val out = try Right(fn()) catch {
          case e: Throwable => Left(e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage).take(200))
        }
        val sec = (System.nanoTime() - t0) / 1e9
        out match {
          case Right(rows) => println(f"$name%-24s $sec%8.1f s  rows=$rows")
          case Left(err) => println(f"$name%-24s $sec%8.1f s  ERROR $err")
        }
        (name, sec, out)
      }
    val js = results.map {
      case (n, s, Right(r)) => s""""$n":{"sec":${f"$s%.1f"},"rows":$r}"""
      case (n, s, Left(e)) => s""""$n":{"sec":${f"$s%.1f"},"error":"${e.replace("\"", "'")}"}"""
    }.mkString("{", ",", "}")
    println(s"""{"scalebench":"$dir","cpus":$cpus,"ops":$js}""")
    spark.stop()
  }
}
