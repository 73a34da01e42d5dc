package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Dev profiler: stage-by-stage volumes + timings of ngramJaccardPairs at
  * an arbitrary SF dir (arg 0). Not a test — a `main` for the dev loop.
  */
object ProfNgram3 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.Tables.t(spark, dir, "documents")
    val n = 3; val threshold = 0.8
    val sh = Dedup.shingleIndex(docs, "doc_id", "text", n)
    time("shingleIndex count")(println("  sh rows: " + sh.count()))
    val cnt = sh.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    val freq = sh.groupBy("s").agg(count(lit(1)).as("f"))
    val ranked = sh.join(freq, "s").withColumn("rn",
      row_number().over(Window.partitionBy("doc").orderBy("f", "s")))
    val prefix = ranked.join(cnt, "doc")
      .filter(col("rn") <= col("n_sh") - ceil(col("n_sh") * threshold) + 1)
      .select(col("doc"), col("s"), col("rn"), col("n_sh"))
    time("prefix count")(println("  prefix rows: " + prefix.count()))
    val eps = lit(1e-9)
    val alpha = lit(threshold / (1.0 + threshold)) * (col("n_a") + col("n_b")) - eps
    val joined = prefix
      .select(col("doc").as("id_a"), col("s"), col("rn").as("rn_a"), col("n_sh").as("n_a"))
      .join(prefix.select(
        col("doc").as("id_b"), col("s"), col("rn").as("rn_b"), col("n_sh").as("n_b")), Seq("s"))
      .filter(col("id_a") < col("id_b"))
    time("raw prefix-join matches")(println("  rows: " + joined.count()))
    val cand = joined
      .filter(least(col("n_a"), col("n_b")) >=
        lit(threshold) * greatest(col("n_a"), col("n_b")) - eps)
      .filter(least(col("n_a") - col("rn_a"), col("n_b") - col("rn_b")) + lit(1) >= alpha)
      .select("id_a", "id_b").distinct()
    time("cand count")(println("  cand pairs: " + cand.count()))
    val inter = cand
      .join(sh.select(col("doc").as("id_a"), col("s")), "id_a")
      .join(sh.select(col("doc").as("id_b"), col("s")), Seq("id_b", "s"))
    time("verify expand")(println("  inter rows: " + inter.count()))
    time("full op")(println("  pairs: " +
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n, threshold).count()))
    time("full op rep2")(println("  pairs: " +
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n, threshold).count()))
    spark.stop()
  }
}
