package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Fns

/** Dev phase profiling of the PPJoin pipeline.
  * `Test/runMain graft.ProfNgram2 <sfDir>`
  */
object ProfNgram2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    Tables.t(spark, dir, "region").count()

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime
      val r = f
      println(f"PROF $name ${(System.nanoTime - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.t(spark, dir, "documents")
    val n = 3
    val threshold = 0.8

    // mirrors Dedup.shingleIndex
    val w = Window.partitionBy("doc").orderBy("p")
    val parts = (0 until n).map(k => if (k == 0) col("w") else lead("w", k).over(w))
    val sh = docs
      .select(col("doc_id").as("doc"), posexplode(Fns.tokens(col("text"))).as(Seq("p", "w")))
      .withColumn("s", when(parts.last.isNotNull, concat_ws(" ", parts: _*)))
      .filter(col("s").isNotNull)
      .select(col("doc"), col("s"))
      .distinct()
    time("shingle_index_count")(sh.count())
    time("shingle_index_count2")(sh.count())

    val cnt = sh.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    val freq = sh.groupBy("s").agg(count(lit(1)).as("f"))
    val ranked = sh.join(freq, "s")
      .withColumn("rn", row_number().over(Window.partitionBy("doc").orderBy("f", "s")))
    val prefix = ranked.join(cnt, "doc")
      .filter(col("rn") <= col("n_sh") - ceil(col("n_sh") * threshold) + 1)
      .select(col("doc"), col("s"))
    val cand = prefix.select(col("doc").as("id_a"), col("s"))
      .join(prefix.select(col("doc").as("id_b"), col("s")), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    time("candidates_count")(println("cands=" + cand.count()))
    time("candidates_count2")(cand.count())

    val full = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", n, threshold)
    time("full_pairs")(full.count())
    time("full_pairs2")(full.count())

    // HOF shuffle-free variant of the shingle index
    val sh2 = docs.select(col("doc_id").as("doc"),
      explode(array_distinct(Fns.shingles(col("text"), n))).as("s"))
    time("hof_index_count")(sh2.count())
    time("hof_index_count2")(sh2.count())
    println("index_equal=" +
      (sh.except(sh2).isEmpty && sh2.except(sh).isEmpty))
    spark.stop()
  }
}
