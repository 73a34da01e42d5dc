package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev profiler: stage volumes of containmentPairs at an SF dir (arg 0). */
object ProfContain {
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
    val thresholdPpm = 900000L
    val sh = Dedup.shingleIndex(docs, "doc_id", "text", 3)
    val cnt = sh.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    val freq = sh.groupBy("s").agg(count(lit(1)).as("f"))
    val ranked = sh.join(freq, "s")
      .withColumn("rn", row_number().over(Window.partitionBy("doc").orderBy("f", "s")))
    val prefix = ranked.join(cnt, "doc")
      .filter(col("rn") <=
        col("n_sh") - expr(s"(n_sh * ${thresholdPpm}L + 999999L) div 1000000L") + 1)
      .select(col("doc").as("id_a"), col("s"))
    time("prefix")(println("  rows: " + prefix.count()))
    val raw = prefix.join(sh.select(col("doc").as("id_b"), col("s")), Seq("s"))
      .filter(col("id_a") =!= col("id_b"))
    time("raw matches")(println("  rows: " + raw.count()))
    val cand = raw.select("id_a", "id_b").distinct()
    time("cand")(println("  pairs: " + cand.count()))
    time("full op")(println("  out: " + Dedup.containmentPairs(
      docs, "doc_id", "text", 3, thresholdPpm).count()))
    time("full op rep2")(println("  out: " + Dedup.containmentPairs(
      docs, "doc_id", "text", 3, thresholdPpm).count()))
    spark.stop()
  }
}
