package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Component-level profile of the shingle/jaccard path. */
object Prof2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime
      val n = f
      println(f"PROF $name ${(System.nanoTime - t0) / 1e9}%.2f s rows=$n")
    }
    val docs = Tables.t(spark, dir, "documents")
    time("docs_count")(docs.count())
    val sh = docs.select(col("doc_id").as("doc"),
      explode(array_distinct(Fns.shingles(col("text"), 3))).as("s"))
    time("shingle_explode_1")(sh.count())
    time("shingle_explode_2")(sh.count())
    val tok = docs.select(col("doc_id"), Fns.tokens(col("text")).as("t"))
    time("tokens_only")(tok.select(explode(col("t"))).count())
    val a = sh.select(col("doc").as("id_a"), col("s"))
    val b = sh.select(col("doc").as("id_b"), col("s"))
    val inter = a.join(b.hint("broadcast"), Seq("s")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    println(inter.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange")).mkString("\n"))
    time("inter_join")(inter.count())
    time("inter_join_2")(inter.count())
    spark.stop()
  }
}
