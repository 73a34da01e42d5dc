package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling: where does ann_ivf_probe spend its time?
  * `Test/runMain graft.ProfIvf <sfDir>`
  */
object ProfIvf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    Tables.t(spark, dir, "region").groupBy("r_name").count().collect()

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime
      val r = f
      println(f"PROF $name ${(System.nanoTime - t0) / 1e9}%.2f s")
      r
    }

    val emb = Tables.t(spark, dir, "embeddings")
    val (assign, _) = time("ivfAssignments (3 collects)")(
      operators.Ann.ivfAssignments(emb, "vec_id", "embedding", 8))
    time("assignments.count")(assign.count())
    time("full ivfTopK")(
      operators.Ann.ivfTopK(emb, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", k = 5, nLists = 8, nprobe = 3).count())
    time("full ivfTopK again")(
      operators.Ann.ivfTopK(emb, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", k = 5, nLists = 8, nprobe = 3).count())
    spark.stop()
  }
}
