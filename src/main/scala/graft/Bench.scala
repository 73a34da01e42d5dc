package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — runs the declared queries in ONE session (the driver's
  * harness shape) and prints a single JSON line.
  *
  * Queries run in SORTED-NAME order so per-query times are comparable
  * across rounds (a Map's iteration order reshuffles whenever a key is
  * added, which makes session-position effects look like plan regressions).
  * Failures are REPORTED per query (name → "err:<class>") and the query
  * contributes its elapsed time — a broken query must never register as a
  * fast success.
  *
  * Optional CLI args restrict the run to the named queries (dev loop).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT, codegen compiler, parquet reader, and the
    // shuffle/window/join/decimal-agg code paths. Without it the
    // alphabetically-first queries absorb seconds of one-time JVM cost and
    // read as false per-query regressions.
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      for (_ <- 0 until 2) {
        Tables.t(spark, sfDir, "region").groupBy("r_name").count().collect()
        val w = spark.range(100000).selectExpr("id % 97 k", "id v", "CAST(id AS DOUBLE) x")
        w.groupBy("k").agg(sum(col("v")), sum(col("x").cast("decimal(18,4)")))
          .orderBy("k").collect()
        w.withColumn("rn", row_number().over(
            Window.partitionBy("k").orderBy(col("v").desc)))
          .filter(col("rn") <= 3).count()
        w.join(w.groupBy("k").count(), "k").count()
        w.select(split(trim(lower(concat_ws(" ", col("k"), col("v")))), "\\s+")).count()
      }
    }
    val selected =
      if (args.nonEmpty) SparkEntry.queries.view.filterKeys(args.toSet).toMap
      else SparkEntry.queries
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(e.getClass.getSimpleName) }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    // Millisecond precision keeps the one-line JSON short enough for the
    // driver's bounded tail capture (r3's 9-decimal floats overflowed it
    // and the driver recorded parsed:null).
    def fmt(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"errors":$errs,"order":"sorted","sf":"$sfDir"}""")
    spark.stop()
  }
}
