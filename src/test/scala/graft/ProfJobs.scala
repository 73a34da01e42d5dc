package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Dev-loop survey: one pass over every declared + bench query recording
  * wall seconds, Spark JOB count and STAGE count per query — the barrier
  * budget that dominates local-grain cost (each AQE exchange
  * materialization is its own job). Output JSON to
  * SPARK_GRAFT_PROFJOBS_OUT (default /tmp/profjobs.json).
  * Not a test — run with `Test/runMain graft.ProfJobs [sfDir] [names...]`.
  */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val only = args.drop(1).toSet
    val out = sys.env.getOrElse("SPARK_GRAFT_PROFJOBS_OUT", "/tmp/profjobs.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    })
    // same warmup as Bench
    Tables.t(spark, dir, "region").groupBy("r_name").count().collect()
    val all = SparkEntry.queries ++ SparkEntry.benchQueries
    val sel = (if (only.nonEmpty) all.view.filterKeys(only).toMap else all).toSeq.sortBy(_._1)
    // warm bench-only fixtures untimed, like Bench
    sel.collect { case (n, f) if SparkEntry.benchQueries.contains(n) =>
      try f(spark, dir).count() catch { case _: Throwable => () }
    }
    val rows = sel.map { case (name, fn) =>
      Thread.sleep(80) // let queued listener events drain
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      val err = try { fn(spark, dir).count(); "" }
        catch { case e: Throwable => e.getClass.getSimpleName }
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(80) // let queued listener events drain
      (name, secs, jobs.get, stages.get, tasks.get, err)
    }
    val json = rows.map { case (n, s, j, st, tk, e) =>
      f"""{"q":"$n","secs":$s%.3f,"jobs":$j,"stages":$st,"tasks":$tk,"err":"$e"}"""
    }.mkString("[\n", ",\n", "\n]")
    Files.write(Paths.get(out), json.getBytes(StandardCharsets.UTF_8))
    println(s"PROFJOBS wrote ${rows.size} rows to $out; " +
      f"total=${rows.map(_._2).sum}%.1f s, jobs=${rows.map(_._3).sum}")
    spark.stop()
  }
}
