package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

/** Shuffle-volume evidence harness (SCALE.md): runs named queries once and
  * reports the MEASURED bytes — task input, shuffle read, shuffle write —
  * accumulated across every stage of every job the query runs (a stage
  * listener, not executed-plan metrics, so iterative operators' per-round
  * jobs are all counted). The linearity claim in SCALE.md ("shuffle grows
  * ~linearly sf0.1 → sf1") is made in these bytes, not in seconds, which
  * ambient contention can't touch.
  *
  * Usage: runMain graft.ShuffleBytes <sfDir> <query> [query ...]
  * One JSON line per query on stdout.
  */
object ShuffleBytes {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val input = new AtomicLong
    val sRead = new AtomicLong
    val sWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          input.addAndGet(m.inputMetrics.bytesRead)
          sRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          sWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    val all = SparkEntry.queries ++ SparkEntry.benchQueries
    names.foreach { name =>
      val fn = all.getOrElse(name,
        sys.error(s"unknown query $name"))
      // settle the async listener bus, then snapshot-before/after
      Thread.sleep(1500)
      val (i0, r0, w0) = (input.get, sRead.get, sWrite.get)
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // drain in-flight stage-completed events
      println(f"""{"query":"$name","sf":"$sfDir","rows":$rows,"sec":$sec%.2f,""" +
        s""""input_bytes":${input.get - i0},"shuffle_read":${sRead.get - r0},""" +
        s""""shuffle_write":${sWrite.get - w0}}""")
    }
    spark.stop()
  }
}
