package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** Dev-loop profiler: hot-bucket band-join skew numbers for SCALE.md.
  * Run with `Test/runMain graft.ProfSkew`.
  */
object ProfSkew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) sWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    val boiler = "the quick brown fox jumps over a lazy dog while the " +
      "bright sun sets behind tall green hills and children play near the " +
      "quiet river bank for hours watching small boats drift slowly past docks"
    def corpus(b: Int) = {
      val hot = (0 until b).map(i => (i.toLong, boiler))
      val bg = (0 until 200).map(i => (100000L + i,
        s"unique background document number $i about topic t$i with words " +
          s"w${i * 3} w${i * 3 + 1} w${i * 3 + 2} only it contains"))
      (hot ++ bg).toDF("doc_id", "text")
    }
    for ((b, cap) <- Seq((250, Int.MaxValue), (500, Int.MaxValue),
        (1000, Int.MaxValue), (2000, Int.MaxValue), (1000, 64), (2000, 64))) {
      Thread.sleep(1500)
      val w0 = sWrite.get
      val t0 = System.nanoTime()
      val n = Dedup.minhashLshPairs(corpus(b), "doc_id", "text",
        n = 3, numHashes = 8, bandSize = 2, threshold = 0.8,
        hotBucketCap = cap).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      val capS = if (cap == Int.MaxValue) "inf" else cap.toString
      println(f"PROF B=$b%5d cap=$capS%4s pairs=$n%9d shuffle_write=${sWrite.get - w0}%12d sec=$sec%.2f")
    }
    spark.stop()
  }
}
