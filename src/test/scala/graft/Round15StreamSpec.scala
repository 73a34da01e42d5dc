package graft

import org.apache.spark.sql.functions._

/** Round-15 specs for the exactly-once foreachBatch append protocol
  * (ADVICE r14: foreachBatch is at-least-once; a replayed micro-batch
  * must not duplicate edges/corpus rows): deterministic batch-prefixed
  * file names, replay-erase, staging + rename.
  */
class Round15StreamSpec extends SparkSpec {
  test("idempotentAppend: exactly-once per batchId, flat and partitioned layouts") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_idem")
    val target = s"$root/target"
    val df = (0L until 100L).toDF("src").withColumn("dst", col("src") + 1)
    df.write.parquet(target) // pre-existing standing files
    val add = (100L until 120L).toDF("src").withColumn("dst", col("src") + 1)
    graft.streaming.StreamingAnn.idempotentAppend(add, target, 0L, "edges")
    val n1 = spark.read.parquet(target).count()
    assert(n1 === 120L, s"after append: $n1")
    // replay: same batch id — must be a no-op-equivalent
    graft.streaming.StreamingAnn.cleanupBatchFiles(spark, target, 0L, "edges")
    graft.streaming.StreamingAnn.idempotentAppend(add, target, 0L, "edges")
    val n2 = spark.read.parquet(target).count()
    assert(n2 === 120L, s"after replay: $n2")
    // partitioned layout
    val target2 = s"$root/t2"
    val pdf = (0L until 40L).toDF("src")
      .withColumn("dst", col("src") + 1)
      .withColumn("layer", col("src") % 2)
    pdf.write.partitionBy("layer").parquet(target2)
    graft.streaming.StreamingAnn.idempotentAppend(
      (40L until 60L).toDF("src").withColumn("dst", col("src") + 1)
        .withColumn("layer", col("src") % 2),
      target2, 1L, "edges", partitionCols = Seq("layer"))
    val n3 = spark.read.parquet(target2).count()
    assert(n3 === 60L, s"partitioned after append: $n3")
  }
}
