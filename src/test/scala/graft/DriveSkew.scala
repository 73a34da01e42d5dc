package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev drive: salted join vs direct join on real event data. */
object DriveSkew {
  def main(args: Array[String]): Unit = {
    val spark = Tables.tune(SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val ev = Tables.t(spark, dir, "events")
    val dim = ev.groupBy("user_id").count().withColumnRenamed("count", "user_events")
    val direct = ev.join(dim, "user_id")
    val salted = graft.operators.SkewJoin.saltedJoin(ev, dim, "user_id", salts = 8)
    println(s"DIRECT=${direct.count()} SALTED=${salted.count()} " +
      s"DIFF=${salted.select("event_id","user_events").exceptAll(direct.select("event_id","user_events")).count()}")
    spark.stop()
  }
}
