package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

/** Skewed-graph CC evidence harness (SCALE.md): a power-law-shaped
  * adversarial fixture — ONE giant component built from a hub of degree
  * `spokes` (~√n for the default sizing) fanning out to `spokes` chains of
  * `chainLen` nodes each — run through the DISTRIBUTED min-label loop
  * (the edge count exceeds the union-find fast-path ceiling), reporting
  * rounds to convergence and per-round shuffle bytes.
  *
  * What it pins: (a) the hub does not blow up any round — the hub node
  * contributes degree-many rows to exactly one keyed aggregation, the
  * same shape as any other node; (b) pointer jumping converges in
  * O(log chainLen) rounds, not O(chainLen); (c) per-round shuffle bytes
  * are flat-to-shrinking across rounds (the frontier contracts), so
  * the loop's total traffic is rounds × O(|V|+|E|) with no quadratic
  * term anywhere.
  *
  * Usage: runMain graft.SkewCc [spokes] [chainLen]   (default 1500×1000
  * = 1.5M nodes, 1.5M edges, hub degree 1500 ≈ √n).
  */
object SkewCc {
  def main(args: Array[String]): Unit = {
    val spokes = args.headOption.map(_.toInt).getOrElse(1500)
    val chainLen = args.drop(1).headOption.map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sRead = new AtomicLong
    val sWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          sRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          sWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    // node 0 = hub; chain s occupies ids [s*chainLen+1, (s+1)*chainLen]
    val n = spokes.toLong * chainLen
    val hubEdges = spark.range(spokes)
      .select(lit(0L).as("src"), (col("id") * chainLen + 1).as("dst"))
    val chainEdges = spark.range(1L, n)
      .filter(col("id") % chainLen =!= 0)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val edges = hubEdges.unionByName(chainEdges)

    var lastR = 0L
    var lastW = 0L
    var rounds = 0
    val t0 = System.nanoTime()
    val labels = graft.operators.IdentityResolution.connectedComponents(
      edges, maxIter = 40,
      onRound = { i =>
        Thread.sleep(300) // drain in-flight stage events
        val (r, w) = (sRead.get, sWrite.get)
        println(s"""{"round":$i,"shuffle_read":${r - lastR},"shuffle_write":${w - lastW}}""")
        lastR = r; lastW = w
        rounds = i
      })
    val nComponents = labels.select("component").distinct().count()
    val wrong = labels.filter(col("component") =!= 0L).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"spokes":$spokes,"chain_len":$chainLen,"nodes":${n + 1},""" +
      s""""hub_degree":$spokes,"rounds":$rounds,"n_components":$nComponents,""" +
      f""""mislabeled":$wrong,"sec":$sec%.1f,""" +
      s""""shuffle_read_total":${sRead.get},"shuffle_write_total":${sWrite.get}}""")
    spark.stop()
  }
}
