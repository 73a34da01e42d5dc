package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Ad-hoc profiler: decompose the ann_graph_search oracle row (sf0.1)
  * into build vs walk cost, and A/B the merged-round-1 walk against the
  * pre-scored-entries (old round-structure) walk. PROF-gated.
  */
class ProfGraph2 extends SparkSpec {
  test("graph oracle row decomposition at sf0.1") {
    assume(sys.env.contains("SPARK_GRAFT_PROF"))
    val dir = "/root/testdata/sf0.1"
    val emb = Tables.t(spark, dir, "embeddings")
    def time[A](label: String, n: Int)(f: => A): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF2 $label reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("build_nndescent_k4i2", 3) {
      Ann.serveGraph(Ann.nnDescent(emb, "vec_id", "embedding", 4, 2)).count()
    }
    val graph = Ann.serveGraph(Ann.nnDescent(emb, "vec_id", "embedding", 4, 2))
      .localCheckpoint()
    val q = emb.filter(col("vec_id") < 8)
    time("walk_merged_h3", 5) {
      Ann.graphSearch(graph, emb, q, "vec_id", "embedding", Seq(0L),
        16, 3, 5).count()
    }
    time("walk_merged_h2x2", 5) {
      Ann.graphSearch(graph, emb, q, "vec_id", "embedding", Seq(0L),
        16, 2, 5, expandHops = 2).count()
    }
    // pre-scored entries (the old structure's beam_0): the walk then pays
    // hops full rounds, like the pre-r14 shape (plus my scoring prep)
    val pre = q.select(col("vec_id").as("query_id"))
      .withColumn("nid", lit(0L))
      .join(emb.select(col("vec_id").as("nid"),
        col("embedding").as("cv")), "nid")
      .join(q.select(col("vec_id").as("query_id"),
        col("embedding").as("qv")), "query_id")
      .select(col("query_id"), col("nid"),
        graft.functions.Fns.cosineSim(col("qv"), col("cv")).as("cos"))
      .localCheckpoint()
    time("walk_prescored_h3", 5) {
      Ann.graphSearchFrom(graph, emb, q, "vec_id", "embedding", pre,
        16, 3, 5).count()
    }
    time("full_row_search", 3) {
      SparkEntry.queries("ann_graph_search")(spark, dir).count()
    }
    time("full_row_deep", 3) {
      SparkEntry.queries("ann_graph_search_deep")(spark, dir).count()
    }
  }
}
