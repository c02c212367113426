package graft.tools

import org.apache.spark.sql.SparkSession

import graft.algos.PageRank
import graft.core.LinkGraph
import graft.engine.Superstep

/**
 * Column-engine superstep microbench: PageRank fixed-iteration runs at each
 * requested chainDepth on one session, printing per-config walls. Used to
 * pick the Superstep chaining default with data instead of theory.
 *
 * Usage: runMain graft.tools.SqlProbe [cores] [edgeParquet] [iters] [k1,k2,...]
 */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val path = args.lift(1).getOrElse("/tmp/graft-bench-edges.parquet")
    val iters = args.lift(2).map(_.toInt).getOrElse(5)
    val chains = args.lift(3).getOrElse("1,2,4").split(",").map(_.toInt)
    val reps = args.lift(4).map(_.toInt).getOrElse(3)

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-sql-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_SMJ", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val graph = LinkGraph(spark.read.parquet(path))
    val edges = graph.numEdges
    graph.edgesBySrc.count()

    for (k <- chains) {
      val spec = PageRank.spec(0.3, -1.0, iters).copy(chainDepth = k)
      def once(): Double = {
        val deg = graft.algos.Degree.outDegrees(graph)
        val init = graph.vertices.join(deg, Seq("id"), "left_outer")
          .select(org.apache.spark.sql.functions.col("id"),
            org.apache.spark.sql.functions.lit(true).as("active"),
            org.apache.spark.sql.functions.lit(0.3).as("pagerank"),
            org.apache.spark.sql.functions.coalesce(
              org.apache.spark.sql.functions.col("degree"),
              org.apache.spark.sql.functions.lit(0L)).as("degree"))
        val t0 = System.nanoTime()
        val res = Superstep.run(graph, init, spec)
        val dt = (System.nanoTime() - t0) / 1e9
        res.state.unpersist()
        dt
      }
      once() // warm
      val best = (1 to reps).map(_ => once()).min
      println(f"[sqlprobe] chainDepth=$k iters=$iters sec=$best%.3f eps=${edges.toDouble * iters / best}%.0f")
    }
    // tracked mode (until-convergence machinery, chain pinned to 1)
    def tracked(): Double = {
      val t0 = System.nanoTime()
      val res = PageRank.run(graph, tol = 1e-5, maxIterations = iters)
      val dt = (System.nanoTime() - t0) / 1e9
      res.state.unpersist()
      dt
    }
    tracked()
    val bestT = (1 to reps).map(_ => tracked()).min
    println(f"[sqlprobe] tracked maxIters=$iters sec=$bestT%.3f eps=${edges.toDouble * iters / bestT}%.0f")
    graph.unpersistAll()
    spark.stop()
  }
}
