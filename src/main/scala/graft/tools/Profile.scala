package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.Transcripts
import graft.algos.PageRank

/** Per-superstep timing + plan inspection at a given core count.
  * usage: runMain graft.tools.Profile <cores> <convs> [explain] */
object Profile {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    lazy val convs = args(1).toInt
    val doExplain = args.length > 2 && args(2) == "explain"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.serializer", sys.env.getOrElse("SPARK_GRAFT_SERIALIZER",
              "org.apache.spark.serializer.JavaSerializer"))
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled",
              sys.env.getOrElse("SPARK_GRAFT_COALESCE", "true"))
      .config("spark.sql.autoBroadcastJoinThreshold",
              sys.env.getOrElse("SPARK_GRAFT_BROADCAST", "10485760"))
      .config("spark.shuffle.compress",
              sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "true"))
      .config("spark.shuffle.spill.compress",
              sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var t = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"[profile] $tag: ${(System.nanoTime() - t) / 1e9}%.2f s")
      t = System.nanoTime()
    }
    val graph =
      if (args(1).startsWith("/")) graft.core.LinkGraph(spark.read.parquet(args(1)))
      else Transcripts.toGraph(Transcripts.synthesize(spark, convs))
    val e = graph.numEdges
    graph.edgesBySrc.count()
    lap(s"build+cache ($e edges)")

    if (doExplain) {
      import org.apache.spark.sql.functions._
      val deg = graft.algos.Degree.outDegrees(graph)
      val state = graph.vertices.join(deg, Seq("id"), "left_outer")
        .select(col("id"), lit(true).as("active"), lit(0.3).as("pagerank"),
                coalesce(col("degree"), lit(0L)).as("degree"))
        .repartition(graph.numPartitions, col("id")).localCheckpoint(true)
      val msgs = state.select(col("id"),
        when(col("degree") === 0, 0.0).otherwise(col("pagerank") / col("degree")).as("msg"))
      val routed = msgs.withColumnRenamed("id", "_send")
        .join(graph.edgesBySrc, col("_send") === col("src"))
        .withColumn("_recv", col("dst")).drop("src", "dst")
      val acc = routed.groupBy("_recv").agg(sum("msg").as("acc"))
      val joined = state.alias("s").join(acc.alias("a"),
        col("s.id") === col("a._recv"), "left_outer")
      joined.explain("formatted")
      lap("explain")
    }

    if (args.length > 2 && args(2) == "fast") {
      import graft.engine.GatherScatter
      if (sys.env.contains("SPARK_GRAFT_JOBLOG")) {
        import org.apache.spark.scheduler._
        spark.sparkContext.addSparkListener(new SparkListener {
          override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
            val tm = si.taskMetrics
            println(f"[stage] ${si.stageId}%4d ${si.name.take(40)}%-40s tasks=${si.numTasks}%3d wall=${wall}ms exec=${tm.executorRunTime}ms gc=${tm.jvmGCTime}ms serW=${tm.shuffleWriteMetrics.writeTime/1000000}ms")
          }
        })
      }
      val g = GatherScatter.build(graph,
        sys.env.getOrElse("SPARK_GRAFT_NPARTS", "0").toInt)
      lap("csr build")
      GatherScatter.pageRank(g, 0.3, 2).unpersist() // warm
      lap("warm 2 iters (fast)")
      val r = GatherScatter.pageRank(g, 0.3, 10)
      lap("10 supersteps (fast)")
      if (!sys.env.contains("SPARK_GRAFT_NOCHECK")) {
        // correctness vs the Column engine
        val sql = PageRank.run(graph, tol = -1.0, maxIterations = 10)
        lap("10 supersteps (sql engine)")
        val fastDF = GatherScatter.toDF(spark, r)
        val bad = sql.state.alias("a").join(fastDF.alias("b"), "id")
          .where("abs(a.pagerank - b.pagerank) > 1e-9").count()
        println(s"[profile] fast-vs-engine mismatches(>1e-9): $bad")
      }
      spark.stop(); return
    }

    if (args.length > 2 && args(2) == "min") {
      // (min,+) kernel walls: CC (dense-ish frontier) vs BFS/SSSP (sparse
      // frontier after superstep 1 — the partition-skip win shows here)
      import graft.engine.GatherScatter
      val und = graph.undirected
      val gu = GatherScatter.build(und, sys.env.getOrElse("SPARK_GRAFT_NPARTS", "0").toInt)
      lap("csr build (undirected)")
      val (cc0, _) = GatherScatter.connectedComponents(gu, maxIterations = 2)
      cc0.unpersist(false); lap("warm 2 supersteps (cc)")
      val (cc, ccIt) = GatherScatter.connectedComponents(gu)
      cc.unpersist(false); lap(s"cc fixpoint ($ccIt supersteps)")
      gu.unpersist(); und.unpersistAll()
      val gw = GatherScatter.build(graph,
        sys.env.getOrElse("SPARK_GRAFT_NPARTS", "0").toInt, weighted = true)
      lap("csr build (weighted, directed)")
      val src = graph.vertices.agg(org.apache.spark.sql.functions.min("id")).head.getLong(0)
      val (b0, _) = GatherScatter.bfs(gw, src, maxIterations = 2)
      b0.unpersist(false); lap("warm 2 supersteps (bfs)")
      val (bfsR, bfsIt) = GatherScatter.bfs(gw, src)
      bfsR.unpersist(false); lap(s"bfs fixpoint ($bfsIt supersteps)")
      val (ssspR, ssspIt) = GatherScatter.sssp(gw, src)
      ssspR.unpersist(false); lap(s"sssp fixpoint ($ssspIt supersteps)")
      gw.unpersist()
      spark.stop(); return
    }

    PageRank.run(graph, tol = -1.0, maxIterations = 2).state.unpersist() // warm
    lap("warm 2 iters")

    if (sys.env.contains("SPARK_GRAFT_JOBLOG")) {
      import org.apache.spark.scheduler._
      import java.util.concurrent.ConcurrentHashMap
      val taskMs = new ConcurrentHashMap[Int, (Long, Long, Long)]() // stage -> (n, sumMs, maxMs)
      val stageNames = new ConcurrentHashMap[Int, String]()
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
          val ms = te.taskInfo.duration
          val gc = if (te.taskMetrics != null) te.taskMetrics.jvmGCTime else 0L
          taskMs.merge(te.stageId, (1L, ms, gc),
            (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
        }
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val (n, sum, mx) = taskMs.getOrDefault(si.stageId, (0L, 0L, 0L))
          val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
          println(f"[stage] ${si.stageId}%4d ${si.name.take(45)}%-45s tasks=$n%3d wall=${wall}ms taskSum=${sum}ms gcSum=${mx}ms")
        }
      })
    }
    val res = PageRank.run(graph, tol = -1.0, maxIterations = 10)
    lap("10 supersteps")
    res.metrics.foreach(m => println(s"[profile] iter ${m.iteration}: ${m.millis} ms (changed=${m.changed})"))
    spark.stop()
  }
}
