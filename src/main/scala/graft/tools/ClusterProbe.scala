package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.{LinkGraph, Transcripts}
import graft.engine.GatherScatter

/**
 * Probe: run the gather-scatter engine under `local-cluster[n,c,m]` — REAL
 * separate executor JVMs (own heaps, real Netty shuffle/broadcast), the
 * in-sandbox stand-in for a multi-executor standalone cluster. Verifies the
 * whole engine survives genuine executor isolation (closure serialization,
 * broadcast transport, cached-block remote fetch) and that results match
 * plain local mode bit-for-bit.
 *
 * Usage: runMain graft.tools.ClusterProbe [nExecutors] [coresPerExec] [memMb] [convs]
 */
object ClusterProbe {

  /** Classpath entry holding the graft classes, for executor JVMs. */
  def graftClasspath: String =
    getClass.getProtectionDomain.getCodeSource.getLocation.getPath

  def clusterSession(execs: Int, cores: Int, memMb: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = SparkSession.builder()
      .master(s"local-cluster[$execs,$cores,$memMb]")
      .appName(s"graft-cluster-$execs-$cores")
      .config("spark.executor.memory", s"${memMb}m")
      // executors must pre-commit their heap like the driver does
      // (build.sbt): an executor that grows its heap from the default -Xms
      // page-faults through the first minutes of superstep work — measured
      // as reps improving monotonically 39s -> 16s on the 4x1 scaling leg
      .config("spark.executor.extraJavaOptions",
        s"-Xms${memMb}m -XX:+AlwaysPreTouch")
      .config("spark.executor.extraClassPath", graftClasspath)
      .config("spark.sql.shuffle.partitions", execs * cores)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false")
    GatherScatter.engineConfs.foreach { case (k, v) => b.config(k, v) }
    // ad-hoc experiment knobs: SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    })
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Block until `execs` executors register (driver is one map entry). */
  def awaitExecutors(spark: SparkSession, execs: Int, timeoutMs: Long = 90000): Int = {
    val sc = spark.sparkContext
    val deadline = System.currentTimeMillis() + timeoutMs
    while (sc.getExecutorMemoryStatus.size < execs + 1 &&
           System.currentTimeMillis() < deadline) Thread.sleep(200)
    sc.getExecutorMemoryStatus.size - 1
  }

  def main(args: Array[String]): Unit = {
    val execs = args.headOption.map(_.toInt).getOrElse(2)
    val cores = args.lift(1).map(_.toInt).getOrElse(2)
    val memMb = args.lift(2).map(_.toInt).getOrElse(2048)
    val input = args.lift(3).getOrElse("20000") // conv count or edge-parquet path
    val nParts = args.lift(4).map(_.toInt).getOrElse(execs * cores * 2)
    val iters = args.lift(5).map(_.toInt).getOrElse(5)
    val reps = args.lift(6).map(_.toInt).getOrElse(1)
    val keyShift = args.lift(7).map(_.toInt).getOrElse(0)

    val spark = clusterSession(execs, cores, memMb)
    val nExec = awaitExecutors(spark, execs)
    println(s"[probe] executors registered: $nExec (want $execs)")
    if (sys.env.contains("SPARK_GRAFT_JOBLOG")) {
      import org.apache.spark.scheduler._
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
          val tm = si.taskMetrics
          val sr = tm.shuffleReadMetrics
          println(f"[stage] ${si.stageId}%4d ${si.name.take(36)}%-36s tasks=${si.numTasks}%3d wall=${wall}ms exec=${tm.executorRunTime}ms gc=${tm.jvmGCTime}ms deser=${tm.executorDeserializeTime}ms fetchWait=${sr.fetchWaitTime}ms remoteMB=${sr.remoteBytesRead / 1000000} serW=${tm.shuffleWriteMetrics.writeTime / 1000000}ms res=${tm.resultSerializationTime}ms")
        }
      })
    }

    val g =
      if (input.startsWith("snap:")) GatherScatter.load(spark, input.stripPrefix("snap:"))
      else {
        val edges =
          if (input.forall(_.isDigit))
            Transcripts.edges(Transcripts.vertices(Transcripts.synthesize(spark, input.toInt)))
          else spark.read.parquet(input)
        GatherScatter.build(LinkGraph(edges), numPartitions = nParts,
          keyShift = keyShift)
      }
    GatherScatter.pageRank(g, 0.3, 2).unpersist(false) // JIT warm
    var best = Double.MaxValue
    var sum = 0.0; var nv = 0L
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val ranks = GatherScatter.pageRank(g, 0.3, iters)
      val dt = (System.nanoTime() - t0) / 1e9
      sum = ranks.map(_.pr.sum).sum()
      nv = ranks.map(_.ids.length.toLong).sum().toLong
      ranks.unpersist(false)
      println(f"[probe] rep $r: $dt%.3f s")
      if (dt < best) best = dt
    }
    println(f"[probe] edges=${g.numEdges} verts=$nv prSum=$sum%.6f sec=$best%.3f eps=${g.numEdges.toDouble * iters / best}%.0f parts=$nParts")
    g.unpersist()
    spark.stop()
    println("[probe] OK")
  }
}
