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
    val s = SparkSession.builder()
      .master(s"local-cluster[$execs,$cores,$memMb]")
      .appName(s"graft-cluster-$execs-$cores")
      .config("spark.executor.memory", s"${memMb}m")
      .config("spark.executor.extraClassPath", graftClasspath)
      .config("spark.sql.shuffle.partitions", execs * cores)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val execs = args.headOption.map(_.toInt).getOrElse(2)
    val cores = args.lift(1).map(_.toInt).getOrElse(2)
    val memMb = args.lift(2).map(_.toInt).getOrElse(2048)
    val convs = args.lift(3).map(_.toInt).getOrElse(20000)

    val spark = clusterSession(execs, cores, memMb)
    val sc = spark.sparkContext
    // wait for executors to register (driver is one entry in the map)
    val deadline = System.currentTimeMillis() + 60000
    while (sc.getExecutorMemoryStatus.size < execs + 1 &&
           System.currentTimeMillis() < deadline) Thread.sleep(200)
    val nExec = sc.getExecutorMemoryStatus.size - 1
    println(s"[probe] executors registered: $nExec (want $execs)")

    val edges = Transcripts.edges(Transcripts.vertices(Transcripts.synthesize(spark, convs)))
    val g = GatherScatter.build(LinkGraph(edges), numPartitions = execs * cores * 2)
    val t0 = System.nanoTime()
    val ranks = GatherScatter.pageRank(g, 0.3, 5)
    val sum = ranks.map(_.pr.sum).sum()
    val nv = ranks.map(_.ids.length.toLong).sum()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[probe] edges=${g.numEdges} verts=$nv prSum=$sum%.6f sec=$dt%.2f eps=${g.numEdges * 5 / dt}%.0f")
    ranks.unpersist(false)
    g.unpersist()
    spark.stop()
    println("[probe] OK")
  }
}
