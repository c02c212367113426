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
 * (own heaps, real Netty shuffle/broadcast), the closest in-sandbox analog of
 * a multi-executor standalone cluster:
 *  - "scaling": 1 executor x 4 cores vs 4 executors x 4 cores, same
 *    32.5M-edge graph, same 16 partitions.
 *  - "scaling_8_32": 2x4 vs 8x4 executors (8 vs 32 cores) on the headline
 *    graph — the round-2 thread-mode diagnostic re-measured under executor
 *    isolation.
 *  - "isolation_tax": 1x8 vs 4x2 — SAME total cores, same input, same
 *    partitions; only the number of JVM boundaries the per-superstep
 *    exchange crosses differs. On one physical machine every extra executor
 *    adds remote-shuffle CPU without adding DRAM bandwidth or a NIC, so this
 *    pair isolates the per-boundary cost that a real multi-NODE cluster
 *    amortizes with added hardware. Full analysis in BASELINE.md "Scaling".
 *
 * Every leg builds fresh, measures best-of-k back-to-back repetitions (this
 * sandbox VM shows multi-x wall-clock noise; the minimum is the least-
 * contended estimate), and unpersists everything before returning. Shuffle
 * compression is off: the exchange ships packed high-entropy Array[Double],
 * where lz4 costs CPU for no size win (measured ~2x shuffle-write time).
 */
object Bench {

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
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

  /** One local-cluster leg: fresh executor JVMs, fastBench, teardown. */
  private def clusterLeg(execs: Int, cores: Int, memMb: Int, edgePath: String,
                         nParts: Int, iters: Int, reps: Int,
                         keyShift: Int = 0): (Long, Int, Double, Double) = {
    val s = ClusterProbe.clusterSession(execs, cores, memMb)
    try {
      ClusterProbe.awaitExecutors(s, execs)
      fastBench(s, edgePath, iters, warmIters = 2, reps = reps,
        numPartitions = nParts, keyShift = keyShift)
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
    val scaleConvs = sys.env.getOrElse("SPARK_GRAFT_SCALE_CONVS", "5000000").toInt

    // synthesize the deterministic transcript graphs ONCE; all legs then
    // time supersteps, not ETL
    val tmp = java.nio.file.Files.createTempDirectory("graft-bench").toString
    val edgePath = s"$tmp/edges.parquet"
    val scalePath = s"$tmp/edges-scale.parquet"
    val gen = session(cpus)
    Transcripts.edges(Transcripts.vertices(Transcripts.synthesize(gen, convs)))
      .write.mode("overwrite").parquet(edgePath)
    Transcripts.edges(Transcripts.vertices(Transcripts.synthesize(gen, scaleConvs)))
      .write.mode("overwrite").parquet(scalePath)
    gen.stop()

    // ---- N -> 4N EXECUTORS (the north rule's pair), real executor JVMs ----
    // (a) deployment partitioning: conversation-co-located (keyShift=20) —
    //     intra-conversation edges never cross an executor
    val (eC, itC, secC1, epsC1) = clusterLeg(1, 4, 6144, scalePath, nParts = 16, iters = 10, reps = 3, keyShift = 20)
    val (_, _, secC4, epsC4) = clusterLeg(4, 4, 6144, scalePath, nParts = 16, iters = 10, reps = 3, keyShift = 20)
    val effC = (secC1 / secC4) / 4.0
    // (b) adversarial partitioning: pure vertex hash — every edge's gather
    //     target is a uniformly random partition (worst-case cut)
    val (eS, itS, sec1, eps1) = clusterLeg(1, 4, 6144, scalePath, nParts = 16, iters = 5, reps = 3)
    val (_, _, sec4, eps4) = clusterLeg(4, 4, 6144, scalePath, nParts = 16, iters = 5, reps = 3)
    val eff14 = (sec1 / sec4) / 4.0
    // ---- isolation tax: same 8 cores, 1 JVM vs 4 JVMs ----
    val (_, _, secJvm1, epsJvm1) = clusterLeg(1, 8, 6144, scalePath, nParts = 16, iters = 5, reps = 3)
    val (_, _, secJvm4, epsJvm4) = clusterLeg(4, 2, 6144, scalePath, nParts = 16, iters = 5, reps = 3)
    // ---- 8 -> 32 cores as executors (round-2 diagnostic, isolated) ----
    val (e8, it8, sec8, eps8) = clusterLeg(2, 4, 3072, edgePath, nParts = 32, iters = 10, reps = 2)
    val (e32c, _, sec32c, eps32c) = clusterLeg(8, 4, 3072, edgePath, nParts = 32, iters = 10, reps = 2)
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
    val scaling = f"""{"mode":"local-cluster","executors_small":1,"executors_large":4,"cores_per_executor":4,""" +
      f""""partitioning":"conversation-colocated (keyShift=20)",""" +
      f""""supersteps":$itC,"sec_small":$secC1%.3f,"sec_large":$secC4%.3f,""" +
      f""""edges_per_sec_small":$epsC1%.0f,"edges_per_sec_large":$epsC4%.0f,"efficiency":$effC%.3f,""" +
      f""""edges":$eC,"note":"1 vs 4 executor JVMs (4 cores, 6g each), 32.5M-edge transcript graph, fixed 16 partitions; transcript edges are intra-conversation so co-location makes the superstep exchange partition-local - the partitioning a production deployment would use (BASELINE.md Scaling)"}"""
    val scalingHash = f"""{"mode":"local-cluster","executors_small":1,"executors_large":4,"cores_per_executor":4,""" +
      f""""partitioning":"pure vertex hash (worst-case cut)",""" +
      f""""supersteps":$itS,"sec_small":$sec1%.3f,"sec_large":$sec4%.3f,""" +
      f""""edges_per_sec_small":$eps1%.0f,"edges_per_sec_large":$eps4%.0f,"efficiency":$eff14%.3f,""" +
      f""""edges":$eS,"note":"same pair with every edge crossing partitions; on ONE physical machine extra executors add remote-shuffle CPU but no DRAM/NIC, so this lower-bounds real-cluster behavior - see isolation_tax and BASELINE.md Scaling"}"""
    val scaling832 = f"""{"mode":"local-cluster","executors_small":2,"executors_large":8,"cores_per_executor":4,""" +
      f""""supersteps":$it8,"sec_small":$sec8%.3f,"sec_large":$sec32c%.3f,""" +
      f""""edges_per_sec_small":$eps8%.0f,"edges_per_sec_large":$eps32c%.0f,"efficiency":$eff832%.3f,"edges":$e8,""" +
      """"note":"8 vs 32 cores as separate executor JVMs on the headline graph; replaces the round-2 single-JVM thread diagnostic"}"""
    val isoTax = f"""{"cores_total":8,"same_input":true,"same_partitions":16,""" +
      f""""jvms_1_sec":$secJvm1%.3f,"jvms_4_sec":$secJvm4%.3f,""" +
      f""""jvms_1_edges_per_sec":$epsJvm1%.0f,"jvms_4_edges_per_sec":$epsJvm4%.0f,""" +
      f""""tax":${secJvm4 / secJvm1}%.2f,""" +
      """"note":"identical work, only JVM-boundary count differs: the per-superstep exchange pays Spark's remote-shuffle path per boundary; a real multi-node cluster adds DRAM+NIC per executor, this machine cannot"}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"query_errors":$qErrs,"caches_swept":$swept,"cache_leaks_after_sweep":$leaks,"sf":"$sfDir","pagerank":$pr,"pagerank_sql":$prSql,"scaling":$scaling,"scaling_hash":$scalingHash,"scaling_8_32":$scaling832,"isolation_tax":$isoTax}""")
    s4N.stop()
  }
}
