package graft.tools

import org.apache.spark.sql.SparkSession

import graft.engine.GatherScatter

/**
 * The north rule's literal deploy path: "run via spark-submit on a
 * multi-executor cluster at two cluster sizes (N and 4N executors)".
 *
 * This main is spark-submit's entry point — it does NOT set a master; the
 * cluster comes from `--master spark://...` against a REAL standalone
 * master + worker daemons (`scripts/standalone_scaling.sh` starts 4
 * single-core workers, then submits this class at --total-executor-cores 1
 * and 4 — N=1 and 4N=4 genuinely scheduled executor JVMs). One leg = load
 * the prebuilt CSR snapshot (GatherScatter.save/load), warm, then timed
 * best-of-k PageRank superstep reps; prints ONE JSON line the script folds
 * into standalone_scaling.json.
 *
 * Engine confs (Kryo, shuffle compression off, reduce-locality off,
 * pre-touched executor heaps) are set here, before the context is created,
 * so a bare spark-submit needs only the cluster-shape flags.
 *
 * Usage (via spark-submit):
 *   spark-submit --master spark://HOST:7077 --total-executor-cores N \
 *     --executor-cores 1 --executor-memory 6g --class graft.tools.SubmitScaling \
 *     graphmatspark.jar <snapshotPath> <expectExecs> [iters] [reps]
 */
object SubmitScaling {

  /** (total ticks, steal ticks) from /proc/stat — host-noise telemetry. */
  private def cpuTicks(): (Long, Long) =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        (f.sum, if (f.length > 7) f(7) else 0L)
      } finally src.close()
    } catch { case _: Exception => (0L, 0L) }

  def main(args: Array[String]): Unit = {
    val snapPath = args(0)
    val expectExecs = args(1).toInt
    val iters = args.lift(2).map(_.toInt).getOrElse(10)
    val reps = args.lift(3).map(_.toInt).getOrElse(2)
    val execMemMb = sys.env.getOrElse("GRAFT_EXEC_MEM_MB", "6144").toInt

    val b = SparkSession.builder()
      .appName(s"graft-submit-scaling-$expectExecs")
      .config("spark.executor.extraJavaOptions",
        s"-Xms${execMemMb}m -XX:+AlwaysPreTouch")
      .config("spark.sql.shuffle.partitions", math.max(expectExecs, 4))
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false")
    GatherScatter.engineConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val got = ClusterProbe.awaitExecutors(spark, expectExecs)
    require(got >= expectExecs,
      s"only $got of $expectExecs executors registered — cluster misconfigured")

    val g = GatherScatter.load(spark, snapPath)
    GatherScatter.pageRank(g, 0.3, 2).unpersist(false) // JIT + cache warm
    val (t0, s0) = cpuTicks()
    val walls = (1 to reps).map { _ =>
      val w0 = System.nanoTime()
      GatherScatter.pageRank(g, 0.3, iters).unpersist(false)
      (System.nanoTime() - w0) / 1e9
    }
    val (t1, s1) = cpuTicks()
    val steal = if (t1 > t0) 100.0 * (s1 - s0) / (t1 - t0) else -1.0
    val best = walls.min
    g.unpersist()
    println(
      f"""SUBMITLEG{"executors":$expectExecs,"edges":${g.numEdges},"supersteps":$iters,""" +
      f""""reps":${walls.map(w => f"$w%.3f").mkString("[", ",", "]")},"best":$best%.3f,""" +
      f""""edges_per_sec":${g.numEdges.toDouble * iters / best}%.0f,"steal_pct":$steal%.3f}""")
    spark.stop()
  }
}
