package graft.tools

import org.apache.spark.sql.SparkSession

import graft.engine.GatherScatter

/**
 * Time a subset of the catalog queries with Bench's exact per-query
 * semantics (same session confs, `.count()` materialization, cache sweep
 * between queries) — for before/after perf work without the ~30-min full
 * bench. Each query runs `reps` times; best and all reps print.
 *
 * Usage: runMain graft.tools.QueryTime [cores] [sfDir] [reps] q1 q2 ...
 *        (no query names = whole catalog)
 */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted

    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-querytime-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false")
    GatherScatter.engineConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def sweep(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }

    for (name <- names) {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'; known: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        sweep()
        (dt, n)
      }
      val best = walls.map(_._1).min
      println(f"[querytime] $name%-16s best=$best%7.3fs rows=${walls.head._2}%-8d reps=${walls.map(w => f"${w._1}%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
