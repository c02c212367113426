package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.engine.GatherScatter

/**
 * Dump each catalog query's `.explain("formatted")` physical plan to
 * `<outDir>/<query>_<tag>.txt` — the before/after plan evidence for an
 * optimization round. Uses the same session confs as Bench's catalog phase
 * so Exchange counts / join strategies match what the bench executes.
 *
 * Iterative gates execute their driver loop while the DataFrame is being
 * CONSTRUCTED, so for those the dumped plan is the final (post-loop)
 * fragment; run at sf0.001 by default to keep that cheap.
 *
 * Usage: runMain graft.tools.PlanDump <outDir> <tag> [sfDir] [cores] [q1 q2 ...]
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.001")
    val cores = args.lift(3).map(_.toInt).getOrElse(8)
    val names =
      if (args.length > 4) args.drop(4).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted

    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    GatherScatter.engineConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))

    def sweep(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }

    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val body =
        try {
          val df = fn(spark, sfDir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable => s"PLAN FAILED: ${e.getMessage}" }
      val header = s"== $name ($tag, sf=$sfDir, cores=$cores) ==\n"
      Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), header + body)
      sweep()
      println(s"[plandump] $name -> $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
