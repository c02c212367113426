package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.EdgeOps
import graft.sources.TextEdgeList

/**
 * The reference's `graph_converter` CLI (`src/graph_converter.cpp:105-222`)
 * as one linear DataFrame pipeline: load → [random weights] → shuffle →
 * remove self-loops → [bidirectional] → [upper-triangular] → dedup →
 * [randomize ids] → write. Same flags, seeded where the reference used
 * unseeded rand().
 *
 * usage: runMain graft.tools.GraphConverter <in> <out>
 *   [--selfloops] [--duplicatededges] [--bidirectional] [--uppertriangular]
 *   [--randomweights <max>] [--randomizeids] [--inputformat text|parquet]
 *   [--outputformat text|parquet] [--seed <n>]
 */
object GraphConverter {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GraphConverter <in> <out> [flags]")
    val in = args(0); val out = args(1)
    val flags = args.drop(2)
    def has(f: String) = flags.contains(f)
    def opt(f: String): Option[String] = {
      val i = flags.indexOf(f); if (i >= 0 && i + 1 < flags.length) Some(flags(i + 1)) else None
    }
    val seed = opt("--seed").map(_.toLong).getOrElse(5L) // reference srand(5), `edgelist.h:348`

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-graph-converter")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var e = opt("--inputformat").getOrElse("text") match {
      case "parquet" => spark.read.parquet(in)
      case "binary"  => graft.sources.MtxReader.read(spark, in,
        header = !has("--noheader"), intWeights = !has("--floatweights"))
      case _         => TextEdgeList.read(spark, in)
    }
    opt("--randomweights").foreach(r => e = EdgeOps.randomWeights(e, r.toInt, seed))
    e = EdgeOps.shuffleBySrc(e, 8)
    if (!has("--selfloops")) e = EdgeOps.removeSelfEdges(e)
    if (has("--bidirectional")) e = EdgeOps.bidirectional(e)
    if (has("--uppertriangular")) e = EdgeOps.toDag(e)
    if (!has("--duplicatededges")) e = EdgeOps.dedupEdges(e)
    if (has("--randomizeids")) e = EdgeOps.permuteIds(e, seed)

    val ofmt = opt("--outputformat").getOrElse("text")
    ofmt match {
      case "parquet" => e.write.mode("overwrite").parquet(out)
      case "binary"  => graft.sources.MtxReader.write(e, out,
        header = !has("--noheader"), intWeights = !has("--floatweights"))
      case _         => TextEdgeList.write(e, out)
    }
    val written = ofmt match {
      case "parquet" => spark.read.parquet(out).count()
      case "binary"  => graft.sources.MtxReader.read(spark, out,
        header = !has("--noheader"), intWeights = !has("--floatweights")).count()
      case _         => spark.read.text(out).count()
    }
    println(s"[graph_converter] wrote $written edges to $out")
    spark.stop()
  }
}
