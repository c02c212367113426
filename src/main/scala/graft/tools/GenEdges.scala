package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.Transcripts

/** One-off: synthesize the deterministic transcript graph and park the edge
  * table as parquet. usage: runMain graft.tools.GenEdges <convs> <outPath> */
object GenEdges {
  def main(args: Array[String]): Unit = {
    val convs = args(0).toInt
    val out = args(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    Transcripts.edges(Transcripts.vertices(Transcripts.synthesize(spark, convs)))
      .write.mode("overwrite").parquet(out)
    println(f"[gen] $convs convs -> $out in ${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
