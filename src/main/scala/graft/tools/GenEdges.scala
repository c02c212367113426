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
    // optional: prebuild + save the CSR snapshot (args: snapOut nParts keyShift)
    args.lift(2).foreach { snapOut =>
      val nParts = args.lift(3).map(_.toInt).getOrElse(16)
      val shift = args.lift(4).map(_.toInt).getOrElse(0)
      val t1 = System.nanoTime()
      val g = graft.engine.GatherScatter.build(
        graft.core.LinkGraph(spark.read.parquet(out)), nParts, keyShift = shift)
      graft.engine.GatherScatter.save(g, snapOut)
      g.unpersist()
      println(f"[gen] snapshot $snapOut (parts=$nParts shift=$shift) in ${(System.nanoTime()-t1)/1e9}%.1f s")
    }
    spark.stop()
  }
}
