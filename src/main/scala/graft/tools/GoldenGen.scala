package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.algos.{ConnectedComponents, LabelPropagation, PageRank, TriangleCount}
import graft.core.LinkGraph
import graft.sources.{MtxReader, VertexDump}

/**
 * Regenerate the committed byte-exact golden dumps
 * (`src/test/resources/golden/<graph>/<algo>.txt`) — the
 * `Graph::saveVertexproperty` output (`include/Graph.h:338-350`, format
 * `sources/VertexDump.scala`) of four algorithms on the bundled reference
 * graphs. GoldenDumpSpec diffs the engine's current output against these
 * files line-for-line; GoldenParitySpec separately proves the VALUES match
 * independent sequential oracles, so the committed bytes are oracle-anchored,
 * not self-fulfilling.
 *
 * usage: runMain graft.tools.GoldenGen [outDir]
 */
object GoldenGen {

  val fixtures = Seq("test.bin.mtx", "2_10_upper_triangle.bin.mtx")

  /** (algo name, dump lines) for one reference graph — shared with the spec
    * so generator and checker cannot drift. */
  def dumps(g: LinkGraph): Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
    "pagerank" -> VertexDump.lines(
      PageRank.run(g).state, round(col("pagerank") + 1e-9, 6)),
    "cc" -> VertexDump.lines(
      ConnectedComponents.run(g).state, col("component")),
    "lp" -> VertexDump.lines(
      LabelPropagation.run(g, iterations = 2).state, col("label")),
    "triangles" -> VertexDump.lines(
      TriangleCount.perVertex(g), col("triangles")))

  def render(df: org.apache.spark.sql.DataFrame): String =
    df.collect().map(_.getString(0)).mkString("", "\n", "\n")

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("src/test/resources/golden")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- fixtures) {
      val g = LinkGraph(MtxReader.read(spark, s"/root/reference/data/$name"), 8)
      for ((algo, df) <- dumps(g)) {
        val dir = Paths.get(s"$out/$name")
        Files.createDirectories(dir)
        Files.writeString(dir.resolve(s"$algo.txt"), render(df))
        println(s"[golden] wrote $out/$name/$algo.txt")
      }
      g.unpersistAll()
    }
    spark.stop()
  }
}
