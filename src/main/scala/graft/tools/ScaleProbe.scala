package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.LinkGraph
import graft.engine.GatherScatter

/**
 * The catalog-scale rehearsal legs — the heavy driver gates re-run against
 * the 65M-edge transcript scale graph (or a multi-million-doc synthetic
 * corpus for dedup), shared between [[graft.Bench]]'s `catalog_scale` phase
 * and standalone probing:
 *
 *   runMain graft.tools.ScaleProbe <cores> <edgesParquet> <gate> [size]
 *
 * gates: scc | matching | coloring | betweenness | hits | dedup
 * (dedup ignores edgesParquet and synthesizes `size` docs, default 2M;
 * betweenness reads `size` as K, the source-batch width, default 8).
 *
 * Each leg answers the "would this gate survive 100x" question with a
 * measured number instead of a plan argument: the sf0.1 fixtures are ~1M
 * edges, the scale graph is ~65M — a gate whose per-edge cost grows on the
 * way up has a scaling problem the fixture can't show.
 */
object ScaleProbe {

  /** Deterministic scale corpus for the dedup rehearsal: groups of 5 docs
    * share 24 of their 25 tokens (so LSH must find transitive near-dup
    * clusters), tokens are md5 of (group, position) — pure column
    * expressions, nothing read from disk. */
  def scaleDocs(spark: SparkSession, n: Long): DataFrame =
    spark.range(0, n, 1, 64).select(
      col("id").as("doc_id"),
      concat_ws(" ", concat(
        transform(sequence(lit(0), lit(23)), j =>
          substring(md5(concat(floor(col("id") / 5).cast("string"),
            lit(":"), j.cast("string"))), 1, 8)),
        array(substring(md5(concat(lit("d:"), col("id").cast("string"))), 1, 8))
      )).as("text"))

  /** Run one rehearsal gate; returns (result rows, work units) where units
    * = edges for graph gates, docs for dedup — the denominator of the
    * per-gate throughput the bench records. */
  def runGate(spark: SparkSession, gate: String, edges: => DataFrame,
              size: Long): (Long, Long) = gate match {
    case "scc" =>
      val g = LinkGraph(edges)
      (graft.algos.Scc.runFast(g).count(), g.numEdges)
    case "matching" =>
      val g = LinkGraph(edges)
      (graft.algos.Matching.run(g).state.count(), g.numEdges)
    case "coloring" =>
      val g = LinkGraph(edges)
      (graft.algos.Coloring.colors(g).count(), g.numEdges)
    case "betweenness" =>
      val g = LinkGraph(edges)
      // K sources in md5 order (size arg, default 8 = 2x the fixture
      // gate's K=4). The batched Brandes carries a K-wide DENSE array per
      // vertex, so each level costs K x |V| state width regardless of
      // frontier sparsity — measured: K=32 on the 7.8M-edge graph exceeds
      // 10 minutes while K=4 is ~linear-in-|E| from the fixture. The K
      // knob is priced explicitly in BASELINE.md.
      val kSrc = if (size > 0) size.toInt else 8
      val srcs = g.vertices.select(col("id"))
        .orderBy(md5(col("id").cast("string")), col("id")).limit(kSrc)
        .collect().map(_.getLong(0)).toSeq
      (graft.algos.Betweenness.run(g, srcs).count(), g.numEdges)
    case "hits" =>
      val g = LinkGraph(edges)
      (graft.algos.Hits.run(g, iterations = 5).count(), g.numEdges)
    case "dedup" =>
      import graft.pipeline.Dedup
      val docs = scaleDocs(spark, size)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sig = Dedup.minHash(Dedup.shingles(docs, col("doc_id"), col("text"), 3), 8)
      val pairs = Dedup.lshCandidates(Dedup.lshBands(sig, 8, 8), maxBucket = 1000)
      val n = Dedup.clusters(docs.select(col("doc_id").as("id")), pairs).count()
      docs.unpersist(blocking = false)
      (n, size)
    case other => throw new IllegalArgumentException(s"unknown gate: $other")
  }

  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val edgesPath = args(1)
    val gate = args(2)
    val size = args.lift(3).map(_.toLong).getOrElse(2000000L)
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaleprobe-$gate")
      .config("spark.sql.shuffle.partitions", math.max(cores, 64))
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false")
    GatherScatter.engineConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val (rows, units) = runGate(spark, gate, spark.read.parquet(edgesPath), size)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[scaleprobe] $gate rows=$rows units=$units sec=$sec%.1f units_per_sec=${units / sec}%.0f")
    spark.stop()
  }
}
