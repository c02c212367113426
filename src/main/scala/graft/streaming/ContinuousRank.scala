package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.algos.DeltaPageRank
import graft.core.LinkGraph

/**
 * Continuous PageRank over a GROWING link graph — the streaming composition
 * the reference's delta formulation (`src/IncrementalPageRank.cpp:33-185`)
 * exists for: fold each micro-batch of new edges into the accumulated graph
 * and refresh the ranks with `DeltaPageRank.warmStart`, so per batch the
 * engine converges only the region the new edges actually reach instead of
 * re-ranking the whole graph from the 0.3 init.
 *
 * Scale shape (100 TB): the residual pricing is two shuffle-bounded passes
 * over the current edge table; the iterative work is proportional to the
 * affected region (a crawl/ingest batch touches a tiny fraction of a web
 * graph). In production the accumulated edges and the rank state are table
 * appends/overwrites (Iceberg); in this sandbox the maintainer holds them as
 * localCheckpoint-materialized DataFrames — same plan shapes, driverless
 * state swapped for durable tables.
 */
object ContinuousRank {

  /** foreachBatch-side state holder. Thread-safe; one instance per query. */
  final class RankMaintainer(numPartitions: Int = 0, alpha: Double = 0.3) {
    private val batches = ArrayBuffer.empty[DataFrame]
    private var ranks: Option[DataFrame] = None
    private var prevGraph: Option[LinkGraph] = None

    /** Fold one micro-batch of `(src, dst[, weight])` edges in and return the
      * refreshed `(id, pagerank)`. A micro-batch DataFrame is only valid
      * inside its trigger, so the rows are materialized (localCheckpoint)
      * before they join the accumulated set. */
    def update(batchEdges: DataFrame): DataFrame = synchronized {
      val cols =
        if (batchEdges.columns.contains("weight"))
          batchEdges.select(col("src"), col("dst"), col("weight"))
        else batchEdges.select(col("src"), col("dst"))
      val mat = cols.localCheckpoint(true)
      if (mat.isEmpty) return current
      batches += mat
      val g = LinkGraph(batches.reduce(_ unionByName _), numPartitions)
      val res = ranks match {
        case Some(prev) => DeltaPageRank.warmStart(g, prev, alpha)
        case None       => DeltaPageRank.run(g, alpha)
      }
      val next = res.state.select(col("id"), col("pagerank")).localCheckpoint(true)
      // the new ranks are materialized, so the previous graph's clustered
      // edge caches can go — without this every batch would pin another copy
      prevGraph.foreach(_.unpersistAll())
      prevGraph = Some(g)
      ranks = Some(next)
      next
    }

    /** Latest ranks (empty two-column frame before the first batch). */
    def current: DataFrame = synchronized {
      ranks.getOrElse(
        org.apache.spark.sql.SparkSession.active.range(0)
          .select(col("id"), lit(0.0).as("pagerank")))
    }

    /** Release every cache/checkpoint the maintainer still holds. */
    def close(): Unit = synchronized {
      prevGraph.foreach(_.unpersistAll()); prevGraph = None
    }
  }

  /** Wire an edge stream to a maintainer: `attach(edges, m).start()`. */
  def attach(edgeStream: DataFrame, m: RankMaintainer): DataStreamWriter[Row] =
    edgeStream.writeStream.outputMode("append")
      .foreachBatch { (b: Dataset[Row], _: Long) => m.update(b.toDF()); () }
}
