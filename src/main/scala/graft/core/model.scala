package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * A directed edge. Mirrors the reference's `edge_t<T>` (GraphMat
 * `include/GMDP/utils/edgelist.h:38-50`) with 64-bit vertex ids (the reference
 * uses 1-based int32; we keep stable Longs — cf. SURVEY.md §1.4) and a Double
 * payload (the reference templates the payload; every bundled algorithm uses a
 * numeric weight).
 */
final case class Edge(src: Long, dst: Long, weight: Double)

/**
 * Distributed link graph: the Spark-native analog of GraphMat's
 * `Graph<V,E>` (`include/Graph.h:58-107`), which materializes the adjacency
 * matrix `A` and its transpose `AT` so both push (OUT_EDGES) and pull
 * (IN_EDGES) are a forward SpMV.
 *
 * Here the graph is ONE immutable edge DataFrame `(src, dst, weight)`, with
 * two lazily-cached *clustered* views:
 *   - `edgesBySrc`: hash-partitioned by `src`, sorted within partitions by
 *     (src, dst) — the CSR-style layout for message flow along out-edges
 *     (sender joins on src);
 *   - `edgesByDst`: hash-partitioned by `dst`, sorted by (dst, src) — the
 *     CSC-style layout for flow along in-edges.
 *
 * Pre-partitioning means the per-superstep join against the frontier never
 * re-shuffles the (large) edge side: Catalyst's EnsureRequirements sees the
 * existing HashPartitioning and only shuffles the (small) frontier. This is
 * the Spark analog of GraphMat's one-time `ingestEdgelist` all-to-all
 * (`SpMat.h:97-278`) + per-tile DCSC build.
 *
 * Vertex state lives OUTSIDE this holder (immutable per-superstep DataFrames),
 * unlike the reference's in-place `vertexproperty` vector.
 */
final class LinkGraph private (
    val edges: DataFrame,
    val numPartitions: Int,
    /** Endpoint degree above which a vertex is treated as a hub by the
      * superstep router (north rule: salted hot vertices / degree-aware
      * split). 0 = automatic (a quarter of an average partition's edges);
      * < 0 disables the split. */
    val hotDegree: Long = 0L) extends Serializable {

  import LinkGraph._

  private[this] var bySrc: Option[DataFrame] = None
  private[this] var byDst: Option[DataFrame] = None
  private[this] var hotBySalt: collection.mutable.Map[String, DataFrame] =
    collection.mutable.Map.empty
  private[this] var hotCache: collection.mutable.Map[String, Array[Long]] =
    collection.mutable.Map.empty

  /** Edges clustered for joins on `src` (messages along OUT edges). */
  def edgesBySrc: DataFrame = synchronized {
    bySrc.getOrElse {
      val df = edges
        .repartition(numPartitions, col("src"))
        .sortWithinPartitions("src", "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
      bySrc = Some(df)
      df
    }
  }

  /** Edges clustered for joins on `dst` (messages along IN edges) — the `AT` analog. */
  def edgesByDst: DataFrame = synchronized {
    byDst.getOrElse {
      val df = edges
        .repartition(numPartitions, col("dst"))
        .sortWithinPartitions("dst", "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
      byDst = Some(df)
      df
    }
  }

  private def effectiveHotDegree: Long =
    if (hotDegree > 0) hotDegree
    else math.max(4096L, numEdges / numPartitions / 4)

  /** Hub endpoints on `key` (src|dst): degree above the hot threshold. One
    * aggregate over the edges, computed lazily and memoized; by definition
    * the result is small (otherwise the threshold is wrong). Guard: the hub
    * list feeds `isInCollection` filters (rebuilt in three Catalyst plans per
    * superstep) and a broadcast of the hub edge shards — past `maxHubs` that
    * degrades planning instead of helping, and a "hub" list that large means
    * the threshold is miscalibrated for this degree distribution (they are
    * not really hubs). Fall back to the plain pre-partitioned join, which is
    * the right plan exactly then. Mirrors GatherScatter.build's hard cap. */
  def hotIds(key: String): Array[Long] = synchronized {
    hotCache.getOrElseUpdate(key, {
      if (hotDegree < 0) Array.emptyLongArray
      else {
        val hot = edges.groupBy(col(key)).count()
          .filter(col("count") > effectiveHotDegree)
          .select(col(key)).limit(maxHubs + 1).collect().map(_.getLong(0)).sorted
        if (hot.length > maxHubs) Array.emptyLongArray else hot
      }
    })
  }

  /** A hub's edge list spread evenly over all partitions (salted by the
    * OTHER endpoint) instead of clustered on one — the degree-aware split. */
  private def hotEdges(key: String, other: String): DataFrame = synchronized {
    hotBySalt.getOrElseUpdate(key, {
      val df = edges.filter(col(key).isInCollection(hotIds(key)))
        .repartition(numPartitions, col(other))
        .persist(StorageLevel.MEMORY_AND_DISK)
      df
    })
  }

  /**
   * The superstep routing join with hub splitting: messages (keyed `_send`)
   * joined through the edges clustered on `senderKey`. Cold srcs use the
   * pre-partitioned edge view (only the frontier shuffles); hub srcs — whose
   * edge lists would otherwise pin one partition — use a BROADCAST of their
   * (few, by definition) frontier rows against their salted edge shards, so
   * a million-edge hub costs every partition |E_hub|/n instead of one
   * partition |E_hub|. Row set is identical either way.
   */
  def joinAlong(msgs: DataFrame, senderKey: String): DataFrame = {
    val clustered = if (senderKey == "src") edgesBySrc else edgesByDst
    val hot = hotIds(senderKey)
    if (hot.isEmpty) msgs.join(clustered, col("_send") === col(senderKey))
    else {
      val cold = msgs.filter(!col("_send").isInCollection(hot))
        .join(clustered.filter(!col(senderKey).isInCollection(hot)),
          col("_send") === col(senderKey))
      val hotJoin = broadcast(msgs.filter(col("_send").isInCollection(hot)))
        .join(hotEdges(senderKey, if (senderKey == "src") "dst" else "src"),
          col("_send") === col(senderKey))
      cold.unionByName(hotJoin)
    }
  }

  private[this] var vertsCached = false

  /** Distinct vertex ids appearing as src or dst (GraphMat derives the vertex
    * set from matrix dims; with arbitrary Long ids we take the union). */
  lazy val vertices: DataFrame = {
    vertsCached = true
    edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct()
      .repartition(numPartitions, col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
  }

  lazy val numEdges: Long = edges.count()
  lazy val numVertices: Long = vertices.count()

  /** Undirected view: each distinct unordered pair once in each direction.
    * (Dedup first, so a graph holding both (u,v) and (v,u) does not
    * double-count neighbors.) */
  def undirected: LinkGraph = {
    val canon = edges
      .select(
        least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"),
        col("weight"))
      .filter(col("src") =!= col("dst"))
      .dropDuplicates("src", "dst")
    val both = canon.union(canon.select(col("dst").as("src"), col("src").as("dst"), col("weight")))
    new LinkGraph(both, numPartitions, hotDegree)
  }

  /** Same graph with a different hub threshold (fresh clustered-view caches). */
  def copyWithHotDegree(hd: Long): LinkGraph = new LinkGraph(edges, numPartitions, hd)

  def unpersistAll(): Unit = synchronized {
    bySrc.foreach(_.unpersist()); bySrc = None
    byDst.foreach(_.unpersist()); byDst = None
    hotBySalt.values.foreach(_.unpersist()); hotBySalt.clear()
    hotCache.clear()
    // a lazy val can't be reset — drop its cache entry if it was built
    // (subsequent uses recompute uncached, which is the right post-cleanup
    // behavior for a graph being released)
    if (vertsCached) vertices.unpersist()
  }
}

object LinkGraph {

  /** Hub-split fallback bound — see `hotIds`. */
  val maxHubs: Int = 4096

  /** Build from any DataFrame with (src, dst[, weight]) columns. */
  def apply(edges: DataFrame, numPartitions: Int = 0, hotDegree: Long = 0L): LinkGraph = {
    val spark = edges.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val withW =
      if (edges.columns.contains("weight"))
        edges.select(col("src").cast("long"), col("dst").cast("long"), col("weight").cast("double"))
      else
        edges.select(col("src").cast("long"), col("dst").cast("long"), lit(1.0).as("weight"))
    new LinkGraph(withW, n, hotDegree)
  }

  /** Build from an in-memory edge list (tests / the bundled reference graphs). */
  def fromSeq(spark: SparkSession, es: Seq[Edge], numPartitions: Int = 4): LinkGraph = {
    import spark.implicits._
    apply(es.toDF(), numPartitions)
  }
}
