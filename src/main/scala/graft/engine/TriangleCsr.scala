package graft.engine

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, col, lit}
import org.apache.spark.storage.StorageLevel

import graft.core.{EdgeOps, LinkGraph}
import graft.algos.TriangleCount
import GatherScatter.{partOf, IdPartitioner, LongDoubleMap}

/**
 * Triangle counting on the primitive-array (CSR) path — the fourth
 * north-rule algorithm on the kernel side of the house, completing
 * PageRank / CC / LP / triangles.
 *
 * Semantics are the column engine's `TriangleCount.perVertex`
 * (`algos/Algorithms.scala`), itself matching the reference
 * (`/root/reference/src/TriangleCounting.cpp:39-216`): per-vertex counts
 * attribute each triangle exactly once, to its LARGEST original id; input is
 * DAG-canonicalized (self-loops dropped, (src,dst) deduped as unordered
 * pairs).
 *
 * Shape: distributed compact-forward. Unlike PageRank this is a ONE-SHOT
 * computation, so instead of the iterative split exchange it does four
 * bounded shuffles:
 *
 *   1. orient each canonical edge from its (degree, id)-smaller endpoint
 *      (`TriangleCount.orientByDegree` — one Tungsten aggregate + two joins,
 *      paid once). After orientation every out-adjacency is O(sqrt(2E)) even
 *      for hubs — the degree-aware-split analog for a one-shot op;
 *   2. route oriented edges to partOf(lo) as PACKED Array[Long] chunks (the
 *      same wire shape as `GatherScatter.build`) and assemble one sorted
 *      adjacency block per partition;
 *   3. adjacency exchange: each partition requests the out-adjacency of its
 *      DISTINCT dst endpoints from their home partitions (one request record
 *      and one packed reply record per partition pair — replication is
 *      bounded by min(#partitions, in-degree), never per-edge);
 *   4. local sorted-merge intersections adj(u) ∩ adj(v) per edge (u,v),
 *      partial counts folded in an open-addressing map, one tiny (id, count)
 *      shuffle to the owning partitions.
 *
 * Every triangle {a<b<c in (deg,id) order} is found exactly once, at its
 * edge (a,b): c ∈ adj(a) ∩ adj(b); the wedges at (a,c) and (b,c) cannot
 * close because orientation is acyclic.
 */
object TriangleCsr {

  /** Sorted adjacency for one partition: `srcs` ascending-unique,
    * `adj[off(i), off(i+1))` = out-neighbors of `srcs(i)`, id-ascending. */
  private final case class TriBlock(srcs: Array[Long], off: Array[Int], adj: Array[Long])

  /** In-place quicksort of parallel long arrays by (a, b) ascending. */
  private def sortPairs(a: Array[Long], b: Array[Long], from: Int, to: Int): Unit = {
    if (to - from < 2) return
    if (to - from <= 24) {
      var i = from + 1
      while (i < to) {
        val ka = a(i); val kb = b(i)
        var j = i - 1
        while (j >= from && (a(j) > ka || (a(j) == ka && b(j) > kb))) {
          a(j + 1) = a(j); b(j + 1) = b(j); j -= 1
        }
        a(j + 1) = ka; b(j + 1) = kb
        i += 1
      }
      return
    }
    val mid = from + (to - from) / 2
    val pa = a(mid); val pb = b(mid)
    var i = from; var j = to - 1
    while (i <= j) {
      while (a(i) < pa || (a(i) == pa && b(i) < pb)) i += 1
      while (a(j) > pa || (a(j) == pa && b(j) > pb)) j -= 1
      if (i <= j) {
        val ta = a(i); a(i) = a(j); a(j) = ta
        val tb = b(i); b(i) = b(j); b(j) = tb
        i += 1; j -= 1
      }
    }
    sortPairs(a, b, from, j + 1)
    sortPairs(a, b, i, to)
  }

  /** Per-vertex triangle counts (id, triangles), zero-filled over the full
    * vertex set. `numPartitions` <= 0 uses the graph's partitioning. */
  def perVertex(graph: LinkGraph, numPartitions: Int = 0): DataFrame = {
    val spark = graph.edges.sparkSession
    val n = if (numPartitions > 0) numPartitions else graph.numPartitions
    val idPart = new IdPartitioner(n)
    val nLoc = n

    val oriented = TriangleCount.orientByDegree(
      EdgeOps.toDag(graph.edges).select("src", "dst"))

    // ---- 2. route packed (lo, hi) chunks to partOf(lo), assemble blocks ---
    val routed: RDD[(Int, Array[Long])] = oriented.select("lo", "hi").rdd
      .mapPartitions { it =>
        val bufs = new Array[Array[Long]](nLoc)
        val lens = new Array[Int](nLoc)
        var out = List.empty[(Int, Array[Long])]
        val CHUNK = 2 << 20
        while (it.hasNext) {
          val r = it.next()
          val lo = r.getLong(0); val hi = r.getLong(1)
          val tp = partOf(lo, nLoc)
          var b = bufs(tp)
          if (b == null) { b = new Array[Long](1024); bufs(tp) = b }
          if (lens(tp) == b.length) {
            if (b.length >= CHUNK) {
              out ::= (tp, b)
              b = new Array[Long](1024); bufs(tp) = b; lens(tp) = 0
            } else { b = java.util.Arrays.copyOf(b, b.length << 1); bufs(tp) = b }
          }
          b(lens(tp)) = lo; b(lens(tp) + 1) = hi; lens(tp) += 2
        }
        var p = 0
        while (p < nLoc) {
          if (lens(p) > 0) out ::= (p, java.util.Arrays.copyOf(bufs(p), lens(p)))
          p += 1
        }
        out.iterator
      }
      .partitionBy(idPart)

    val blocks: RDD[TriBlock] = routed.mapPartitions({ it =>
      var m = 0
      var chunks = List.empty[Array[Long]]
      it.foreach { case (_, c) => chunks ::= c; m += c.length / 2 }
      val los = new Array[Long](m); val his = new Array[Long](m)
      var w = 0
      chunks.foreach { c =>
        var i = 0
        while (i < c.length) { los(w) = c(i); his(w) = c(i + 1); w += 1; i += 2 }
      }
      // sorted layout => identical after lineage recomputation (arrival order
      // is not deterministic, the sort is)
      sortPairs(los, his, 0, m)
      var nS = 0
      var i = 0
      while (i < m) { if (i == 0 || los(i) != los(i - 1)) nS += 1; i += 1 }
      val srcs = new Array[Long](nS); val off = new Array[Int](nS + 1)
      var s = 0
      i = 0
      while (i < m) {
        if (i == 0 || los(i) != los(i - 1)) { srcs(s) = los(i); off(s) = i; s += 1 }
        i += 1
      }
      off(nS) = m
      Iterator.single(TriBlock(srcs, off, his))
    }, preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    blocks.count()

    // ---- 3. adjacency exchange: request adj(v) for distinct remote dsts ---
    val requests: RDD[(Int, (Int, Array[Long]))] = blocks
      .mapPartitionsWithIndex({ (p, it) =>
        val blk = it.next()
        val sorted = java.util.Arrays.copyOf(blk.adj, blk.adj.length)
        java.util.Arrays.sort(sorted)
        val byTarget = new Array[Array[Long]](nLoc)
        val tLens = new Array[Int](nLoc)
        var i = 0
        while (i < sorted.length) {
          if (i == 0 || sorted(i) != sorted(i - 1)) {
            val v = sorted(i)
            val q = partOf(v, nLoc)
            if (q != p) { // local dsts are resolved in-place in step 4
              var b = byTarget(q)
              if (b == null) { b = new Array[Long](64); byTarget(q) = b }
              if (tLens(q) == b.length) {
                b = java.util.Arrays.copyOf(b, b.length << 1); byTarget(q) = b
              }
              b(tLens(q)) = v; tLens(q) += 1
            }
          }
          i += 1
        }
        Iterator.range(0, nLoc).flatMap { q =>
          if (tLens(q) == 0) Iterator.empty
          else Iterator.single((q, (p, java.util.Arrays.copyOf(byTarget(q), tLens(q)))))
        }
      }, preservesPartitioning = false)
      .partitionBy(idPart)

    // replies: packed [v, len, neighbors...] per (requesting partition) pair;
    // a v with no out-adjacency here is simply omitted (requester sees empty)
    val replies: RDD[(Int, Array[Long])] = requests.zipPartitions(
        blocks, preservesPartitioning = false) { (rIt, bIt) =>
      val blk = bIt.next()
      rIt.flatMap { case (_, (p, vs)) =>
        var total = 0
        var found = 0
        var i = 0
        while (i < vs.length) {
          val k = java.util.Arrays.binarySearch(blk.srcs, vs(i))
          if (k >= 0) { total += 2 + (blk.off(k + 1) - blk.off(k)); found += 1 }
          i += 1
        }
        if (found == 0) Iterator.empty
        else {
          val out = new Array[Long](total)
          var w = 0
          i = 0
          while (i < vs.length) {
            val k = java.util.Arrays.binarySearch(blk.srcs, vs(i))
            if (k >= 0) {
              val a = blk.off(k); val b = blk.off(k + 1)
              out(w) = vs(i); out(w + 1) = (b - a).toLong; w += 2
              System.arraycopy(blk.adj, a, out, w, b - a); w += b - a
            }
            i += 1
          }
          Iterator.single((p, out))
        }
      }
    }.partitionBy(idPart)

    // ---- 4. local intersections + one tiny (id, count) partial shuffle ----
    val partials: RDD[(Int, Array[Long])] = replies.zipPartitions(
        blocks, preservesPartitioning = false) { (rIt, bIt) =>
      val blk = bIt.next()
      val p = org.apache.spark.TaskContext.getPartitionId()
      // concatenate replies into one store; map v -> start (len at start-1)
      var chunks = List.empty[Array[Long]]
      var tot = 0
      rIt.foreach { case (_, c) => chunks ::= c; tot += c.length }
      val store = new Array[Long](tot)
      val where = new LongDoubleMap(1024) // v -> store offset of its length slot
      var w = 0
      chunks.foreach { c =>
        var i = 0
        while (i < c.length) {
          val v = c(i); val len = c(i + 1).toInt
          System.arraycopy(c, i, store, w, 2 + len)
          where.put(v, (w + 1).toDouble) // < 2^53: exact
          w += 2 + len
          i += 2 + len
        }
      }
      val acc = new LongDoubleMap(1024)
      var si = 0
      while (si < blk.srcs.length) {
        val u = blk.srcs(si)
        val ua = blk.off(si); val ub = blk.off(si + 1)
        var e = ua
        while (e < ub) {
          val v = blk.adj(e)
          // locate adj(v): local block if v routes here, else the reply store
          var va = -1; var vb = -1
          var vArr: Array[Long] = null
          if (partOf(v, nLoc) == p) {
            val k = java.util.Arrays.binarySearch(blk.srcs, v)
            if (k >= 0) { vArr = blk.adj; va = blk.off(k); vb = blk.off(k + 1) }
          } else {
            val at = where.getOrNaN(v)
            if (!at.isNaN) {
              val lenAt = at.toInt
              vArr = store; va = lenAt + 1; vb = va + store(lenAt).toInt
            }
          }
          if (vArr != null) {
            // sorted-merge intersection of adj(u) x adj(v)
            var i = ua; var j = va
            while (i < ub && j < vb) {
              val x = blk.adj(i); val y = vArr(j)
              if (x < y) i += 1
              else if (x > y) j += 1
              else {
                // triangle {u, v, x}: attribute to the largest ORIGINAL id
                val mx = math.max(math.max(u, v), x)
                acc.addTo(mx, 1.0)
                i += 1; j += 1
              }
            }
          }
          e += 1
        }
        si += 1
      }
      val (ks, cs) = acc.toArrays
      // pack per-owner (id, count) partials
      val byTarget = new Array[Array[Long]](nLoc)
      val tLens = new Array[Int](nLoc)
      var i = 0
      while (i < ks.length) {
        val q = partOf(ks(i), nLoc)
        var b = byTarget(q)
        if (b == null) { b = new Array[Long](64); byTarget(q) = b }
        if (tLens(q) == b.length) {
          b = java.util.Arrays.copyOf(b, b.length << 1); byTarget(q) = b
        }
        b(tLens(q)) = ks(i); b(tLens(q) + 1) = cs(i).toLong; tLens(q) += 2
        i += 1
      }
      Iterator.range(0, nLoc).flatMap { q =>
        if (tLens(q) == 0) Iterator.empty
        else Iterator.single((q, java.util.Arrays.copyOf(byTarget(q), tLens(q))))
      }
    }.partitionBy(idPart)

    val countRows: RDD[(Long, Long)] = partials.mapPartitions { it =>
      val acc = new LongDoubleMap(1024)
      it.foreach { case (_, c) =>
        var i = 0
        while (i < c.length) { acc.addTo(c(i), c(i + 1).toDouble); i += 2 }
      }
      val (ks, cs) = acc.toArrays
      Iterator.range(0, ks.length).map(i => (ks(i), cs(i).toLong))
    }.persist(StorageLevel.MEMORY_AND_DISK)

    // one-shot op: materialize the (small — ids with >0 triangles) counts
    // eagerly so the big adjacency blocks can be freed HERE instead of
    // leaking into the caller's cache sweep
    countRows.count()
    blocks.unpersist(blocking = false)

    import spark.implicits._
    val counts = countRows.toDF("id", "triangles")
    graph.vertices.join(counts, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** Global triangle count (the reference's applyReduceAllVertices fold). */
  def total(graph: LinkGraph, numPartitions: Int = 0): Long = {
    import org.apache.spark.sql.functions.sum
    perVertex(graph, numPartitions).agg(sum("triangles")).head().getLong(0)
  }

  /** Deterministic triangle-RICH fixture for benches and specs: vertices in
    * blocks of `blockSize`, an intra-block edge (u,v) iff the mixed pair
    * hash lands in a 3/10 bucket (~30% density → dense local intersections),
    * plus a chain stitching consecutive blocks. Transcript graphs are nearly
    * triangle-free (reply chains + tool stars), so triangle throughput needs
    * its own generator. Fully distributed (one `range` over blocks, no
    * driver materialization) and seed-free deterministic. */
  def communityEdges(spark: org.apache.spark.sql.SparkSession,
                     nBlocks: Long, blockSize: Int): DataFrame = {
    import spark.implicits._
    val bs = blockSize
    spark.range(nBlocks).as[Long].flatMap { b =>
      val base = b * bs
      val within = for {
        i <- 0 until bs
        j <- i + 1 until bs
        u = base + i
        v = base + j
        if math.floorMod(GatherScatter.mix(u * 1000000L + v), 10L) < 3
      } yield (u, v)
      val stitch = if (b > 0) Seq((base - bs, base)) else Nil
      within ++ stitch
    }.toDF("src", "dst")
  }
}
