package graft.engine

import org.apache.spark.{Partitioner, SparkContext, TaskContext}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.core.LinkGraph

/**
 * The SpMV inner loop compiled as a partition-local gather-scatter over
 * CSR-style edge partitions — the direct Spark analog of GraphMat's tile
 * kernel (`singlenode/spmspv.h:39-86`), with the communication structure
 * computed ONCE at build time (GraphMat's `ingestEdgelist` + DCSC tile build,
 * `SpMat.h:97-278`) so each superstep is pure primitive-array arithmetic:
 *
 *  - Edges are hash-partitioned by src; within a partition they are
 *    re-encoded as (src-index, out-index) pairs grouped by TARGET partition,
 *    where out-index points into a static per-(block, target) unique-dst
 *    array. Gather is then `vals(outIdx(e)) += contrib(srcIdx(e))` — no
 *    hashing, no allocation beyond the output buffers.
 *  - The scatter is ONE all-to-all of packed `Array[Double]` records (≤ n×n
 *    of them — the row-reduce all-to-all, `multinode/spmspv.h:141-203`); the
 *    receiver folds them through a static incoming-index table (`inIdx`,
 *    built once) into a dense per-partition accumulator. Because each
 *    (source block, hub dst) contributes ONE pre-summed slot, a hub vertex
 *    receives at most n partials per superstep — the two-phase (salted) ⊕
 *    the north rule asks for is structural here, not bolted on.
 *  - Vertex state is a dense `Array[Double]` aligned to a static per-partition
 *    id layout (receivers first, in-degree-0 srcs after), so the apply phase
 *    is a sequential array pass and convergence checking is index-aligned.
 *
 * Skew handling (north rule: "salted hot vertices, degree-aware split"):
 * srcs whose out-degree exceeds `hotDegree` have their edge lists SPLIT
 * across partitions — each hot edge is routed by mix(dst) instead of
 * mix(src), co-locating it with its receiver — and the (few) hot ranks are
 * broadcast per superstep (the mirror/ghost-vertex pattern; GraphMat's
 * "broadcast x to column ranks" phase, `multinode/spmspv.h:62-116`). A
 * million-out-degree hub therefore costs every partition |E_hub|/n edges
 * instead of one partition |E_hub|.
 *
 * One RDD job plus one (skippable) hot-mirror job per superstep, one shuffle,
 * no Catalyst re-planning, no per-row boxing. Throughput path only; semantics
 * verified against the Column-algebra engine (allclose 1e-9) in
 * GatherScatterSpec.
 */

/** Durable mid-algorithm checkpoint/resume for the CSR engine (north rule:
  * "each superstep checkpoints per-partition frontier state plus lineage and
  * iteration metrics ... so runs resume mid-algorithm" — the throughput-path
  * twin of the Column engine's [[CheckpointConfig]]). Every `every`
  * supersteps the full per-partition vertex state is committed under
  * `dir/runId/` together with per-partition lineage (`partitions.json`) and
  * per-superstep metrics (`metrics.jsonl`); `latest.json` is the commit
  * pointer, written last. Pass to `pageRankConverged` / `minFixpoint` /
  * `connectedComponents` / `bfs` / `sssp`: if a committed checkpoint already
  * exists under `dir/runId`, the run RESUMES from it instead of restarting.
  * All durable IO goes through `store` ([[SnapshotStore]]); in production
  * these are Iceberg snapshot commits, and the default
  * [[HadoopSnapshotStore]] (object-files-with-a-pointer over the Hadoop
  * FileSystem of `dir` — local, hdfs://, s3a://) is the sandbox stand-in
  * (no Iceberg jars). */
final case class CsrCheckpoint(dir: String, runId: String, every: Int = 8,
                               store: SnapshotStore = HadoopSnapshotStore)

object GatherScatter {

  /**
   * Session confs the engine relies on for STABLE task placement under real
   * executors. The superstep stage zips a ShuffledRDD with the cached graph
   * blocks; with reduce-locality on, the two preferences can disagree (map
   * output on one executor, cache on another), Spark unions them, and tasks
   * alternate executors forever — measured as the ENTIRE per-superstep
   * exchange going through remote shuffle (130–260 MB/superstep on the 32.5M
   * edge bench graph) and a 3-5x superstep slowdown. Reduce-locality off
   * makes the cached graph blocks the only preference, so map output, block
   * cache and apply task stay on one executor and cross-JVM bytes equal the
   * true partition cut. The generous locality wait keeps tasks waiting for
   * their home executor instead of drifting on a GC pause (partitions are
   * balanced, so no starvation).
   */
  val engineConfs: Map[String, String] = Map(
    "spark.shuffle.reduceLocality.enabled" -> "false",
    "spark.locality.wait" -> "30s")

  /** splitmix64 finalizer: every output bit depends on every input bit.
    * Structured vertex ids (e.g. convId<<20|turn) have near-zero low-bit
    * entropy, so low-bit hashing (java Long.hashCode % n) clusters
    * catastrophically — both for open addressing and for partition routing. */
  @inline def mix(k: Long): Long = {
    var z = k * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  @inline private[engine] def partOf(k: Long, n: Int): Int = {
    val h = (mix(k) % n).toInt
    if (h < 0) h + n else h
  }

  /** Partitioner routing Long keys through the mixer. `shift` drops the low
    * `shift` id bits before hashing: ids sharing high bits co-locate (see
    * `build`'s keyShift). */
  final class MixPartitioner(val n: Int, val shift: Int = 0) extends Partitioner {
    def numPartitions: Int = n
    def getPartition(key: Any): Int = partOf(key.asInstanceOf[Long] >>> shift, n)
    override def equals(o: Any): Boolean = o match {
      case p: MixPartitioner => p.n == n && p.shift == shift
      case _ => false
    }
    override def hashCode: Int = n * 31 + shift
  }

  /**
   * Open-addressing Long→Double map, linear probing, power-of-2 capacity.
   * Sentinel Long.MinValue = empty (vertex ids must not use it).
   *
   * The slot hash uses the HIGH 32 bits of mix(k) — independent of the
   * routing hash `mix(k) % n` (low bits). Within one partition every key
   * shares the same routing residue, so hashing slots with the same low bits
   * would leave only 1/n of the table as home slots and probe chains n× the
   * load factor (measured as a 10-20× superstep slowdown in round 1).
   */
  final class LongDoubleMap(expected: Int) extends Serializable {
    private val EMPTY = Long.MinValue
    private var cap = Integer.highestOneBit(math.max(expected, 8) * 4 - 1) << 1
    private var mask = cap - 1
    private var keys = Array.fill[Long](cap)(EMPTY)
    private var vals = new Array[Double](cap)
    private var n = 0

    def size: Int = n

    @inline private def home(k: Long): Int = (mix(k) >>> 32).toInt & mask

    def addTo(k: Long, v: Double): Unit = {
      var i = home(k)
      while (true) {
        val kk = keys(i)
        if (kk == k) { vals(i) += v; return }
        if (kk == EMPTY) {
          keys(i) = k; vals(i) = v; n += 1
          if (n * 4 > cap * 3) grow()
          return
        }
        i = (i + 1) & mask
      }
    }

    def put(k: Long, v: Double): Unit = {
      var i = home(k)
      while (true) {
        val kk = keys(i)
        if (kk == k) { vals(i) = v; return }
        if (kk == EMPTY) {
          keys(i) = k; vals(i) = v; n += 1
          if (n * 4 > cap * 3) grow()
          return
        }
        i = (i + 1) & mask
      }
    }

    /** NaN when absent. */
    def getOrNaN(k: Long): Double = {
      var i = home(k)
      while (true) {
        val kk = keys(i)
        if (kk == k) return vals(i)
        if (kk == EMPTY) return Double.NaN
        i = (i + 1) & mask
      }
      Double.NaN
    }

    def toArrays: (Array[Long], Array[Double]) = {
      val ks = new Array[Long](n); val vs = new Array[Double](n)
      var i = 0; var j = 0
      while (i < cap) {
        if (keys(i) != EMPTY) { ks(j) = keys(i); vs(j) = vals(i); j += 1 }
        i += 1
      }
      (ks, vs)
    }

    private def grow(): Unit = {
      val ok = keys; val ov = vals
      cap <<= 1; mask = cap - 1
      keys = Array.fill[Long](cap)(EMPTY); vals = new Array[Double](cap)
      n = 0
      var i = 0
      while (i < ok.length) {
        if (ok(i) != EMPTY) put(ok(i), ov(i))
        i += 1
      }
    }
  }

  /**
   * Static per-partition edge structure (the DCSC tile analog,
   * `DCSCTile.h:241-381`). `srcs` are the partition's LOCAL srcs (rank held
   * here); hot-shard edges reference the global hot list instead.
   * Per target partition tp: `outIds(tp)` = unique dsts routed to tp;
   * normal edges as (srcIdx into srcs, outIdx into outIds(tp)).
   * Hot edges were routed here BY dst, so their target bucket is this
   * partition itself: (hotIdx into hotLocal, outIdx into outIds(self)).
   */
  final case class CsrBlock(
      srcs: Array[Long], invDeg: Array[Double],
      outIds: Array[Array[Long]],
      edgeSrcIdx: Array[Array[Int]], edgeOutIdx: Array[Array[Int]],
      hotLocal: Array[Int],          // global hot-list index of hot srcs with edges here
      hotLocalInvDeg: Array[Double], // 1/globalDegree aligned to hotLocal
      hotEdgeSrcIdx: Array[Int],     // per hot edge: index into hotLocal
      hotEdgeOutIdx: Array[Int],     // per hot edge: index into outIds(self)
      // per-edge weights for the weighted (min,+) path, aligned positionally
      // with edgeSrcIdx(tp) / hotEdgeSrcIdx. null on unweighted builds (the
      // PageRank path never reads them; invDeg covers its uniform case).
      edgeW: Array[Array[Double]] = null,
      hotEdgeW: Array[Double] = null)

  /** Static per-partition vertex layout: receivers (in-degree > 0) occupy
    * ids[0, nRecv); in-degree-0 srcs follow. `srcPrIdx` aligns CsrBlock.srcs
    * to this layout; `hotHomeGlobal`/`hotHomeLocal` locate the hot vertices
    * homed in this partition for the per-superstep mirror broadcast. */
  final case class VertexMeta(
      ids: Array[Long], nRecv: Int,
      srcPrIdx: Array[Int],
      hotHomeGlobal: Array[Int], hotHomeLocal: Array[Int])

  /** One rank block per partition (public result shape). */
  final case class RankBlock(ids: Array[Long], pr: Array[Double])

  final case class PrGraph(
      csr: RDD[CsrBlock],
      verts: RDD[VertexMeta],
      inIdx: RDD[Array[Array[Int]]],          // per partition: source block q -> local recv indices
      hotIds: Array[Long],                     // globally sorted hot vertex ids
      numPartitions: Int,
      numEdges: Long,
      numVertices: Long,
      // the persisted RDD `verts`/`inIdx` are views of (kept for unpersist)
      private val combined: Option[RDD[(VertexMeta, Array[Array[Int]])]] = None,
      // snapshot loads cache ONE (csr, meta) RDD and expose views — see load()
      private val backing: Option[RDD[_]] = None,
      // built with per-edge weights (build(..., weighted = true))
      weighted: Boolean = false) {
    /** The one persisted (VertexMeta, inIdx) RDD — supersteps zip against
      * this single handle so zipPartitions arity stays within bounds. */
    def meta: RDD[(VertexMeta, Array[Array[Int]])] =
      combined.getOrElse(verts.zip(inIdx))
    def unpersist(): Unit = {
      backing.foreach(_.unpersist(blocking = false))
      csr.unpersist(blocking = false)
      combined.foreach(_.unpersist(blocking = false))
      verts.unpersist(blocking = false)
      inIdx.unpersist(blocking = false)
    }
  }

  private[engine] final class IdPartitioner(val n: Int) extends Partitioner {
    def numPartitions: Int = n
    def getPartition(key: Any): Int = key.asInstanceOf[Int]
    override def equals(o: Any): Boolean = o match {
      case p: IdPartitioner => p.n == n
      case _ => false
    }
    override def hashCode: Int = n
  }

  /** Sort a long array, returning (sorted, perm) with perm(oldIdx) = newIdx.
    * Build-time only: every per-partition layout is SORTED so that a lineage
    * recomputation after executor loss reproduces the identical layout —
    * otherwise rank vectors aligned to a pre-loss layout would silently
    * misalign against a recomputed one (shuffle arrival order is not
    * deterministic). */
  private def sortWithPerm(a: Array[Long]): (Array[Long], Array[Int]) = {
    val idx = Array.range(0, a.length).sortBy(a.apply)
    val sorted = new Array[Long](a.length); val perm = new Array[Int](a.length)
    var i = 0
    while (i < idx.length) { sorted(i) = a(idx(i)); perm(idx(i)) = i; i += 1 }
    (sorted, perm)
  }

  /** Growable primitive pair builder for the per-tp edge lists. */
  private final class IntPairBuf {
    var a = new Array[Int](256); var b = new Array[Int](256); var m = 0
    def add(x: Int, y: Int): Unit = {
      if (m == a.length) {
        a = java.util.Arrays.copyOf(a, m << 1)
        b = java.util.Arrays.copyOf(b, m << 1)
      }
      a(m) = x; b(m) = y; m += 1
    }
    def trimA: Array[Int] = java.util.Arrays.copyOf(a, m)
    def trimB: Array[Int] = java.util.Arrays.copyOf(b, m)
  }

  /** Growable primitive double builder (per-edge weights, weighted builds). */
  private final class DblBuf {
    var a = new Array[Double](256); var m = 0
    def add(x: Double): Unit = {
      if (m == a.length) a = java.util.Arrays.copyOf(a, m << 1)
      a(m) = x; m += 1
    }
    def trim: Array[Double] = java.util.Arrays.copyOf(a, m)
  }

  /**
   * Build the static structures once. `hotDegree` <= 0 picks an automatic
   * threshold (a src is "hot" when its edge list exceeds a quarter of an
   * average partition — only then does splitting beat locality).
   *
   * `keyShift` is the locality knob of the north rule's "range/hash-
   * partitioned" clause: vertices route by `mix(id >>> keyShift)`, so ids
   * sharing their high bits land in one partition. Transcript vertex ids are
   * hierarchical (`convOrd * 2^20 + turn_idx`, Transcripts.vertices), and
   * every reply/tool edge is intra-conversation — keyShift=20 therefore
   * makes the gather target of every edge the edge's OWN partition: the
   * per-superstep all-to-all carries (near) zero cross-executor bytes, while
   * load stays balanced because conversation ordinals are dense and hashed.
   * This is the Spark analog of GraphMat's cache-blocking vertex permutation
   * (`Graph.h:111-150`) lifted to the cluster level. 0 = pure hash (the
   * right default for ids with no exploitable structure).
   */
  def build(graph: LinkGraph, numPartitions: Int = 0, hotDegree: Long = 0L,
            keyShift: Int = 0, weighted: Boolean = false): PrGraph = {
    val n = if (numPartitions > 0) numPartitions else graph.numPartitions
    val idPart = new IdPartitioner(n)
    val sc = graph.edges.sparkSession.sparkContext

    // The edge table is read THREE times below (edge count for the hot
    // threshold, hub aggregate, routing). Persist the 2-column projection
    // across the passes so (a) a non-deterministic or mutating upstream
    // cannot make the hub set of pass 1 disagree with the edges routed in
    // pass 2, and (b) an expensive upstream pipeline is paid once, not
    // three times (the old form counted `graph.numEdges` off the RAW edge
    // plan before this persist existed — one extra full evaluation of the
    // fixtures' window derivation per build). Reads the graph's cached
    // clustered view when the caller already materialized one (guide §2.4).
    import org.apache.spark.sql.functions.{col => c9, count => cnt}
    val srcEdges = graph.cachedEdges
    val edgePairs = (if (weighted)
        srcEdges.select(c9("src"), c9("dst"), c9("weight").cast("double"))
      else srcEdges.select(c9("src"), c9("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val numEdges = edgePairs.count()
    val hotThreshold =
      if (hotDegree > 0) hotDegree
      else math.max(4096L, numEdges / n / 4)

    // degree-aware split: find srcs whose out-degree exceeds the threshold.
    // ONE Tungsten aggregate over the edge table (codegen'd partial+final
    // count — no RDD tuple boxing), tiny result: ids AND global degrees of
    // the hubs in a single pass (hub count is small by definition — if it
    // weren't, the threshold would be wrong, so cap it).
    val hotRows = edgePairs.groupBy(c9("src")).agg(cnt("*").as("d"))
      .filter(c9("d") > hotThreshold).collect()
    val hotIds: Array[Long] = hotRows.map(_.getLong(0)).sorted
    require(hotIds.length <= (1 << 20), s"hot-vertex list too large (${hotIds.length}); raise hotDegree")
    val hotSet = new LongDoubleMap(math.max(hotIds.length, 8))
    hotIds.zipWithIndex.foreach { case (id, i) => hotSet.put(id, i.toDouble) }
    val hotBc = sc.broadcast(hotSet)
    val nHot = hotIds.length
    val hotDeg: Array[Double] = {
      val m = hotRows.map(r => r.getLong(0) -> r.getLong(1).toDouble).toMap
      hotIds.map(m)
    }
    val hotDegBc = sc.broadcast(hotDeg)

    // route: normal edges by src (edge list co-located with the src's rank),
    // hot edges by dst (split across partitions, co-located with receivers).
    // The shuffle ships PACKED Array[Long] chunks ([s0,d0,s1,d1,...], one or
    // few records per (input partition, target)) instead of 2|E| boxed Long
    // tuples — at bench scale this build shuffle was 3-4x slower than the
    // packed form and dominated by tuple allocation + GC.
    val nLoc = n // plain local so closures don't capture the outer object
    val shiftLoc = keyShift
    val wLoc = weighted
    // weighted records append raw Double bits as a third long slot
    val stride = if (weighted) 3 else 2
    val routed: RDD[(Int, Array[Long])] = edgePairs.rdd
      .mapPartitions { it =>
        val hot = hotBc.value
        val bufs = new Array[Array[Long]](nLoc)
        val lens = new Array[Int](nLoc)
        var out = List.empty[(Int, Array[Long])]
        val CHUNK = stride << 20 // ~8-24 MB of longs per emitted record, max
        while (it.hasNext) {
          val r = it.next()
          val s = r.getLong(0); val d = r.getLong(1)
          val key = if (hot.getOrNaN(s).isNaN) s else d
          val tp = partOf(key >>> shiftLoc, nLoc)
          var b = bufs(tp)
          if (b == null) { b = new Array[Long](stride << 9); bufs(tp) = b }
          if (lens(tp) == b.length) {
            if (b.length >= CHUNK) {
              out ::= (tp, b) // exactly full: emit and start a fresh chunk
              b = new Array[Long](stride << 9); bufs(tp) = b; lens(tp) = 0
            } else {
              b = java.util.Arrays.copyOf(b, b.length << 1); bufs(tp) = b
            }
          }
          // records are `stride` slots; capacities are multiples of stride
          // (initial stride<<9, growth doubles), so a record never straddles
          // a capacity boundary
          b(lens(tp)) = s; b(lens(tp) + 1) = d
          if (wLoc) b(lens(tp) + 2) = java.lang.Double.doubleToRawLongBits(r.getDouble(2))
          lens(tp) += stride
        }
        var tp = 0
        while (tp < nLoc) {
          if (bufs(tp) != null && lens(tp) > 0)
            out ::= (tp, java.util.Arrays.copyOf(bufs(tp), lens(tp)))
          tp += 1
        }
        out.iterator
      }
      .partitionBy(idPart)

    val csr: RDD[CsrBlock] = routed
      .mapPartitionsWithIndex({ (p, it) =>
        val hot = hotBc.value
        val hDeg = hotDegBc.value
        var capE = 1 << 12
        var srcA = new Array[Long](capE); var dstA = new Array[Long](capE); var m = 0
        var wgtA: Array[Double] = if (wLoc) new Array[Double](capE) else null
        while (it.hasNext) {
          val chunk = it.next()._2
          var ci = 0
          while (ci < chunk.length) {
            if (m == capE) {
              capE <<= 1
              srcA = java.util.Arrays.copyOf(srcA, capE)
              dstA = java.util.Arrays.copyOf(dstA, capE)
              if (wLoc) wgtA = java.util.Arrays.copyOf(wgtA, capE)
            }
            srcA(m) = chunk(ci); dstA(m) = chunk(ci + 1)
            if (wLoc) wgtA(m) = java.lang.Double.longBitsToDouble(chunk(ci + 2))
            m += 1
            ci += stride
          }
        }
        // local (non-hot) srcs: all their edges are here, so local degree is global
        val degMap = new LongDoubleMap(1024)
        var i = 0
        while (i < m) {
          if (hot.getOrNaN(srcA(i)).isNaN) degMap.addTo(srcA(i), 1.0)
          i += 1
        }
        val (srcs, degs) = degMap.toArrays
        val idxMap = new LongDoubleMap(math.max(srcs.length, 8)) // value = index (exact in double)
        i = 0
        while (i < srcs.length) { idxMap.put(srcs(i), i.toDouble); i += 1 }
        val invDeg = new Array[Double](srcs.length)
        i = 0
        while (i < srcs.length) { invDeg(i) = 1.0 / degs(i); i += 1 }

        // per-target-partition unique-dst tables + packed edge lists
        val nTp = nLoc
        val outMap = new Array[LongDoubleMap](nTp) // dst -> outIdx
        val outList = new Array[Array[Long]](nTp)
        val outLen = new Array[Int](nTp)
        val ebuf = new Array[IntPairBuf](nTp)
        val hbuf = new IntPairBuf
        // weights stay positionally aligned with ebuf/hbuf adds: the remap
        // below rewrites index VALUES in place, never reorders entries
        val wbuf: Array[DblBuf] = if (wLoc) new Array[DblBuf](nTp) else null
        val hwbuf: DblBuf = if (wLoc) new DblBuf else null
        // local hot srcs (hot srcs with shard edges in this partition)
        val hotLocMap = new LongDoubleMap(64) // hot id -> local hot idx
        var hotLocIdx = new Array[Int](16); var nHotLoc = 0

        @inline def outIdxOf(tp: Int, dst: Long): Int = {
          var om = outMap(tp)
          if (om == null) {
            om = new LongDoubleMap(256); outMap(tp) = om
            outList(tp) = new Array[Long](256); ebuf(tp) = new IntPairBuf
          }
          val got = om.getOrNaN(dst)
          if (!got.isNaN) got.toInt
          else {
            val idx = outLen(tp)
            om.put(dst, idx.toDouble)
            if (idx == outList(tp).length)
              outList(tp) = java.util.Arrays.copyOf(outList(tp), idx << 1)
            outList(tp)(idx) = dst
            outLen(tp) = idx + 1
            idx
          }
        }

        i = 0
        while (i < m) {
          val s = srcA(i); val d = dstA(i)
          val tp = partOf(d >>> shiftLoc, nTp)
          val gHot = hot.getOrNaN(s)
          if (gHot.isNaN) {
            val oi = outIdxOf(tp, d) // creates the bucket (incl. ebuf) if new
            ebuf(tp).add(idxMap.getOrNaN(s).toInt, oi)
            if (wLoc) {
              if (wbuf(tp) == null) wbuf(tp) = new DblBuf
              wbuf(tp).add(wgtA(i))
            }
          } else {
            // hot edge: routed here by dst, so tp == this partition
            val g = gHot.toInt
            var loc = hotLocMap.getOrNaN(s)
            if (loc.isNaN) {
              if (nHotLoc == hotLocIdx.length)
                hotLocIdx = java.util.Arrays.copyOf(hotLocIdx, nHotLoc << 1)
              hotLocIdx(nHotLoc) = g
              hotLocMap.put(s, nHotLoc.toDouble)
              loc = nHotLoc.toDouble
              nHotLoc += 1
            }
            hbuf.add(loc.toInt, outIdxOf(tp, d))
            if (wLoc) hwbuf.add(wgtA(i))
          }
          i += 1
        }
        // canonicalize every layout by sorting + index remap: a recomputed
        // block after executor loss must reproduce the identical structure
        // (see sortWithPerm). Sets are order-independent, so sorted layout is.
        val (srcsS, permS) = sortWithPerm(srcs)
        val invDegS = new Array[Double](srcs.length)
        i = 0
        while (i < srcs.length) { invDegS(permS(i)) = invDeg(i); i += 1 }
        val outIds = new Array[Array[Long]](nTp)
        val outPerm = new Array[Array[Int]](nTp)
        var tp = 0
        while (tp < nTp) {
          if (outList(tp) != null) {
            val (o, po) = sortWithPerm(java.util.Arrays.copyOf(outList(tp), outLen(tp)))
            outIds(tp) = o; outPerm(tp) = po
          }
          tp += 1
        }
        val eSrc = new Array[Array[Int]](nTp)
        val eOut = new Array[Array[Int]](nTp)
        tp = 0
        while (tp < nTp) {
          if (ebuf(tp) != null) {
            val a = ebuf(tp).trimA; val b = ebuf(tp).trimB
            i = 0
            while (i < a.length) { a(i) = permS(a(i)); b(i) = outPerm(tp)(b(i)); i += 1 }
            eSrc(tp) = a; eOut(tp) = b
          }
          tp += 1
        }
        val hLocRaw = java.util.Arrays.copyOf(hotLocIdx, nHotLoc)
        val (hLocSortedL, permH) = sortWithPerm(hLocRaw.map(_.toLong))
        val hLoc = hLocSortedL.map(_.toInt)
        val hSrc = hbuf.trimA; val hOut = hbuf.trimB
        i = 0
        while (i < hSrc.length) {
          hSrc(i) = permH(hSrc(i))
          hOut(i) = outPerm(p)(hOut(i)) // hot edges target the local bucket
          i += 1
        }
        val eW: Array[Array[Double]] =
          if (!wLoc) null
          else Array.tabulate(nTp)(tp => if (wbuf(tp) == null) null else wbuf(tp).trim)
        Iterator.single(CsrBlock(
          srcsS, invDegS, outIds, eSrc, eOut,
          hLoc, hLoc.map(g => 1.0 / hDeg(g)),
          hSrc, hOut,
          eW, if (wLoc) hwbuf.trim else null))
      }, preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    csr.count()
    edgePairs.unpersist(blocking = false) // both passes are materialized

    // hot srcs are vertices of their HOME partition even when their edges
    // were scattered elsewhere
    val hotHomeRdd: RDD[Array[Long]] = sc
      .parallelize(hotIds.map(id => (id, null: Null)).toSeq, math.max(n / 4, 1))
      .partitionBy(new MixPartitioner(n, keyShift))
      .mapPartitions(it => Iterator.single(it.map(_._1).toArray),
        preservesPartitioning = true)

    // ONE exchange of the static unique-dst tables yields BOTH the receiver
    // sets (their union at p = exactly p's receivers — no separate 78M-record
    // dst shuffle) and the incoming-index table; per-superstep shuffles then
    // carry doubles only.
    val outMeta: RDD[(Int, (Int, Array[Long]))] = csr.mapPartitionsWithIndex {
      (p, it) =>
        val blk = it.next()
        Iterator.range(0, blk.outIds.length)
          .filter(tp => blk.outIds(tp) != null)
          .map(tp => (tp, (p, blk.outIds(tp))))
    }
    // vertex layout (receivers first [0, nRecv), then src-only vertices) plus
    // per-source-block incoming indices, built together in one pass
    val vertsAndIdx: RDD[(VertexMeta, Array[Array[Int]])] = outMeta
      .partitionBy(idPart)
      .zipPartitions(csr, hotHomeRdd, preservesPartitioning = true) { (mIt, cIt, hIt) =>
        val blk = cIt.next(); val hh = hIt.next()
        java.util.Arrays.sort(hh) // recomputation-stable layout
        val hot = hotBc.value
        val incoming = new Array[Array[Long]](nLoc)
        while (mIt.hasNext) {
          val (_, (q, ids)) = mIt.next()
          incoming(q) = ids
        }
        // receivers = sorted dedup of all incoming unique-dst tables — sorted
        // so the layout is recomputation-stable (see sortWithPerm scaladoc)
        var total = 0
        var q = 0
        while (q < nLoc) { if (incoming(q) != null) total += incoming(q).length; q += 1 }
        val all = new Array[Long](total)
        var w = 0
        q = 0
        while (q < nLoc) {
          val in = incoming(q)
          if (in != null) { System.arraycopy(in, 0, all, w, in.length); w += in.length }
          q += 1
        }
        java.util.Arrays.sort(all)
        val pos = new LongDoubleMap(math.max(total, 8))
        var ids = new Array[Long](math.max(total, 1024))
        var k = 0
        @inline def add(id: Long): Unit = {
          if (pos.getOrNaN(id).isNaN) {
            pos.put(id, k.toDouble)
            if (k == ids.length) ids = java.util.Arrays.copyOf(ids, k << 1)
            ids(k) = id; k += 1
          }
        }
        var i0 = 0
        while (i0 < total) { add(all(i0)); i0 += 1 }
        val nRecv = k
        var i = 0
        while (i < blk.srcs.length) { add(blk.srcs(i)); i += 1 }
        i = 0
        while (i < hh.length) { add(hh(i)); i += 1 }
        val idsT = java.util.Arrays.copyOf(ids, k)
        val srcPrIdx = new Array[Int](blk.srcs.length)
        i = 0
        while (i < blk.srcs.length) { srcPrIdx(i) = pos.getOrNaN(blk.srcs(i)).toInt; i += 1 }
        // locate hot vertices homed here (for the mirror broadcast)
        val hg = new Array[Int](hh.length); val hl = new Array[Int](hh.length)
        i = 0
        while (i < hh.length) {
          hg(i) = hot.getOrNaN(hh(i)).toInt
          hl(i) = pos.getOrNaN(hh(i)).toInt
          i += 1
        }
        val inIdxArr = new Array[Array[Int]](nLoc)
        q = 0
        while (q < nLoc) {
          val in = incoming(q)
          if (in != null) {
            val a = new Array[Int](in.length)
            var j = 0
            while (j < in.length) { a(j) = pos.getOrNaN(in(j)).toInt; j += 1 }
            inIdxArr(q) = a
          }
          q += 1
        }
        Iterator.single((VertexMeta(idsT, nRecv, srcPrIdx, hg, hl), inIdxArr))
      }.persist(StorageLevel.MEMORY_AND_DISK)
    vertsAndIdx.count()

    val verts: RDD[VertexMeta] =
      vertsAndIdx.mapPartitions(it => it.map(_._1), preservesPartitioning = true)
    val inIdx: RDD[Array[Array[Int]]] =
      vertsAndIdx.mapPartitions(it => it.map(_._2), preservesPartitioning = true)

    val nV = vertsAndIdx.map(_._1.ids.length.toLong).sum().toLong
    // free executor-side copies of the build-time broadcasts: every RDD that
    // reads them is materialized above. unpersist, NOT destroy — a lineage
    // recomputation (cache eviction under pressure, executor loss) replays
    // the closures, and an unpersisted broadcast is re-shipped from the
    // driver on demand where a destroyed one would crash the replay.
    hotBc.unpersist(blocking = false)
    hotDegBc.unpersist(blocking = false)
    PrGraph(csr, verts, inIdx, hotIds, n, numEdges, nV, Some(vertsAndIdx),
      weighted = weighted)
  }

  /**
   * Preprocessed-graph snapshot — the CSR-level analog of the reference's
   * WriteGraphMatBin/ReadGraphMatBin (`include/GMDP/...` via graph_converter):
   * persist the BUILT structures so later runs (or other sessions) skip
   * ingest+routing+layout entirely. One object file per partition for the
   * edge blocks and the vertex/incoming-index metadata, plus a driver-side
   * manifest with the global fields. `load` restores partition alignment by
   * an explicit partitionBy on the stored partition ids.
   */
  def save(g: PrGraph, path: String,
           store: SnapshotStore = HadoopSnapshotStore): Unit = {
    store.writeBlocks(
      g.csr.mapPartitionsWithIndex((p, it) => it.map(b => (p, b))), s"$path/csr")
    store.writeBlocks(
      g.meta.mapPartitionsWithIndex((p, it) => it.map(m => (p, m))), s"$path/meta")
    // manifest through the SAME FileSystem the blocks used: a java.nio local
    // write under an hdfs:// or s3a:// path would leave a half-written
    // snapshot (blocks remote, manifest missing)
    val hp = new org.apache.hadoop.fs.Path(s"$path/manifest.bin")
    val fs = hp.getFileSystem(
      g.csr.sparkContext.hadoopConfiguration)
    val oos = new java.io.ObjectOutputStream(fs.create(hp, true))
    try {
      oos.writeInt(g.numPartitions); oos.writeLong(g.numEdges)
      oos.writeLong(g.numVertices); oos.writeObject(g.hotIds)
      oos.writeBoolean(g.weighted)
    } finally oos.close()
  }

  def load(spark: SparkSession, path: String,
           store: SnapshotStore = HadoopSnapshotStore): PrGraph = {
    val sc = spark.sparkContext
    val hp = new org.apache.hadoop.fs.Path(s"$path/manifest.bin")
    val ois = new java.io.ObjectInputStream(
      hp.getFileSystem(sc.hadoopConfiguration).open(hp))
    val (n, nE, nV, hotIds, wtd) =
      try (ois.readInt(), ois.readLong(), ois.readLong(),
           ois.readObject().asInstanceOf[Array[Long]], ois.readBoolean())
      finally ois.close()
    val idPart = new IdPartitioner(n)
    // CRITICAL: cache ONE combined (csr, meta) RDD, not two. Caching the two
    // object files separately puts partition i's CSR block and its vertex
    // metadata on INDEPENDENT executors (both arrive via shuffles that, with
    // reduce-locality off, carry no location preference), and then every
    // superstep's zip task has conflicting cache preferences and remote-reads
    // one ~100s-of-MB deserialized block per partition per superstep — a
    // fetch that never shows in shuffle remoteBytesRead. Measured on the
    // 65M-edge snapshot: 2x4-core executors 21s -> 5s per 10 supersteps from
    // this one change; single-executor runs can't misalign, which is why the
    // bug only taxed multi-executor legs.
    val all: RDD[(CsrBlock, (VertexMeta, Array[Array[Int]]))] =
      store.readBlocks[CsrBlock](sc, s"$path/csr")
        .partitionBy(idPart)
        .zipPartitions(
          store.readBlocks[(VertexMeta, Array[Array[Int]])](sc, s"$path/meta")
            .partitionBy(idPart),
          preservesPartitioning = true) { (cIt, mIt) =>
            Iterator.single((cIt.next()._2, mIt.next()._2))
          }
        .persist(StorageLevel.MEMORY_AND_DISK)
    all.count()
    val csr = all.mapPartitions(it => it.map(_._1), preservesPartitioning = true)
    val meta = all.mapPartitions(it => it.map(_._2), preservesPartitioning = true)
    val verts = meta.mapPartitions(it => it.map(_._1), preservesPartitioning = true)
    val inIdx = meta.mapPartitions(it => it.map(_._2), preservesPartitioning = true)
    PrGraph(csr, verts, inIdx, hotIds, n, nE, nV, Some(meta), Some(all),
      weighted = wtd)
  }

  // ---- durable mid-algorithm checkpoint/resume ---------------------------
  //
  // See [[CsrCheckpoint]]. State is saved WITH its per-partition id layout
  // (one (partition, RankBlock) object file per partition), so resume can
  // VERIFY alignment against the live graph instead of trusting that the
  // caller rebuilt it identically — build() sorts every per-partition array
  // precisely so that a rebuild with the same numPartitions/keyShift/
  // hotDegree reproduces the layout deterministically (see sortWithPerm).

  private val metricLineRe =
    """\{"iteration":(\d+),"changed":(-?\d+),"millis":(\d+)\}""".r

  private def writeCheckpoint(g: PrGraph, cp: CsrCheckpoint, iter: Int,
      converged: Boolean, state: RDD[Array[Double]],
      metrics: Seq[IterationMetrics]): Unit = {
    val sc = g.csr.sparkContext
    val root = s"${cp.dir}/${cp.runId}"
    val statePath = s"$root/iter=$iter/state"
    // writeBlocks deletes half-written state from a crash before saving
    cp.store.writeBlocks(
      state.zipPartitions(g.verts, preservesPartitioning = true) { (rIt, vIt) =>
        val vm = vIt.next()
        Iterator.single((TaskContext.getPartitionId(), RankBlock(vm.ids, rIt.next())))
      }, statePath)
    // per-partition lineage: the static layout a resumed run must reproduce
    // (vertex/receiver/edge counts per partition) — written once per run
    if (!cp.store.exists(sc, s"$root/partitions.json")) {
      val rows = g.csr.zipPartitions(g.verts, preservesPartitioning = true) { (cIt, vIt) =>
        val blk = cIt.next(); val vm = vIt.next()
        var e = blk.hotEdgeSrcIdx.length
        var tp = 0
        while (tp < blk.edgeSrcIdx.length) {
          if (blk.edgeSrcIdx(tp) != null) e += blk.edgeSrcIdx(tp).length
          tp += 1
        }
        Iterator.single((TaskContext.getPartitionId(), vm.ids.length, vm.nRecv, e))
      }.collect().sortBy(_._1)
      cp.store.writeText(sc, s"$root/partitions.json", rows.map { case (p, v, r, e) =>
        s"""{"partition":$p,"vertices":$v,"receivers":$r,"edges":$e}"""
      }.mkString("[", ",", "]"))
    }
    cp.store.writeText(sc, s"$root/metrics.jsonl", metrics.map(m =>
      s"""{"iteration":${m.iteration},"changed":${m.changed},"millis":${m.millis}}""")
      .mkString("", "\n", "\n"))
    // the pointer commits the checkpoint — written LAST, so a crash during
    // any earlier write leaves the previous committed state resumable
    cp.store.writeText(sc, s"$root/latest.json",
      s"""{"iteration":$iter,"converged":$converged,"partitions":${g.numPartitions}}""")
  }

  /** None when no committed checkpoint exists; else (state aligned to this
    * graph's layout, iteration, converged, prior metrics). */
  private def readCheckpoint(g: PrGraph, cp: CsrCheckpoint)
      : Option[(RDD[Array[Double]], Int, Boolean, Vector[IterationMetrics])] = {
    val sc = g.csr.sparkContext
    val root = s"${cp.dir}/${cp.runId}"
    cp.store.readText(sc, s"$root/latest.json").map { txt =>
      val iter = """"iteration"\s*:\s*(\d+)""".r
        .findFirstMatchIn(txt).get.group(1).toInt
      val converged = txt.contains(""""converged":true""")
      // driver-side pre-check: a partition-count mismatch must fail with a
      // clear message, not an out-of-range shuffle key deep in a task
      """"partitions"\s*:\s*(\d+)""".r.findFirstMatchIn(txt).foreach { m =>
        require(m.group(1).toInt == g.numPartitions,
          s"checkpoint ${cp.runId}/iter=$iter does not align with this " +
          s"graph: saved with ${m.group(1)} partitions, graph has " +
          s"${g.numPartitions} (resume needs the same build parameters)")
      }
      val idPart = new IdPartitioner(g.numPartitions)
      val state = cp.store.readBlocks[RankBlock](sc, s"$root/iter=$iter/state")
        .partitionBy(idPart)
        .zipPartitions(g.verts, preservesPartitioning = true) { (lIt, vIt) =>
          val rb = lIt.next()._2; val vm = vIt.next()
          require(java.util.Arrays.equals(rb.ids, vm.ids),
            s"checkpoint ${cp.runId}/iter=$iter does not align with this " +
            "graph: resume needs the same edge set built with the same " +
            "numPartitions/keyShift/hotDegree (layouts are deterministic; " +
            "see build())")
          Iterator.single(rb.pr)
        }
      val metrics = cp.store.readText(sc, s"$root/metrics.jsonl").map {
        _.linesIterator.collect {
          case metricLineRe(i, c, m) if i.toInt <= iter =>
            IterationMetrics(i.toInt, c.toLong, m.toLong)
        }.toVector
      }.getOrElse(Vector.empty)
      (state, iter, converged, metrics)
    }
  }

  /** Dense rank vectors, one Array[Double] per partition, aligned to VertexMeta.ids. */
  private def initRanks(g: PrGraph): RDD[Array[Double]] =
    g.verts.mapPartitions(it => Iterator.single(Array.fill(it.next().ids.length)(0.3)),
      preservesPartitioning = true)

  /** Collect hot-vertex ranks (tiny) and broadcast — the per-superstep mirror. */
  private def hotMirror(g: PrGraph, ranks: RDD[Array[Double]]): Array[Double] = {
    if (g.hotIds.isEmpty) return Array.emptyDoubleArray
    val pairs = ranks.zipPartitions(g.verts) { (rIt, vIt) =>
      val pr = rIt.next(); val vm = vIt.next()
      Iterator.range(0, vm.hotHomeGlobal.length)
        .map(i => (vm.hotHomeGlobal(i), pr(vm.hotHomeLocal(i))))
    }.collect()
    val arr = new Array[Double](g.hotIds.length)
    pairs.foreach { case (gIdx, v) => arr(gIdx) = v }
    arr
  }

  /** The gather (⊗ + per-target pre-sum ⊕): emits (targetPartition,
    * (sourcePartition, packed partial sums aligned to outIds)). */
  private def gatherPhase(ranks: RDD[Array[Double]], g: PrGraph,
                          hotPr: Broadcast[Array[Double]]): RDD[(Int, (Int, Array[Double]))] =
    ranks.zipPartitions(g.csr, g.verts, preservesPartitioning = false) { (rIt, cIt, vIt) =>
      val pr = rIt.next(); val blk = cIt.next(); val vm = vIt.next()
      val p = TaskContext.getPartitionId()
      val nS = blk.srcs.length
      val contrib = new Array[Double](nS)
      var i = 0
      while (i < nS) {
        contrib(i) = pr(vm.srcPrIdx(i)) * blk.invDeg(i)
        i += 1
      }
      val out = new Array[Array[Double]](blk.outIds.length)
      var tp = 0
      while (tp < blk.outIds.length) {
        val ids = blk.outIds(tp)
        if (ids != null) {
          val vals = new Array[Double](ids.length)
          val es = blk.edgeSrcIdx(tp); val eo = blk.edgeOutIdx(tp)
          var e = 0
          while (e < es.length) { vals(eo(e)) += contrib(es(e)); e += 1 }
          out(tp) = vals
        }
        tp += 1
      }
      // hot-shard edges: contrib from the broadcast mirror; target bucket is
      // this partition itself (they were routed here by dst)
      if (blk.hotEdgeSrcIdx.length > 0) {
        val hp = hotPr.value
        val hc = new Array[Double](blk.hotLocal.length)
        i = 0
        while (i < hc.length) {
          hc(i) = hp(blk.hotLocal(i)) * blk.hotLocalInvDeg(i)
          i += 1
        }
        if (out(p) == null) out(p) = new Array[Double](
          if (blk.outIds(p) == null) 0 else blk.outIds(p).length)
        val vals = out(p)
        val hs = blk.hotEdgeSrcIdx; val ho = blk.hotEdgeOutIdx
        var e = 0
        while (e < hs.length) { vals(ho(e)) += hc(hs(e)); e += 1 }
      }
      Iterator.range(0, out.length).filter(out(_) != null).map(tp => (tp, (p, out(tp))))
    }

  // ---- split exchange --------------------------------------------------
  //
  // A partition's contribution to ITSELF is most of the exchange whenever the
  // partitioning has locality (keyShift co-location makes it ~all of it), and
  // shipping it through the shuffle pays serialize + disk write + read even
  // when the bytes never leave the executor. So each superstep SPLITS:
  //  - the self-contribution stays in the lazily-persisted gather output
  //    (deserialized MEMORY_AND_DISK = the live arrays, zero-copy) and the
  //    apply stage reads it straight from the block cache;
  //  - only tp != p records enter the shuffle, so cross-JVM bytes equal the
  //    true partition cut.
  // The caller owns the returned `gathered` handle and unpersists it once the
  // superstep's consumer is materialized. Placement stays process-local under
  // the engine confs (see engineConfs): reduce-locality off makes the cached
  // graph blocks the ONLY preferred location, so map output, block cache and
  // apply task never separate.

  /**
   * One LAZY superstep for the fixed-iteration path: gather → split exchange
   * → dense apply, with in-degree-0 slots pinned to their initial 0.3 (they
   * never receive, so the previous vector need not be read). The input rank
   * RDD is consumed exactly ONCE, which lets the driver chain K supersteps
   * into a single pipelined job — no per-superstep count, no per-superstep
   * job-scheduling overhead. Returns (newRanks, gathered handle).
   */
  private def superstepLazy(g: PrGraph, ranks: RDD[Array[Double]],
                            alpha: Double): (RDD[Array[Double]], RDD[_]) = {
    val idPart = new IdPartitioner(g.numPartitions)
    val gathered = gatherPhase(ranks, g, null)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val remote = gathered.mapPartitionsWithIndex(
        (p, it) => it.filter(_._1 != p), preservesPartitioning = false)
      .partitionBy(idPart)
    val next = remote.zipPartitions(gathered, g.meta, preservesPartitioning = true) {
      (rIt, lIt, mIt) =>
        val (vm, inIdx) = mIt.next()
        val p = TaskContext.getPartitionId()
        val acc = new Array[Double](vm.nRecv)
        @inline def fold(q: Int, vals: Array[Double]): Unit = {
          val idx = inIdx(q)
          var i = 0
          while (i < vals.length) { acc(idx(i)) += vals(i); i += 1 }
        }
        lIt.foreach { case (tp, (q, vals)) => if (tp == p) fold(q, vals) }
        rIt.foreach { case (_, (q, vals)) => fold(q, vals) }
        val nV = vm.ids.length
        val newPr = new Array[Double](nV)
        var i = 0
        while (i < vm.nRecv) { newPr(i) = alpha + (1.0 - alpha) * acc(i); i += 1 }
        while (i < nV) { newPr(i) = 0.3; i += 1 } // in-degree-0: keep init
        Iterator.single(newPr)
    }
    (next, gathered)
  }

  /** One superstep: gather → split exchange → dense apply. Returns the new
    * rank vectors, the gathered handle (caller unpersists after the superstep
    * materializes) and (when `tol` >= 0) counts vertices that moved more than
    * tol. `hotPr` is the per-superstep hub mirror (null on hubless graphs,
    * never dereferenced then); the caller owns it too. */
  private def superstep(g: PrGraph, ranks: RDD[Array[Double]], alpha: Double,
                        tol: Double,
                        changedAcc: Option[org.apache.spark.util.LongAccumulator],
                        hotPr: Broadcast[Array[Double]])
  : (RDD[Array[Double]], RDD[_]) = {
    val idPart = new IdPartitioner(g.numPartitions)
    val gathered = gatherPhase(ranks, g, hotPr)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val remote = gathered.mapPartitionsWithIndex(
        (p, it) => it.filter(_._1 != p), preservesPartitioning = false)
      .partitionBy(idPart)
    val next = remote.zipPartitions(gathered, g.meta, ranks, preservesPartitioning = true) {
      (rIt, lIt, mIt, oIt) =>
        val (vm, inIdx) = mIt.next(); val old = oIt.next()
        val p = TaskContext.getPartitionId()
        val acc = new Array[Double](vm.nRecv)
        @inline def fold(q: Int, vals: Array[Double]): Unit = {
          val idx = inIdx(q)
          var i = 0
          while (i < vals.length) { acc(idx(i)) += vals(i); i += 1 }
        }
        lIt.foreach { case (tp, (q, vals)) => if (tp == p) fold(q, vals) }
        rIt.foreach { case (_, (q, vals)) => fold(q, vals) }
        val nV = vm.ids.length
        val newPr = new Array[Double](nV)
        var changed = 0L
        var i = 0
        while (i < vm.nRecv) {
          val v = alpha + (1.0 - alpha) * acc(i)
          newPr(i) = v
          if (tol >= 0 && math.abs(v - old(i)) > tol) changed += 1
          i += 1
        }
        while (i < nV) { newPr(i) = old(i); i += 1 } // in-degree-0: never receive
        // accumulator updated inside a TRANSFORMATION: a task retry or
        // speculative duplicate can double-count moved vertices. That error
        // is one-sided by construction — the stop rule is `changed == 0`, and
        // duplication can only inflate a nonzero count (delaying convergence
        // by one extra superstep), never fabricate zero from nonzero — so
        // correctness of the fixpoint is unaffected.
        changedAcc.foreach(_.add(changed))
        Iterator.single(newPr)
    }
    (next, gathered)
  }

  private def materialize(g: PrGraph, ranks: RDD[Array[Double]]): RDD[RankBlock] = {
    val out = ranks.zipPartitions(g.verts, preservesPartitioning = true) { (rIt, vIt) =>
      Iterator.single(RankBlock(vIt.next().ids, rIt.next()))
    }.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    out
  }

  /**
   * GraphMat-semantics PageRank, fixed iteration count: pr' = α + (1−α)·Σ
   * pr/outdeg applied to message receivers only; in-degree-0 vertices never
   * receive and keep their initial 0.3 (`src/PageRank.cpp:81-161`,
   * apply-on-receive per `GraphMatRuntime.h:195-225`).
   */
  def pageRank(g: PrGraph, alpha: Double, iterations: Int,
               checkpointEvery: Int = 4): RDD[RankBlock] = {
    if (g.hotIds.isEmpty) {
      // hub-less graph: chain all supersteps LAZILY — one pipelined job per
      // `checkpointEvery`-superstep segment instead of 2 jobs per superstep
      // (valid because the lazy superstep consumes its input exactly once;
      // see superstepLazy). A segment barrier is a BARE count(): completed
      // shuffle-map stages are skipped by later jobs (shuffle-file reuse),
      // so the barrier serializes nothing — its only job is to bound how
      // many per-superstep gathered blocks are live at once. All but the
      // NEWEST gathered block can then be freed: superstep k+1's stage may
      // re-run apply_k (a narrow pass over shuffle_k's files + gathered_k),
      // but gathered_{<k}'s consumers are behind existing shuffle files and
      // never re-read. An executor loss degrades to lineage recompute —
      // unpersist does not truncate lineage.
      var ranks = initRanks(g)
      var it = 0
      var pending = List.empty[RDD[_]]
      var lastCp: Option[RDD[Array[Double]]] = None
      val segment = math.max(1, checkpointEvery)
      // the bare count() barrier does NOT truncate lineage; without a real
      // checkpoint the DAG deepens linearly with `iterations` (segment jobs
      // re-walk the whole chain, executor loss cascades recomputation toward
      // iteration 0). Truncate every `lineageEvery` supersteps.
      val lineageEvery = math.max(segment, 32 / segment * segment)
      while (it < iterations) {
        val (nr, gth) = superstepLazy(g, ranks, alpha)
        ranks = nr
        pending ::= gth
        it += 1
        if (it % segment == 0 && it < iterations) {
          if (it % lineageEvery == 0) {
            ranks.persist(StorageLevel.MEMORY_AND_DISK)
            ranks.localCheckpoint()
            ranks.count()
            // lineage now starts at `ranks`: every older gathered block and
            // the previous checkpoint are unreachable — free them all
            pending.foreach(_.unpersist(blocking = false))
            pending = Nil
            lastCp.foreach(_.unpersist(blocking = false))
            lastCp = Some(ranks)
          } else {
            ranks.count()
            pending match {
              case keep :: olds =>
                olds.foreach(_.unpersist(blocking = false))
                pending = List(keep)
              case Nil =>
            }
          }
        }
      }
      val out = materialize(g, ranks)
      pending.foreach(_.unpersist(blocking = false))
      lastCp.foreach(_.unpersist(blocking = false))
      out
    } else {
      // hub graphs need the per-superstep mirror broadcast (a driver action),
      // so each superstep is materialized
      val sc = g.csr.sparkContext
      var ranks = initRanks(g).persist(StorageLevel.MEMORY_AND_DISK)
      ranks.count()
      var prev = ranks
      var it = 0
      val iterLog = sys.env.contains("SPARK_GRAFT_ITERLOG")
      while (it < iterations) {
        val t0 = if (iterLog) System.nanoTime() else 0L
        val hotPr = sc.broadcast(hotMirror(g, ranks))
        val (nr, gth) = superstep(g, ranks, alpha, tol = -1.0, changedAcc = None,
            hotPr)
        val newRanks = nr.persist(StorageLevel.MEMORY_AND_DISK)
        if ((it + 1) % checkpointEvery == 0) newRanks.localCheckpoint()
        newRanks.count()
        // free the mirror's executor copies and the superstep's gathered
        // blocks now that the superstep is materialized (unpersist, not
        // destroy — see build()); without this a long run accumulates one
        // broadcast + one gather snapshot per superstep until GC
        gth.unpersist(blocking = false)
        hotPr.unpersist(blocking = false)
        if (iterLog) println(f"[iter] superstep $it: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        prev.unpersist(blocking = false)
        prev = newRanks
        ranks = newRanks
        it += 1
      }
      val out = materialize(g, ranks)
      ranks.unpersist(blocking = false)
      out
    }
  }

  /**
   * Personalized PageRank on the CSR path — the same gather/split-exchange
   * as `pageRank` with a per-vertex teleport base instead of the constant α:
   * pr' = α·s(v) + (1−α)·Σ pr/outdeg, init pr = s, s = 1 on the source set.
   * Never-receivers hold α·s(v) (their Σ is empty), so the apply reads the
   * cached base vector, not the previous ranks — the loop therefore keeps
   * exactly two rank generations plus one K-doubles base block per
   * partition live. Matches algos.PageRank.personalized within ⊕ order
   * (CoreMetricsSpec parity; g_ppr_csr shares g_ppr's unrolled oracle).
   */
  def personalizedPageRank(g: PrGraph, isSource: Long => Boolean,
                           alpha: Double, iterations: Int,
                           checkpointEvery: Int = 8): RDD[RankBlock] = {
    val sc = g.csr.sparkContext
    val idPart = new IdPartitioner(g.numPartitions)
    val base = g.verts.mapPartitions({ it =>
      val vm = it.next()
      val b = new Array[Double](vm.ids.length)
      var i = 0
      while (i < b.length) { if (isSource(vm.ids(i))) b(i) = 1.0; i += 1 }
      Iterator.single(b)
    }, preservesPartitioning = true).persist(StorageLevel.MEMORY_AND_DISK)
    var ranks: RDD[Array[Double]] = base // init pr0 = s
    var prev: RDD[Array[Double]] = null
    var it = 0
    while (it < iterations) {
      val hotPr = sc.broadcast(hotMirror(g, ranks))
      val gathered = gatherPhase(ranks, g, hotPr)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val remote = gathered.mapPartitionsWithIndex(
          (p, itr) => itr.filter(_._1 != p), preservesPartitioning = false)
        .partitionBy(idPart)
      val nr = remote.zipPartitions(gathered, g.meta, base,
          preservesPartitioning = true) { (rIt, lIt, mIt, bIt) =>
        val (vm, inIdx) = mIt.next(); val b = bIt.next()
        val p = TaskContext.getPartitionId()
        val acc = new Array[Double](vm.nRecv)
        @inline def fold(q: Int, vals: Array[Double]): Unit = {
          val idx = inIdx(q)
          var i = 0
          while (i < vals.length) { acc(idx(i)) += vals(i); i += 1 }
        }
        lIt.foreach { case (tp, (q, vals)) => if (tp == p) fold(q, vals) }
        rIt.foreach { case (_, (q, vals)) => fold(q, vals) }
        val nV = vm.ids.length
        val newPr = new Array[Double](nV)
        var i = 0
        while (i < vm.nRecv) {
          newPr(i) = alpha * b(i) + (1.0 - alpha) * acc(i); i += 1
        }
        while (i < nV) { newPr(i) = alpha * b(i); i += 1 }
        Iterator.single(newPr)
      }
      val newRanks = nr.persist(StorageLevel.MEMORY_AND_DISK)
      if ((it + 1) % checkpointEvery == 0) newRanks.localCheckpoint()
      newRanks.count()
      gathered.unpersist(blocking = false)
      hotPr.unpersist(blocking = false)
      if (prev != null) prev.unpersist(blocking = false)
      prev = newRanks
      ranks = newRanks
      it += 1
    }
    val out = materialize(g, ranks)
    if (prev != null) prev.unpersist(blocking = false)
    base.unpersist(blocking = false)
    out
  }

  /**
   * PageRank until convergence, GraphMat stop rule: terminate when no vertex
   * moved by more than `tol` (`PR::operator!=`, `src/PageRank.cpp:43-45`;
   * land-reduce `GraphMatRuntime.h:208-226` — here a Spark accumulator).
   * Returns (final ranks, supersteps run). With `cp` set, the state is
   * durably checkpointed every `cp.every` supersteps (and at termination),
   * and a run finding a committed checkpoint under `cp.dir/cp.runId` RESUMES
   * from it — the returned superstep count is then the GLOBAL count
   * including pre-crash supersteps, and a resumed-after-interrupt run
   * produces bit-identical ranks to an uninterrupted one (the state is the
   * exact doubles; supersteps are deterministic).
   */
  def pageRankConverged(g: PrGraph, alpha: Double = 0.3, tol: Double = 1e-5,
                        maxIterations: Int = 200,
                        cp: Option[CsrCheckpoint] = None): (RDD[RankBlock], Int) = {
    val sc = g.csr.sparkContext
    var it = 0
    var converged = false
    var metrics = Vector.empty[IterationMetrics]
    var ranks = (cp.flatMap(readCheckpoint(g, _)) match {
      case Some((r, i, conv, m)) => it = i; converged = conv; metrics = m; r
      case None => initRanks(g)
    }).persist(StorageLevel.MEMORY_AND_DISK)
    ranks.count()
    var prev = ranks
    while (!converged && it < maxIterations) {
      val t0 = System.nanoTime()
      val changedAcc = sc.longAccumulator(s"changed-$it")
      val hotPr = if (g.hotIds.isEmpty) null
                  else sc.broadcast(hotMirror(g, ranks))
      val (nr, gth) = superstep(g, ranks, alpha, tol, Some(changedAcc), hotPr)
      val newRanks = nr.persist(StorageLevel.MEMORY_AND_DISK)
      newRanks.count()
      gth.unpersist(blocking = false)
      if (hotPr != null) hotPr.unpersist(blocking = false)
      prev.unpersist(blocking = false)
      prev = newRanks
      ranks = newRanks
      it += 1
      converged = changedAcc.value == 0L
      cp.foreach { c =>
        metrics :+= IterationMetrics(it, changedAcc.value,
          (System.nanoTime() - t0) / 1000000)
        if (it % c.every == 0 || converged || it >= maxIterations)
          writeCheckpoint(g, c, it, converged, ranks, metrics)
      }
    }
    val out = materialize(g, ranks)
    ranks.unpersist(blocking = false)
    (out, it)
  }

  // ---- the (min, +) semiring on the same static exchange -----------------
  //
  // GraphMat's core claim is vertex-programs-as-semiring-SpMV
  // (`include/GMDP/...`, VLDB'15 §3). The PageRank path above is the (+, ×)
  // instance; this is the (min, +) instance over the IDENTICAL build-time
  // structures — same routed CSR blocks, same split exchange, same hub
  // mirror. Gather: out(o) = min(out(o), v(src) + delta); the exchange ships
  // the same packed Array[Double] records (absent contributions = +∞, the
  // semiring zero); apply: min(old, acc) with a changed count; loop to the
  // exact fixpoint. Two bundled users: HashMin connected components
  // (delta = 0, bidirectional edges — `src/ConnectedComponents.cpp`) and BFS
  // levels (delta = 1, out-edges — `src/BFS.cpp:40-156`). Unlike PageRank's
  // float ⊕, min is idempotent, so a task retry or speculative duplicate
  // cannot corrupt the fixpoint at all; the accumulator argument in
  // `superstep` applies one-sided here too.
  //
  // Values ride the rank plumbing as Doubles; vertex LABELS (CC) must
  // therefore be exact in a Double — enforced as ids < 2^53 at init.

  // Internal per-superstep state: values plus "did any vertex here change
  // last superstep". Because min is MONOTONE and IDEMPOTENT, a partition
  // whose vertices are all unchanged would re-send contributions every
  // receiver has already folded — min(old, same) = old — so it can skip its
  // whole gather: a partition-granularity sparse frontier (GraphMat's
  // ACTIVE_ONLY sparse vectors, `src/BFS.cpp` frontier semantics, at block
  // grain). On single-source BFS/SSSP most partitions go quiet after the
  // first superstep and each level touches only the frontier's blocks.
  // The hot-mirror part is gated separately (`hotActive`): hub sources are
  // HOMED elsewhere, so their shard edges must fire when the MIRROR changed,
  // even in otherwise-quiet partitions.
  private def gatherMinPhase(vals: RDD[(Array[Double], Boolean)], g: PrGraph,
                             delta: Double,
                             hotV: Broadcast[Array[Double]], hotActive: Boolean,
                             useW: Boolean): RDD[(Int, (Int, Array[Double]))] =
    vals.zipPartitions(g.csr, g.verts, preservesPartitioning = false) { (rIt, cIt, vIt) =>
      val (v, act) = rIt.next(); val blk = cIt.next(); val vm = vIt.next()
      val p = TaskContext.getPartitionId()
      val out = new Array[Array[Double]](blk.outIds.length)
      // unweighted: fold the uniform delta into the per-src contribution once;
      // weighted: contribution is per-EDGE (v(src) + w(e)), so keep v(src)
      val base = if (useW) 0.0 else delta
      if (act) {
        val nS = blk.srcs.length
        val contrib = new Array[Double](nS)
        var i = 0
        while (i < nS) { contrib(i) = v(vm.srcPrIdx(i)) + base; i += 1 }
        var tp = 0
        while (tp < blk.outIds.length) {
          val ids = blk.outIds(tp)
          if (ids != null) {
            val o = Array.fill(ids.length)(Double.PositiveInfinity)
            val es = blk.edgeSrcIdx(tp); val eo = blk.edgeOutIdx(tp)
            val ws = if (useW) blk.edgeW(tp) else null
            var e = 0
            while (e < es.length) {
              val c = if (ws == null) contrib(es(e)) else contrib(es(e)) + ws(e)
              if (c < o(eo(e))) o(eo(e)) = c
              e += 1
            }
            out(tp) = o
          }
          tp += 1
        }
      }
      if (hotActive && blk.hotEdgeSrcIdx.length > 0) {
        val hp = hotV.value
        val hc = new Array[Double](blk.hotLocal.length)
        var i = 0
        while (i < hc.length) { hc(i) = hp(blk.hotLocal(i)) + base; i += 1 }
        if (out(p) == null) out(p) = Array.fill(
          if (blk.outIds(p) == null) 0 else blk.outIds(p).length)(Double.PositiveInfinity)
        val o = out(p)
        val hs = blk.hotEdgeSrcIdx; val ho = blk.hotEdgeOutIdx
        val hw = if (useW) blk.hotEdgeW else null
        var e = 0
        while (e < hs.length) {
          val c = if (hw == null) hc(hs(e)) else hc(hs(e)) + hw(e)
          if (c < o(ho(e))) o(ho(e)) = c
          e += 1
        }
      }
      Iterator.range(0, out.length).filter(out(_) != null).map(tp => (tp, (p, out(tp))))
    }

  private def minStep(g: PrGraph, vals: RDD[(Array[Double], Boolean)], delta: Double,
                      changedAcc: org.apache.spark.util.LongAccumulator,
                      hotV: Broadcast[Array[Double]], hotActive: Boolean,
                      useW: Boolean): (RDD[(Array[Double], Boolean)], RDD[_]) = {
    val idPart = new IdPartitioner(g.numPartitions)
    val gathered = gatherMinPhase(vals, g, delta, hotV, hotActive, useW)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val remote = gathered.mapPartitionsWithIndex(
        (p, it) => it.filter(_._1 != p), preservesPartitioning = false)
      .partitionBy(idPart)
    val next = remote.zipPartitions(gathered, g.meta, vals, preservesPartitioning = true) {
      (rIt, lIt, mIt, oIt) =>
        val (vm, inIdx) = mIt.next(); val old = oIt.next()._1
        val p = TaskContext.getPartitionId()
        val acc = Array.fill(vm.nRecv)(Double.PositiveInfinity)
        @inline def fold(q: Int, vs: Array[Double]): Unit = {
          val idx = inIdx(q)
          var i = 0
          while (i < vs.length) { if (vs(i) < acc(idx(i))) acc(idx(i)) = vs(i); i += 1 }
        }
        lIt.foreach { case (tp, (q, vs)) => if (tp == p) fold(q, vs) }
        rIt.foreach { case (_, (q, vs)) => fold(q, vs) }
        val nV = vm.ids.length
        val out = new Array[Double](nV)
        var changed = 0L
        var i = 0
        while (i < vm.nRecv) {
          val nv = if (acc(i) < old(i)) acc(i) else old(i)
          out(i) = nv
          if (nv < old(i)) changed += 1
          i += 1
        }
        while (i < nV) { out(i) = old(i); i += 1 }
        changedAcc.add(changed)
        Iterator.single((out, changed > 0L))
    }
    (next, gathered)
  }

  /** Run the (min, +) propagation from `init` to its exact fixpoint.
    * Returns (value blocks, supersteps run). Vertices never reached keep
    * their init value (+∞ for single-source inits). With `cp`, state is
    * durably checkpointed and a committed checkpoint is RESUMED (see
    * [[CsrCheckpoint]]); only VALUES are saved — resume re-activates every
    * partition, which is sound because min is monotone and idempotent
    * (re-sent contributions fold to the values already held), so a resumed
    * run reaches the identical fixpoint with identical changed counts, at
    * the cost of one dense gather on its first superstep. */
  def minFixpoint(g: PrGraph, init: RDD[Array[Double]], delta: Double,
                  maxIterations: Int = 1 << 20,
                  useWeights: Boolean = false,
                  cp: Option[CsrCheckpoint] = None): (RDD[RankBlock], Int) = {
    require(!useWeights || g.weighted,
      "weighted (min,+) needs build(..., weighted = true)")
    val sc = g.csr.sparkContext
    var it = 0
    var converged = false
    var metrics = Vector.empty[IterationMetrics]
    // superstep 0 marks every partition active (correct for any init, and —
    // see scaladoc — for any RESUMED state); thereafter a partition stays
    // active only while its vertices change
    var vals = (cp.flatMap(readCheckpoint(g, _)) match {
      case Some((r, i, conv, m)) => it = i; converged = conv; metrics = m; r
      case None => init
    }).mapPartitions(x => x.map(a => (a, true)), preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    vals.count()
    var prev = vals
    // the hub MIRROR's own frontier: hot shard edges fire only on supersteps
    // where some hot vertex's value actually moved (compared driver-side —
    // the mirror is tiny by construction)
    var prevHot: Array[Double] = null
    while (!converged && it < maxIterations) {
      val t0 = System.nanoTime()
      val changedAcc = sc.longAccumulator(s"min-changed-$it")
      var hotActive = false
      val hotV = if (g.hotIds.isEmpty) null
                 else {
                   val cur = hotMirror(g, vals.mapPartitions(
                     it => it.map(_._1), preservesPartitioning = true))
                   hotActive = prevHot == null || !java.util.Arrays.equals(prevHot, cur)
                   prevHot = cur
                   sc.broadcast(cur)
                 }
      val (nv, gth) = minStep(g, vals, delta, changedAcc, hotV, hotActive, useWeights)
      val newVals = nv.persist(StorageLevel.MEMORY_AND_DISK)
      // long-diameter graphs (chains) run many supersteps: bound lineage
      if ((it + 1) % 16 == 0) newVals.localCheckpoint()
      newVals.count()
      gth.unpersist(blocking = false)
      if (hotV != null) hotV.unpersist(blocking = false)
      prev.unpersist(blocking = false)
      prev = newVals
      vals = newVals
      it += 1
      converged = changedAcc.value == 0L
      cp.foreach { c =>
        metrics :+= IterationMetrics(it, changedAcc.value,
          (System.nanoTime() - t0) / 1000000)
        if (it % c.every == 0 || converged || it >= maxIterations)
          writeCheckpoint(g, c, it, converged,
            vals.mapPartitions(x => x.map(_._1), preservesPartitioning = true),
            metrics)
      }
    }
    val out = materialize(g, vals.mapPartitions(
      it => it.map(_._1), preservesPartitioning = true))
    vals.unpersist(blocking = false)
    (out, it)
  }

  /** HashMin connected components on the (min, +) kernel: every vertex
    * starts as its own label and adopts the minimum label reachable along
    * the graph's edges. For the reference's WEAK components semantics
    * (`src/ConnectedComponents.cpp`; undirected ⊕=min), build the PrGraph on
    * a bidirectional edge set (e.g. `LinkGraph.undirected`). */
  def connectedComponents(g: PrGraph, maxIterations: Int = 1 << 20,
                          cp: Option[CsrCheckpoint] = None): (RDD[RankBlock], Int) = {
    val init = g.verts.mapPartitions({ it =>
      val vm = it.next()
      val a = new Array[Double](vm.ids.length)
      var i = 0
      while (i < a.length) {
        require(vm.ids(i) < (1L << 53) && vm.ids(i) > -(1L << 53),
          s"vertex id ${vm.ids(i)} not exact in a Double label")
        a(i) = vm.ids(i).toDouble
        i += 1
      }
      Iterator.single(a)
    }, preservesPartitioning = true)
    minFixpoint(g, init, delta = 0.0, maxIterations, cp = cp)
  }

  /** BFS levels from `source` on the (min, +) kernel (delta = 1 along
    * out-edges). Unreached vertices keep +∞ (the column engine's -1 analog). */
  def bfs(g: PrGraph, source: Long, maxIterations: Int = 1 << 20,
          cp: Option[CsrCheckpoint] = None): (RDD[RankBlock], Int) = {
    minFixpoint(g, singleSourceInit(g, source), delta = 1.0, maxIterations,
      cp = cp)
  }

  /** Single-source shortest paths on the weighted (min, +) kernel: the
    * Bellman-Ford-shaped fixpoint of dist(d) = min(dist(d), dist(s) + w(s,d))
    * along out-edges (reference `src/SSSP.cpp`; requires nonnegative weights
    * for the fixpoint to be the true distances). Needs
    * `build(..., weighted = true)`; unreached vertices keep +∞. */
  def sssp(g: PrGraph, source: Long, maxIterations: Int = 1 << 20,
           cp: Option[CsrCheckpoint] = None): (RDD[RankBlock], Int) = {
    minFixpoint(g, singleSourceInit(g, source), delta = 0.0, maxIterations,
      useWeights = true, cp = cp)
  }

  // ---- the (mode, ·) label-propagation pass on the same static exchange --
  //
  // North-rule community label propagation (`algos/Algorithms.scala`
  // LabelPropagation is the semantics reference): every superstep each
  // vertex adopts the most frequent label among its neighbors, ties to the
  // SMALLER label, keeping its label when it has no neighbors; run for a
  // caller-fixed iteration budget (LP can oscillate) with early stop at the
  // exact no-label-moved fixpoint. The ⊕ (mode-of-labels) is not a one-slot
  // commutative fold, so the exchange record generalizes from one packed
  // Double per unique dst to a packed label HISTOGRAM per unique dst:
  // (dst slot, label, count) triples, run-length-encoded after a counting
  // sort by slot. Pre-aggregation still bounds hub fan-in structurally: a
  // receiver folds at most (n partitions × its distinct incoming labels)
  // partials, never one record per edge. Unlike the (min,+) path every
  // superstep is dense — mode is recomputed from ALL neighbor messages, so
  // there is no idempotent fold to skip quiet partitions with (the column
  // engine is ALL_VERTICES here too). Labels ride as exact-integer Doubles
  // (ids < 2^53, enforced at init).

  /** In-place quicksort of `lab[from,to)` ascending, carrying `cnt` along.
    * Insertion sort below 24 elements; receivers' per-vertex label segments
    * are usually tiny, hubs get the O(k log k) path. */
  private def sortPaired(lab: Array[Double], cnt: Array[Int],
                         from: Int, to: Int): Unit = {
    if (to - from < 2) return
    if (to - from <= 24) {
      var i = from + 1
      while (i < to) {
        val l = lab(i); val c = cnt(i)
        var j = i - 1
        while (j >= from && lab(j) > l) {
          lab(j + 1) = lab(j); cnt(j + 1) = cnt(j); j -= 1
        }
        lab(j + 1) = l; cnt(j + 1) = c
        i += 1
      }
      return
    }
    val pivot = lab(from + (to - from) / 2)
    var i = from; var j = to - 1
    while (i <= j) {
      while (lab(i) < pivot) i += 1
      while (lab(j) > pivot) j -= 1
      if (i <= j) {
        val tl = lab(i); lab(i) = lab(j); lab(j) = tl
        val tc = cnt(i); cnt(i) = cnt(j); cnt(j) = tc
        i += 1; j -= 1
      }
    }
    sortPaired(lab, cnt, from, j + 1)
    sortPaired(lab, cnt, i, to)
  }

  /** LP gather: per target partition, this partition's partial label
    * histogram — parallel arrays (dst slot, label, count), slot-ascending,
    * labels RLE'd within a slot. Hot-shard edges contribute the broadcast
    * mirror's labels into this partition's own bucket, exactly like the
    * PageRank gather. */
  private def gatherLabelPhase(labels: RDD[Array[Double]], g: PrGraph,
      hotL: Broadcast[Array[Double]])
      : RDD[(Int, (Int, (Array[Int], Array[Double], Array[Int])))] =
    labels.zipPartitions(g.csr, g.verts, preservesPartitioning = false) { (rIt, cIt, vIt) =>
      val lab = rIt.next(); val blk = cIt.next(); val vm = vIt.next()
      val p = TaskContext.getPartitionId()
      val nS = blk.srcs.length
      val srcLab = new Array[Double](nS)
      var i0 = 0
      while (i0 < nS) { srcLab(i0) = lab(vm.srcPrIdx(i0)); i0 += 1 }
      Iterator.range(0, blk.outIds.length).flatMap { tp =>
        val ids = blk.outIds(tp)
        val nHot = if (tp == p) blk.hotEdgeSrcIdx.length else 0
        if (ids == null) Iterator.empty
        else {
          val es = blk.edgeSrcIdx(tp); val eo = blk.edgeOutIdx(tp)
          val m = es.length + nHot
          if (m == 0) Iterator.empty
          else {
            val nSlots = ids.length
            // counting sort of the edge labels by dst slot
            val off = new Array[Int](nSlots + 1)
            var e = 0
            while (e < es.length) { off(eo(e) + 1) += 1; e += 1 }
            if (nHot > 0) {
              val ho = blk.hotEdgeOutIdx
              e = 0
              while (e < ho.length) { off(ho(e) + 1) += 1; e += 1 }
            }
            var i = 1
            while (i <= nSlots) { off(i) += off(i - 1); i += 1 }
            val fill = java.util.Arrays.copyOf(off, nSlots)
            val labAt = new Array[Double](m)
            e = 0
            while (e < es.length) {
              val slot = eo(e); labAt(fill(slot)) = srcLab(es(e)); fill(slot) += 1
              e += 1
            }
            if (nHot > 0) {
              val hl = hotL.value; val hs = blk.hotEdgeSrcIdx; val ho = blk.hotEdgeOutIdx
              e = 0
              while (e < hs.length) {
                val slot = ho(e); labAt(fill(slot)) = hl(blk.hotLocal(hs(e))); fill(slot) += 1
                e += 1
              }
            }
            // RLE per slot after an in-slot sort
            val pc = new IntPairBuf // (slot, count)
            val lv = new DblBuf     // label per run
            var slot = 0
            while (slot < nSlots) {
              val a = off(slot); val b = off(slot + 1)
              if (b > a) {
                java.util.Arrays.sort(labAt, a, b)
                var j = a
                while (j < b) {
                  var k = j + 1
                  while (k < b && labAt(k) == labAt(j)) k += 1
                  pc.add(slot, k - j); lv.add(labAt(j))
                  j = k
                }
              }
              slot += 1
            }
            Iterator.single((tp, (p, (pc.trimA, lv.trim, pc.trimB))))
          }
        }
      }
    }

  private def labelStep(g: PrGraph, labels: RDD[Array[Double]],
      changedAcc: org.apache.spark.util.LongAccumulator,
      hotL: Broadcast[Array[Double]]): (RDD[Array[Double]], RDD[_]) = {
    val idPart = new IdPartitioner(g.numPartitions)
    val gathered = gatherLabelPhase(labels, g, hotL)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val remote = gathered.mapPartitionsWithIndex(
        (p, it) => it.filter(_._1 != p), preservesPartitioning = false)
      .partitionBy(idPart)
    val next = remote.zipPartitions(gathered, g.meta, labels, preservesPartitioning = true) {
      (rIt, lIt, mIt, oIt) =>
        val (vm, inIdx) = mIt.next(); val old = oIt.next()
        val p = TaskContext.getPartitionId()
        // collect (recvIdx, label, count) from every source partition
        val rc = new IntPairBuf // (recvIdx, count)
        val lb = new DblBuf
        @inline def fold(q: Int, t: (Array[Int], Array[Double], Array[Int])): Unit = {
          val idx = inIdx(q); val pos = t._1; val labv = t._2; val c = t._3
          var i = 0
          while (i < pos.length) { rc.add(idx(pos(i)), c(i)); lb.add(labv(i)); i += 1 }
        }
        lIt.foreach { case (tp, (q, t)) => if (tp == p) fold(q, t) }
        rIt.foreach { case (_, (q, t)) => fold(q, t) }
        val m = rc.m
        val recv = rc.trimA; val cnts = rc.trimB; val labv = lb.trim
        // counting sort by receiver, then per-receiver label merge + mode
        val nR = vm.nRecv
        val off = new Array[Int](nR + 1)
        var i = 0
        while (i < m) { off(recv(i) + 1) += 1; i += 1 }
        i = 1
        while (i <= nR) { off(i) += off(i - 1); i += 1 }
        val fill = java.util.Arrays.copyOf(off, nR)
        val sl = new Array[Double](m); val sc = new Array[Int](m)
        i = 0
        while (i < m) {
          val r = recv(i); sl(fill(r)) = labv(i); sc(fill(r)) = cnts(i); fill(r) += 1
          i += 1
        }
        val nV = vm.ids.length
        val out = new Array[Double](nV)
        var changed = 0L
        var r = 0
        while (r < nR) {
          val a = off(r); val b = off(r + 1)
          if (b == a) out(r) = old(r) // no neighbor messages: keep label
          else {
            sortPaired(sl, sc, a, b)
            var bestLab = 0.0; var bestCnt = 0
            var j = a
            while (j < b) {
              var k = j + 1
              var tot = sc(j)
              while (k < b && sl(k) == sl(j)) { tot += sc(k); k += 1 }
              // strict > with label-ascending scan = highest count, then
              // smallest label — the column engine's max_by(cnt, -label)
              if (tot > bestCnt) { bestCnt = tot; bestLab = sl(j) }
              j = k
            }
            out(r) = bestLab
            if (bestLab != old(r)) changed += 1
          }
          r += 1
        }
        while (r < nV) { out(r) = old(r); r += 1 } // in-degree-0: keep label
        changedAcc.add(changed)
        Iterator.single(out)
    }
    (next, gathered)
  }

  /** Community label propagation on the CSR exchange (semantics: column
    * engine's `LabelPropagation` — synchronous, mode-of-neighbor-labels,
    * smaller label on ties, fixed `iterations` budget with early stop at
    * the no-label-moved fixpoint). Build the PrGraph on a bidirectional edge
    * set (e.g. `LinkGraph.undirected`) for the undirected-community reading;
    * message counts are per EDGE, like the column engine. Returns
    * (label blocks, supersteps run); resumable via `cp` (labels are exact
    * state and every superstep is dense, so a resumed run is identical). */
  def labelPropagation(g: PrGraph, iterations: Int,
                       cp: Option[CsrCheckpoint] = None): (RDD[RankBlock], Int) = {
    val sc = g.csr.sparkContext
    var it = 0
    var converged = false
    var metrics = Vector.empty[IterationMetrics]
    var labels = (cp.flatMap(readCheckpoint(g, _)) match {
      case Some((r, i, conv, m)) => it = i; converged = conv; metrics = m; r
      case None => g.verts.mapPartitions({ vIt =>
        val vm = vIt.next()
        val a = new Array[Double](vm.ids.length)
        var i = 0
        while (i < a.length) {
          require(vm.ids(i) < (1L << 53) && vm.ids(i) > -(1L << 53),
          s"vertex id ${vm.ids(i)} not exact in a Double label")
          a(i) = vm.ids(i).toDouble
          i += 1
        }
        Iterator.single(a)
      }, preservesPartitioning = true)
    }).persist(StorageLevel.MEMORY_AND_DISK)
    labels.count()
    var prev = labels
    while (!converged && it < iterations) {
      val t0 = System.nanoTime()
      val changedAcc = sc.longAccumulator(s"lp-changed-$it")
      val hotL = if (g.hotIds.isEmpty) null else sc.broadcast(hotMirror(g, labels))
      val (nl, gth) = labelStep(g, labels, changedAcc, hotL)
      val newLabels = nl.persist(StorageLevel.MEMORY_AND_DISK)
      if ((it + 1) % 16 == 0) newLabels.localCheckpoint()
      newLabels.count()
      gth.unpersist(blocking = false)
      if (hotL != null) hotL.unpersist(blocking = false)
      prev.unpersist(blocking = false)
      prev = newLabels
      labels = newLabels
      it += 1
      converged = changedAcc.value == 0L
      cp.foreach { c =>
        metrics :+= IterationMetrics(it, changedAcc.value,
          (System.nanoTime() - t0) / 1000000)
        if (it % c.every == 0 || converged || it >= iterations)
          writeCheckpoint(g, c, it, converged, labels, metrics)
      }
    }
    val out = materialize(g, labels)
    labels.unpersist(blocking = false)
    (out, it)
  }

  private def singleSourceInit(g: PrGraph, source: Long): RDD[Array[Double]] =
    g.verts.mapPartitions({ it =>
      val vm = it.next()
      val a = Array.fill(vm.ids.length)(Double.PositiveInfinity)
      var i = 0
      while (i < a.length) { if (vm.ids(i) == source) a(i) = 0.0; i += 1 }
      Iterator.single(a)
    }, preservesPartitioning = true)

  /** DataFrame view of the final ranks (conformance tests / sinks). */
  def toDF(spark: SparkSession, ranks: RDD[RankBlock]): DataFrame = {
    val rows = ranks.flatMap(b => b.ids.indices.iterator.map(i => Row(b.ids(i), b.pr(i))))
    spark.createDataFrame(rows,
      StructType(Seq(StructField("id", LongType, false), StructField("pagerank", DoubleType, false))))
  }
}
