package graft.engine

import org.apache.spark.Partitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.core.LinkGraph

/**
 * The SpMV inner loop compiled as a partition-local gather-scatter over
 * sorted CSR-style edge partitions — the direct Spark analog of GraphMat's
 * tile kernel (`singlenode/spmspv.h:39-86`):
 *
 *  - Edges are hash-partitioned by src into per-partition PRIMITIVE arrays:
 *    unique sorted srcs with inverse out-degree, plus per-edge
 *    (src-index, dst) — a CSR block (the DCSC tile analog,
 *    `DCSCTile.h:241-381`).
 *  - The rank vector is one primitive block per partition, co-partitioned
 *    with the edge blocks, so the reference's "broadcast x to column ranks"
 *    phase (`multinode/spmspv.h:62-116`) is a zipPartitions — zero movement.
 *  - Gather: contrib = pr[src]·invDeg[src] accumulated into per-target
 *    open-address primitive maps (⊗ then thread-local ⊕). Scatter: ONE
 *    shuffle of n×n packed array records (the row-reduce all-to-all,
 *    `multinode/spmspv.h:141-203`) — not |E| boxed tuples.
 *
 * One RDD job, one shuffle, no Catalyst re-planning, no per-row boxing per
 * superstep. Throughput path only; semantics verified against the
 * Column-algebra engine (allclose 1e-9) in GatherScatterSpec.
 */
object GatherScatter {

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

  /** Partitioner routing Long keys through the mixer. */
  final class MixPartitioner(val n: Int) extends Partitioner {
    def numPartitions: Int = n
    def getPartition(key: Any): Int = {
      val h = (mix(key.asInstanceOf[Long]) % n).toInt
      if (h < 0) h + n else h
    }
    override def equals(o: Any): Boolean = o match {
      case p: MixPartitioner => p.n == n
      case _ => false
    }
    override def hashCode: Int = n
  }

  /** Open-addressing Long→Double map, linear probing, power-of-2 capacity.
    * Sentinel Long.MinValue = empty (vertex ids must not use it). */
  final class LongDoubleMap(expected: Int) extends Serializable {
    private val EMPTY = Long.MinValue
    private var cap = Integer.highestOneBit(math.max(expected, 8) * 4 - 1) << 1
    private var mask = cap - 1
    private var keys = Array.fill[Long](cap)(EMPTY)
    private var vals = new Array[Double](cap)
    private var n = 0

    def size: Int = n

    def addTo(k: Long, v: Double): Unit = {
      var i = mix(k).toInt & mask
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
      var i = mix(k).toInt & mask
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
      var i = mix(k).toInt & mask
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

  /** CSR block: sorted unique srcs with inverse out-degree; edges as
    * (index-into-srcs, dst) pairs. Primitive arrays only. */
  final case class CsrBlock(
      srcs: Array[Long], invDeg: Array[Double],
      edgeSrcIdx: Array[Int], edgeDst: Array[Long])

  /** One rank block per partition. */
  final case class RankBlock(ids: Array[Long], pr: Array[Double])

  final case class PrGraph(
      csr: RDD[CsrBlock],
      initRanks: RDD[RankBlock],               // every vertex at 0.3
      sourceIds: RDD[Array[Long]],             // per-partition in-degree-0 vertices
      numPartitions: Int,
      numEdges: Long,
      numVertices: Long)

  private final class IdPartitioner(val n: Int) extends Partitioner {
    def numPartitions: Int = n
    def getPartition(key: Any): Int = key.asInstanceOf[Int]
    override def equals(o: Any): Boolean = o match {
      case p: IdPartitioner => p.n == n
      case _ => false
    }
    override def hashCode: Int = n
  }

  /** Build the CSR blocks + static vertex blocks once — GraphMat's
    * `ingestEdgelist` + DCSC tile build (`SpMat.h:97-278`). No sort: the ⊕
    * is commutative, so dst order within a block is irrelevant; degree
    * counting and src-indexing are single primitive passes. */
  def build(graph: LinkGraph, numPartitions: Int = 0): PrGraph = {
    val n = if (numPartitions > 0) numPartitions else graph.numPartitions
    val part = new MixPartitioner(n)

    val edgePairs: RDD[(Long, Long)] = graph.edges.select("src", "dst").rdd
      .map(r => (r.getLong(0), r.getLong(1)))
    val numEdges = graph.numEdges

    val csr: RDD[CsrBlock] = edgePairs
      .partitionBy(part)
      .mapPartitions({ it =>
        var capE = 1 << 12
        var srcA = new Array[Long](capE); var dstA = new Array[Long](capE); var m = 0
        while (it.hasNext) {
          val e = it.next()
          if (m == capE) {
            capE <<= 1
            srcA = java.util.Arrays.copyOf(srcA, capE)
            dstA = java.util.Arrays.copyOf(dstA, capE)
          }
          srcA(m) = e._1; dstA(m) = e._2; m += 1
        }
        val degMap = new LongDoubleMap(1024)
        var i = 0
        while (i < m) { degMap.addTo(srcA(i), 1.0); i += 1 }
        val (srcs, degs) = degMap.toArrays
        val idxMap = new LongDoubleMap(srcs.length) // value = index (exact in double)
        i = 0
        while (i < srcs.length) { idxMap.put(srcs(i), i.toDouble); i += 1 }
        val invDeg = new Array[Double](srcs.length)
        i = 0
        while (i < srcs.length) { invDeg(i) = 1.0 / degs(i); i += 1 }
        val eSrc = new Array[Int](m)
        val eDst = java.util.Arrays.copyOf(dstA, m)
        i = 0
        while (i < m) { eSrc(i) = idxMap.getOrNaN(srcA(i)).toInt; i += 1 }
        Iterator.single(CsrBlock(srcs, invDeg, eSrc, eDst))
      }, preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    csr.count()

    // receivers (distinct dst) per partition, partition-locally deduped —
    // src and dst copies of a vertex hash to the SAME partition
    val recv: RDD[Array[Long]] = edgePairs.map(e => (e._2, null))
      .partitionBy(part)
      .mapPartitions({ it =>
        val s = new LongDoubleMap(1024)
        while (it.hasNext) s.put(it.next()._1, 0.0)
        Iterator.single(s.toArrays._1)
      }, preservesPartitioning = true)

    // vertex set = srcs ∪ receivers; in-degree-0 set = srcs \ receivers
    val vertBlocks: RDD[(RankBlock, Array[Long])] =
      csr.zipPartitions(recv, preservesPartitioning = true) { (cIt, rIt) =>
        val blk = cIt.next(); val rv = rIt.next()
        val set = new LongDoubleMap(blk.srcs.length + rv.length)
        var i = 0
        while (i < rv.length) { set.put(rv(i), 1.0); i += 1 } // 1.0 = receiver
        var nSrcOnly = 0
        i = 0
        while (i < blk.srcs.length) {
          if (java.lang.Double.isNaN(set.getOrNaN(blk.srcs(i)))) nSrcOnly += 1
          i += 1
        }
        val srcOnly = new Array[Long](nSrcOnly)
        var j = 0
        i = 0
        while (i < blk.srcs.length) {
          val s = blk.srcs(i)
          if (java.lang.Double.isNaN(set.getOrNaN(s))) { srcOnly(j) = s; j += 1; set.put(s, 0.0) }
          i += 1
        }
        val (ids, _) = set.toArrays
        Iterator.single((RankBlock(ids, Array.fill(ids.length)(0.3)), srcOnly))
      }.persist(StorageLevel.MEMORY_AND_DISK)

    val initRanks: RDD[RankBlock] = vertBlocks.map(_._1)
    val sourceIds: RDD[Array[Long]] = vertBlocks.map(_._2)
    val nV = vertBlocks.map(_._1.ids.length.toLong).sum().toLong
    PrGraph(csr, initRanks, sourceIds, n, numEdges, nV)
  }

  /**
   * GraphMat-semantics PageRank, fixed iteration count: pr' = α + (1−α)·Σ
   * pr/outdeg applied to message receivers only; in-degree-0 vertices never
   * receive and keep their initial 0.3 (`src/PageRank.cpp:81-161`,
   * apply-on-receive per `GraphMatRuntime.h:195-225`).
   */
  def pageRank(g: PrGraph, alpha: Double, iterations: Int,
               checkpointEvery: Int = 25): RDD[RankBlock] = {
    val n = g.numPartitions
    val idPart = new IdPartitioner(n)
    var ranks = g.initRanks
    var prev: Option[RDD[RankBlock]] = None
    var it = 0
    while (it < iterations) {
      // gather: pr[src]·invDeg[src] → per-target-partition primitive
      // accumulators; scatter: one all-to-all of packed arrays (≤ n×n records)
      val exchanged = gatherPhase(ranks, g, alpha, n).partitionBy(idPart)
      val newRanks = exchanged.zipPartitions(g.sourceIds, preservesPartitioning = true) {
        (pIt, sIt) =>
          val acc = new LongDoubleMap(1024)
          while (pIt.hasNext) {
            val (_, (ks, vs)) = pIt.next()
            var i = 0
            while (i < ks.length) { acc.addTo(ks(i), vs(i)); i += 1 }
          }
          val srcOnly = sIt.next()
          val (ks, vs) = acc.toArrays
          val m = ks.length + srcOnly.length
          val ids = new Array[Long](m)
          val prs = new Array[Double](m)
          var i = 0
          while (i < ks.length) { ids(i) = ks(i); prs(i) = alpha + (1.0 - alpha) * vs(i); i += 1 }
          var j = 0
          while (j < srcOnly.length) { ids(i) = srcOnly(j); prs(i) = 0.3; i += 1; j += 1 }
          Iterator.single(RankBlock(ids, prs))
      }.persist(StorageLevel.MEMORY_AND_DISK)
      if ((it + 1) % checkpointEvery == 0) newRanks.localCheckpoint()
      newRanks.count()
      prev.foreach(_.unpersist(blocking = false))
      prev = Some(newRanks)
      ranks = newRanks
      it += 1
    }
    ranks
  }

  /**
   * PageRank until convergence, GraphMat stop rule: terminate when no vertex
   * moved by more than `tol` (`PR::operator!=`, `src/PageRank.cpp:43-45`;
   * land-reduce `GraphMatRuntime.h:208-226` — here a Spark accumulator).
   * Returns (final ranks, supersteps run).
   */
  def pageRankConverged(g: PrGraph, alpha: Double = 0.3, tol: Double = 1e-5,
                        maxIterations: Int = 200): (RDD[RankBlock], Int) = {
    val sc = g.csr.sparkContext
    val n = g.numPartitions
    val idPart = new IdPartitioner(n)
    var ranks = g.initRanks
    var prev: Option[RDD[RankBlock]] = None
    var it = 0
    var converged = false
    while (!converged && it < maxIterations) {
      val changedAcc = sc.longAccumulator(s"changed-$it")
      val packed = gatherPhase(ranks, g, alpha, n)
      val exchanged = packed.partitionBy(idPart)
      val newRanks = exchanged
        .zipPartitions(g.sourceIds, ranks, preservesPartitioning = true) { (pIt, sIt, oldIt) =>
          val old = oldIt.next()
          val oldPr = new LongDoubleMap(old.ids.length)
          var i = 0
          while (i < old.ids.length) { oldPr.put(old.ids(i), old.pr(i)); i += 1 }
          val acc = new LongDoubleMap(1024)
          while (pIt.hasNext) {
            val (_, (ks, vs)) = pIt.next()
            var j = 0
            while (j < ks.length) { acc.addTo(ks(j), vs(j)); j += 1 }
          }
          val srcOnly = sIt.next()
          val (ks, vs) = acc.toArrays
          val m = ks.length + srcOnly.length
          val ids = new Array[Long](m)
          val prs = new Array[Double](m)
          var changed = 0L
          i = 0
          while (i < ks.length) {
            ids(i) = ks(i)
            prs(i) = alpha + (1.0 - alpha) * vs(i)
            if (math.abs(prs(i) - oldPr.getOrNaN(ks(i))) > tol) changed += 1
            i += 1
          }
          var j = 0
          while (j < srcOnly.length) { ids(i) = srcOnly(j); prs(i) = 0.3; i += 1; j += 1 }
          changedAcc.add(changed)
          Iterator.single(RankBlock(ids, prs))
        }.persist(StorageLevel.MEMORY_AND_DISK)
      newRanks.count()
      prev.foreach(_.unpersist(blocking = false))
      prev = Some(newRanks)
      ranks = newRanks
      it += 1
      converged = changedAcc.value == 0L
    }
    (ranks, it)
  }

  /** The gather (⊗ + thread-local ⊕) shared by both PageRank drivers. */
  private def gatherPhase(ranks: RDD[RankBlock], g: PrGraph, alpha: Double,
                          n: Int): RDD[(Int, (Array[Long], Array[Double]))] =
    ranks.zipPartitions(g.csr, preservesPartitioning = false) { (rIt, cIt) =>
      val blk = cIt.next()
      val rb = rIt.next()
      val prOf = new LongDoubleMap(rb.ids.length)
      var i = 0
      while (i < rb.ids.length) { prOf.put(rb.ids(i), rb.pr(i)); i += 1 }
      val contrib = new Array[Double](blk.srcs.length)
      i = 0
      while (i < blk.srcs.length) {
        contrib(i) = prOf.getOrNaN(blk.srcs(i)) * blk.invDeg(i)
        i += 1
      }
      val accs = Array.fill(n)(null: LongDoubleMap)
      var e = 0
      val nE = blk.edgeDst.length
      while (e < nE) {
        val c = contrib(blk.edgeSrcIdx(e))
        if (!java.lang.Double.isNaN(c)) {
          val d = blk.edgeDst(e)
          val tp = { val h = (mix(d) % n).toInt; if (h < 0) h + n else h }
          if (accs(tp) == null) accs(tp) = new LongDoubleMap(64)
          accs(tp).addTo(d, c)
        }
        e += 1
      }
      (0 until n).iterator.filter(accs(_) != null).map(tp => (tp, accs(tp).toArrays))
    }

  /** DataFrame view of the final ranks (conformance tests / sinks). */
  def toDF(spark: SparkSession, ranks: RDD[RankBlock]): DataFrame = {
    val rows = ranks.flatMap(b => b.ids.indices.iterator.map(i => Row(b.ids(i), b.pr(i))))
    spark.createDataFrame(rows,
      StructType(Seq(StructField("id", LongType, false), StructField("pagerank", DoubleType, false))))
  }
}
