package graft.engine

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import GatherScatter.{CsrBlock, IdPartitioner, PrGraph, VertexMeta}

/**
 * K-vector-payload supersteps on the CSR gather-scatter structures — the
 * 3-operand program form (GraphMat's SpMSpV3: ⊗ sees the RECEIVER's
 * property, `GraphMatRuntime.h:195-225` process-message with vertexprop)
 * on the throughput path. The scalar kernel ships one pre-summed double
 * per (source block, unique dst); a 3-op program cannot pre-reduce at the
 * source without the receiver's state, so each superstep here runs the
 * exchange GraphMat's multinode SpMV runs (`multinode/spmspv.h:62-203`):
 *
 *  1. mirror phase ("broadcast x to column ranks"): every partition packs
 *     the CURRENT K-vectors of the receivers each source block will touch —
 *     the per-(source, target) unique-dst tables and incoming-index tables
 *     built once by [[GatherScatter.build]] already name exactly those
 *     vertices — and ships them to the edge-holding partitions;
 *  2. gather: per-edge ⊗(srcVec, weight, dstVec) computed where the edges
 *     live, pre-summed (⊕ = elementwise vector add) into one K-slot per
 *     unique dst — hub fan-in stays structurally two-phase;
 *  3. the row-reduce all-to-all: the scalar kernel's split exchange, K-wide
 *     (self-contributions never enter the shuffle), folded through the
 *     static incoming-index tables, then the dense apply.
 *
 * Cross-executor bytes per superstep = 2 × (partition cut) × K doubles
 * (mirrors out, contributions back) — zero under conversation co-location,
 * and exactly GraphMat's x-broadcast + y-reduce volume in the general case.
 *
 * Hot (degree-split) srcs ride the existing mirror broadcast, K-wide: their
 * edges live with the RECEIVER partition, so the dst vectors are local and
 * only the hub's own K-vector arrives by broadcast.
 *
 * Instantiated here for SGD matrix factorization (`src/SGD.cpp:36-236`):
 * ⊗ = srcLv · (rating − ⟨srcLv, dstLv⟩), ⊕ = vector sum, apply:
 * lv += step·(−λ·lv + Σ). Semantics are verified against the column
 * engine's 3-op Sgd program (allclose — SgdCsrSpec); the IEEE op ORDER of
 * ⊗ and apply matches the column engine's expressions exactly, so the only
 * divergence source is ⊕ fold order.
 */
object VectorSuperstep {

  /** One result block per partition: `vecs` is K-packed, aligned to ids. */
  final case class VecBlock(ids: Array[Long], k: Int, vecs: Array[Double])

  /** Dense K-packed state aligned to the partition's VertexMeta layout. */
  def initState(g: PrGraph, k: Int, f: (Long, Int) => Double): RDD[Array[Double]] =
    g.verts.mapPartitions({ it =>
      val vm = it.next()
      val a = new Array[Double](vm.ids.length * k)
      var i = 0
      while (i < vm.ids.length) {
        var d = 0
        while (d < k) { a(i * k + d) = f(vm.ids(i), d); d += 1 }
        i += 1
      }
      Iterator.single(a)
    }, preservesPartitioning = true)

  /** K-wide hub mirror: collect the (few) hot vertices' vectors, broadcast. */
  private def hotVecs(g: PrGraph, state: RDD[Array[Double]], k: Int): Array[Double] = {
    if (g.hotIds.isEmpty) return Array.emptyDoubleArray
    val pairs = state.zipPartitions(g.verts) { (sIt, vIt) =>
      val st = sIt.next(); val vm = vIt.next()
      Iterator.range(0, vm.hotHomeGlobal.length).map { i =>
        val seg = new Array[Double](k)
        System.arraycopy(st, vm.hotHomeLocal(i) * k, seg, 0, k)
        (vm.hotHomeGlobal(i), seg)
      }
    }.collect()
    val arr = new Array[Double](g.hotIds.length * k)
    pairs.foreach { case (gi, seg) => System.arraycopy(seg, 0, arr, gi * k, k) }
    arr
  }

  /** Phase 1: ship each source block the receiver vectors its edges need —
    * packed in the SAME order as its unique-dst table, so the gather indexes
    * them positionally (the incoming-index table run in reverse). Self
    * mirrors are packed locally inside the gather instead (split exchange). */
  private def mirrorPhase(state: RDD[Array[Double]], g: PrGraph, k: Int)
      : RDD[(Int, (Int, Array[Double]))] =
    state.zipPartitions(g.meta, preservesPartitioning = false) { (sIt, mIt) =>
      val st = sIt.next(); val (_, inIdx) = mIt.next()
      val tp = TaskContext.getPartitionId()
      Iterator.range(0, inIdx.length)
        .filter(q => q != tp && inIdx(q) != null)
        .map { q =>
          val idx = inIdx(q)
          val m = new Array[Double](idx.length * k)
          var j = 0
          while (j < idx.length) {
            System.arraycopy(st, idx(j) * k, m, j * k, k)
            j += 1
          }
          (q, (tp, m))
        }
    }

  /** One synchronous SGD superstep. Returns (next state — lazy, caller
    * persists+counts, the gathered split-exchange handle and the hub
    * broadcast — caller frees both after materializing). */
  private def sgdStep(g: PrGraph, state: RDD[Array[Double]], k: Int,
                      lambda: Double, stepSize: Double)
      : (RDD[Array[Double]], RDD[_], org.apache.spark.broadcast.Broadcast[Array[Double]]) = {
    val sc = state.sparkContext
    val idPart = new IdPartitioner(g.numPartitions)
    val hotBc = sc.broadcast(hotVecs(g, state, k))
    val mirrors = mirrorPhase(state, g, k).partitionBy(idPart)
    val gathered: RDD[(Int, (Int, Array[Double]))] = mirrors
      .zipPartitions(state, g.csr, g.meta, preservesPartitioning = false) {
        (mIt, sIt, cIt, metaIt) =>
          val st = sIt.next(); val blk = cIt.next(); val (vm, inIdx) = metaIt.next()
          val p = TaskContext.getPartitionId()
          val recvVecs = new Array[Array[Double]](blk.outIds.length)
          mIt.foreach { case (_, (tp, m)) => recvVecs(tp) = m }
          if (blk.outIds(p) != null) { // self mirror: local receiver state
            val idx = inIdx(p)
            val m = new Array[Double](idx.length * k)
            var j = 0
            while (j < idx.length) {
              System.arraycopy(st, idx(j) * k, m, j * k, k)
              j += 1
            }
            recvVecs(p) = m
          }
          // local src vectors, gathered once into edge-index order
          val nS = blk.srcs.length
          val srcVec = new Array[Double](nS * k)
          var i = 0
          while (i < nS) {
            System.arraycopy(st, vm.srcPrIdx(i) * k, srcVec, i * k, k)
            i += 1
          }
          val out = new Array[Array[Double]](blk.outIds.length)
          var tp = 0
          while (tp < blk.outIds.length) {
            val ids = blk.outIds(tp)
            if (ids != null) {
              val acc = new Array[Double](ids.length * k)
              val es = blk.edgeSrcIdx(tp); val eo = blk.edgeOutIdx(tp)
              val ew = blk.edgeW(tp); val rv = recvVecs(tp)
              var e = 0
              while (e < es.length) {
                val sOff = es(e) * k; val dOff = eo(e) * k
                var dot = 0.0
                var d = 0
                while (d < k) { dot += srcVec(sOff + d) * rv(dOff + d); d += 1 }
                val err = ew(e) - dot
                d = 0
                while (d < k) { acc(dOff + d) += srcVec(sOff + d) * err; d += 1 }
                e += 1
              }
              out(tp) = acc
            }
            tp += 1
          }
          // hub-shard edges: src vector from the broadcast mirror; dst is
          // LOCAL (they were routed here by dst) — fold into the self bucket
          if (blk.hotEdgeSrcIdx.length > 0) {
            val hv = hotBc.value
            val acc = out(p); val rv = recvVecs(p)
            val hs = blk.hotEdgeSrcIdx; val ho = blk.hotEdgeOutIdx
            val hw = blk.hotEdgeW
            var e = 0
            while (e < hs.length) {
              val sOff = blk.hotLocal(hs(e)) * k; val dOff = ho(e) * k
              var dot = 0.0
              var d = 0
              while (d < k) { dot += hv(sOff + d) * rv(dOff + d); d += 1 }
              val err = hw(e) - dot
              d = 0
              while (d < k) { acc(dOff + d) += hv(sOff + d) * err; d += 1 }
              e += 1
            }
          }
          Iterator.range(0, out.length).filter(out(_) != null)
            .map(tp => (tp, (p, out(tp))))
      }.persist(StorageLevel.MEMORY_AND_DISK)
    // split exchange: self-contributions stay in the cached gather output
    val remote = gathered.mapPartitionsWithIndex(
        (p, it) => it.filter(_._1 != p), preservesPartitioning = false)
      .partitionBy(idPart)
    val next = remote.zipPartitions(gathered, g.meta, state, preservesPartitioning = true) {
      (rIt, lIt, mIt, oIt) =>
        val (vm, inIdx) = mIt.next(); val old = oIt.next()
        val p = TaskContext.getPartitionId()
        val acc = new Array[Double](vm.nRecv * k)
        @inline def fold(q: Int, vals: Array[Double]): Unit = {
          val idx = inIdx(q)
          var j = 0
          while (j < idx.length) {
            val dst = idx(j) * k; val src = j * k
            var d = 0
            while (d < k) { acc(dst + d) += vals(src + d); d += 1 }
            j += 1
          }
        }
        lIt.foreach { case (tp, (q, vals)) => if (tp == p) fold(q, vals) }
        rIt.foreach { case (_, (q, vals)) => fold(q, vals) }
        val nV = vm.ids.length
        val out = new Array[Double](nV * k)
        val nR = vm.nRecv * k
        var i = 0
        while (i < nR) {
          // same IEEE order as the column apply: lv + step·((−λ·lv) + acc)
          out(i) = old(i) + stepSize * (-lambda * old(i) + acc(i))
          i += 1
        }
        // in-degree-0 vertices never receive: keep their vectors
        System.arraycopy(old, nR, out, nR, nV * k - nR)
        Iterator.single(out)
    }
    (next, gathered, hotBc)
  }

  /**
   * SGD matrix factorization on the CSR path — reference semantics
   * (`src/SGD.cpp`): ALL_EDGES both directions, ALL_VERTICES, fixed
   * iteration count. `g` must be built from the BIDIRECTIONAL rating edge
   * table with `weighted = true` (the CSR analog of the column engine's
   * Direction.All). `init(id, k)` seeds the latent vectors — pass
   * `graft.algos.Sgd.initLv` to match the column engine bit-for-bit at
   * iteration 0.
   */
  def sgd(g: PrGraph, k: Int = 20, iterations: Int = 10,
          lambda: Double = 0.001, stepSize: Double = 0.00000035,
          init: (Long, Int) => Double): RDD[VecBlock] = {
    require(g.weighted,
      "sgd needs per-edge ratings: build the graph with weighted = true")
    var state = initState(g, k, init).persist(StorageLevel.MEMORY_AND_DISK)
    state.count()
    var it = 0
    while (it < iterations) {
      val (nextLazy, gathered, hotBc) = sgdStep(g, state, k, lambda, stepSize)
      val next = nextLazy.persist(StorageLevel.MEMORY_AND_DISK)
      // bound lineage depth for long runs: every 16 supersteps the persisted
      // state also truncates its chain (executor loss then recomputes at
      // most 16 steps, never back to iteration 0)
      if (it % 16 == 15) next.localCheckpoint()
      next.count()
      gathered.unpersist(blocking = false)
      hotBc.unpersist(blocking = false)
      state.unpersist(blocking = false)
      state = next
      it += 1
    }
    val out = state.zipPartitions(g.verts, preservesPartitioning = true) { (sIt, vIt) =>
      Iterator.single(VecBlock(vIt.next().ids, k, sIt.next()))
    }.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    state.unpersist(blocking = false)
    out
  }

  /** Deterministic bipartite rating fixture for benchmarks: `nUsers` users,
    * each rating `degree` of nUsers/4 items, weights in [0, 5). mix-hashed,
    * so it reproduces at any parallelism (cf. TriangleCsr.communityEdges —
    * the transcript graphs have no K-vector workload of their own). */
  def ratingsEdges(spark: SparkSession, nUsers: Long, degree: Int): DataFrame = {
    import spark.implicits._
    val d = degree
    val nItems = math.max(nUsers / 4, 16L)
    val itemBase = 1000000000L
    spark.range(nUsers).as[Long].flatMap { u =>
      Iterator.range(0, d).map { j =>
        val item = itemBase + math.floorMod(GatherScatter.mix(u * 131L + j * 7L + 1L), nItems)
        val w = math.floorMod(GatherScatter.mix(u ^ (item * 31L)), 50L) / 10.0
        (u, item, w)
      }
    }.toDF("src", "dst", "weight")
  }

  /** (id, lv) DataFrame view of a factorization result (parity/testing). */
  def toDF(spark: SparkSession, blocks: RDD[VecBlock]): DataFrame = {
    val rows = blocks.flatMap { b =>
      Iterator.range(0, b.ids.length).map { i =>
        Row(b.ids(i), b.vecs.slice(i * b.k, i * b.k + b.k).toSeq)
      }
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("lv", ArrayType(DoubleType, containsNull = false), nullable = false))))
  }
}
