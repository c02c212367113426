package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.LinkGraph
import graft.engine.{Activity, Direction, Reduce, Superstep, VertexProgramSpec}

/**
 * Strongly connected components by forward-backward min-label refinement —
 * the parallel FB/coloring family (Fleischer-Hendrickson-Pinar 2000; the
 * "coloring" variant of Slota et al.'s Multistep), re-expressed as block
 * refinement so every phase is the engine's plain HashMin kernel:
 *
 *   block(v) := one label for the whole graph
 *   repeat:
 *     F(v) := min id that reaches v  within block(v)   (forward HashMin)
 *     B(v) := min id v reaches       within block(v)   (backward HashMin)
 *     block(v) := (F(v), B(v))
 *   until no block changed
 *
 * Why this terminates at exactly the SCCs: F(v), B(v) are ids INSIDE v's
 * block, so pairs from different blocks can never coincide — each round the
 * partition strictly refines (or is final). A block uniform in (F,B) must
 * have F = B = min(block): F(m) = m forces the shared F to be the block min
 * m, and B(m) = m forces the shared B to be m too — so every member reaches
 * m and is reached by m, i.e. the block IS an SCC. Conversely an SCC always
 * shares (F,B), so SCCs are never split. Fixpoint ⇔ every block is an SCC,
 * and the shared F is the component's min id — the emitted label.
 *
 * Spark shape: each phase drops cross-block edges (two hash joins against
 * the id-keyed block table — co-partitioned with the superstep state) and
 * runs the ActiveOnly HashMin program of ConnectedComponents on the
 * surviving subgraph, forward then on the transpose. No receiver-state
 * gather, no new ⊕: SCC is pure composition of gated primitives. At 100 TB
 * the per-round subgraph SHRINKS (finished SCCs stop exchanging the moment
 * their block seals), outer rounds are O(log #SCCs-per-chain) in expectation
 * for hash-random ids, and every join/agg keys on vertex id so AQE-visible
 * partitioning is reused across phases. Beyond the reference's app set
 * (GraphMat bundles no SCC); the same run_graph_program loop expresses it
 * (`/root/reference/src/PageRank.cpp:53-79` is the HashMin skeleton's twin).
 */
object Scc {

  /** HashMin to fixpoint over `g` in `dir`; returns (id, lbl). Identical
    * program to ConnectedComponents.run but honoring edge direction. */
  private def minFix(g: LinkGraph, dir: Direction): DataFrame = {
    val init = g.vertices.select(
      col("id"), lit(true).as("active"), col("id").as("lbl"))
    val spec = VertexProgramSpec(
      direction = dir,
      activity = Activity.ActiveOnly,
      send = fr => fr.select(col("id"), col("lbl").as("msg")),
      reduce = Reduce.byAggs(min("msg").as("acc")),
      apply = (df, _) => {
        val changed = col("acc").isNotNull && col("acc") < col("lbl")
        df.select(
          col("id"), changed.as("active"),
          when(changed, col("acc")).otherwise(col("lbl")).as("lbl"),
          changed.as("_changed"))
      })
    Superstep.run(g, init, spec).state.select("id", "lbl")
  }

  /**
   * Returns (id, scc) where scc = min vertex id of the strongly connected
   * component. `maxOuter` is a safety rail only — the refinement provably
   * reaches its fixpoint (see object doc); hitting the rail throws rather
   * than returning a partial partition.
   */
  def run(graph: LinkGraph, maxOuter: Int = 64): DataFrame = {
    var state = graph.vertices
      .select(col("id"), lit(0L).as("bf"), lit(0L).as("bb"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var round = 0
    var changed = 1L
    while (changed > 0) {
      if (round >= maxOuter)
        throw new IllegalStateException(s"Scc: no fixpoint after $maxOuter rounds")
      // edges whose endpoints share a block — the only ones either phase may
      // propagate across this round
      val srcB = state.select(col("id").as("src"), col("bf").as("sbf"), col("bb").as("sbb"))
      val dstB = state.select(col("id").as("dst"), col("bf").as("dbf"), col("bb").as("dbb"))
      val inBlock = graph.edges
        .join(srcB, "src").join(dstB, "dst")
        .filter(col("sbf") === col("dbf") && col("sbb") === col("dbb"))
        .select("src", "dst", "weight")
      val sub = LinkGraph(inBlock, graph.numPartitions)
      val f = minFix(sub, Direction.Out).withColumnRenamed("lbl", "f")
      val b = minFix(sub, Direction.In).withColumnRenamed("lbl", "b")
      // vertices isolated in the subgraph keep themselves as both labels
      val next = state
        .join(f, Seq("id"), "left_outer")
        .join(b, Seq("id"), "left_outer")
        .select(col("id"),
          coalesce(col("f"), col("id")).as("nbf"),
          coalesce(col("b"), col("id")).as("nbb"),
          (coalesce(col("f"), col("id")) =!= col("bf") ||
           coalesce(col("b"), col("id")) =!= col("bb")).as("chg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = next.filter(col("chg")).count()
      val prev = state
      // truncate lineage at each outer round: the next round's joins stack
      // on this frame, and Superstep's own checkpoints don't cover it
      state = next.select("id", "nbf", "nbb")
        .toDF("id", "bf", "bb").localCheckpoint()
      prev.unpersist(blocking = false)
      next.unpersist(blocking = false)
      sub.unpersistAll()
      round += 1
    }
    val out = state.select(col("id"), col("bf").as("scc"))
    out
  }
}
