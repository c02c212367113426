package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.LinkGraph
import graft.engine.{Activity, CheckpointConfig, Direction, Reduce, RunResult,
  Superstep, VertexProgramSpec}

/**
 * Jones–Plassmann greedy coloring with fixed md5 priorities — deterministic
 * (each vertex takes the smallest color unused by its higher-priority
 * neighbors, so the result is the sequential greedy coloring in priority
 * order) and exactly replayable by the g_coloring DuckDB twin. The third
 * beyond-reference symmetry-breaking program on the column engine (after
 * KCore's peel and Mis's Luby rounds), and the one that needs the 3-op
 * shape: the gather ⊗ compares each message against the RECEIVER's priority
 * (`needsRecvState=true` — GraphMat's SpMSpV3), keeping only
 * higher-priority senders.
 *
 * Per round every vertex sends (priority-struct, color). A vertex colors
 * itself once no higher-priority neighbor is still uncolored, taking
 * mex(used) via sequence/array_except over the collect_set ⊕ (set size ≤
 * neighborhood color count ≤ Δ+1, so partials stay small even at hub
 * fan-in). Rounds = the longest increasing-priority path, O(log n / log log
 * n) w.h.p. on bounded-degree graphs; transcript-shaped fixtures measure 12
 * — the oracle unrolls 18, extra rounds no-ops.
 */
object Coloring {

  private def priOf(id: org.apache.spark.sql.Column) = conv(
    substring(md5(concat(id.cast("string"), lit(":p"))), 1, 8),
    16, 10).cast("long")

  private def pri = priOf(col("id"))

  def run(graph: LinkGraph, cp: Option[CheckpointConfig] = None): RunResult = {
    val und = graph.undirected
    val init = und.vertices.select(
      col("id"), lit(true).as("active"), pri.as("pri"), lit(-1).as("color"))
    val spec = VertexProgramSpec(
      direction = Direction.Out,
      activity = Activity.AllVertices,
      send = fr => fr.select(
        col("id"), struct(col("pri"), col("id")).as("spr"), col("color").as("mcolor")),
      // ⊗ compares against the receiver's priority — the JP "wait for higher
      // neighbors" gate. The priority is a pure md5 function of the vertex
      // id, so it is recomputed inline from `_recv` instead of joining the
      // receiver's state row in (r06): this drops the needsRecvState state
      // join from every superstep — one less join + exchange per round —
      // while evaluating the exact same predicate (GraphMat's SpMSpV3
      // semantics are preserved; the operand is just derivable here).
      gather = df => df.filter(col("spr") > struct(priOf(col("_recv")), col("_recv"))),
      reduce = Reduce.byAggs(
        max(col("mcolor") === -1).as("anyunc"),
        collect_set(when(col("mcolor") =!= -1, col("mcolor"))).as("used")),
      apply = (df, _) => {
        val used = coalesce(col("used"), array().cast("array<int>"))
        val mex = array_min(array_except(
          sequence(lit(0), size(used)), used))
        val next = when(col("color") =!= -1, col("color"))
          .when(coalesce(col("anyunc"), lit(false)), -1)
          .otherwise(mex)
        df.select(col("id"), lit(true).as("active"), col("pri"),
          next.as("color"), (next =!= col("color")).as("_changed"))
      },
      maxIterations = 64)
    Superstep.run(und, init, spec, cp)
  }

  /** (id, color) — a proper coloring; colors are 0-based. */
  def colors(graph: LinkGraph): DataFrame =
    run(graph).state.select(col("id"), col("color"))
}
