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

  private def pri = conv(
    substring(md5(concat(col("id").cast("string"), lit(":p"))), 1, 8),
    16, 10).cast("long")

  def run(graph: LinkGraph, cp: Option[CheckpointConfig] = None): RunResult = {
    val und = graph.undirected
    val init = und.vertices.select(
      col("id"), lit(true).as("active"), pri.as("pri"), lit(-1).as("color"))
    val spec = VertexProgramSpec(
      direction = Direction.Out,
      activity = Activity.AllVertices,
      needsRecvState = true,
      send = fr => fr.select(
        col("id"), struct(col("pri"), col("id")).as("spr"), col("color").as("mcolor")),
      // ⊗ sees the receiver's state: drop messages from lower-priority
      // senders — the JP "wait for higher neighbors" gate
      gather = df => df.filter(col("spr") > struct(col("v_pri"), col("_recv"))),
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
