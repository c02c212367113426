package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.LinkGraph
import graft.engine.{Activity, CheckpointConfig, Direction, Reduce, RunResult,
  Superstep, VertexProgramSpec}

/**
 * Deterministic maximal independent set — Luby's algorithm (Luby 1986) with
 * FIXED md5 priorities instead of per-round redraws, which makes every run
 * (and the g_mis DuckDB twin) replay the same set: an undecided vertex joins
 * the MIS when its (priority, id) beats every undecided neighbor's, and a
 * vertex is excluded once any neighbor is in the set. Synchronous rounds on
 * the column Superstep engine over the undirected simple view. Beyond the
 * reference's app set; MIS is the standard symmetry-breaking primitive
 * (greedy coloring, parallel scheduling, landmark selection) and another
 * shape of peel the engine expresses natively (cf. KCore, ToposortCsr).
 *
 * Status: 0 = undecided, 1 = in the MIS, 2 = excluded. Per round each
 * non-excluded vertex sends (its priority if undecided, its membership
 * flag); ⊕ keeps the max undecided (priority, id) struct and whether any
 * neighbor is already in — both algebraic, so map-side partials bound hub
 * fan-in. Messages shrink monotonically: excluded vertices go silent and a
 * member's neighborhood is silenced one round later. Terminates because
 * every round the globally highest-priority undecided vertex (if its
 * neighborhood holds no member) joins, or its undecided neighbors get
 * excluded. ~2 engine rounds per greedy-peel level; transcript-shaped
 * graphs need ≤8 (the oracle unrolls 12 — extra rounds are no-ops at the
 * fixpoint).
 */
object Mis {

  /** 32-bit md5 priority; ties broken by id via struct comparison. */
  private def pri = conv(
    substring(md5(concat(col("id").cast("string"), lit(":p"))), 1, 8),
    16, 10).cast("long")

  def run(graph: LinkGraph, cp: Option[CheckpointConfig] = None): RunResult = {
    val und = graph.undirected
    val init = und.vertices.select(
      col("id"), lit(true).as("active"), pri.as("pri"), lit(0).as("status"))
    val spec = VertexProgramSpec(
      direction = Direction.Out,
      activity = Activity.AllVertices,
      send = fr => fr.filter(col("status") < 2).select(
        col("id"),
        when(col("status") === 0, struct(col("pri"), col("id"))).as("upri"),
        (col("status") === 1).as("mis")),
      reduce = Reduce.byAggs(
        max(col("upri")).as("maxu"), max(col("mis")).as("anymis")),
      apply = (df, _) => {
        val own = struct(col("pri"), col("id"))
        val next = when(col("status") =!= 0, col("status"))
          .when(coalesce(col("anymis"), lit(false)), 2)
          .when(col("maxu").isNull || col("maxu") < own, 1)
          .otherwise(0)
        df.select(col("id"), lit(true).as("active"), col("pri"),
          next.as("status"), (next =!= col("status")).as("_changed"))
      },
      maxIterations = 64)
    Superstep.run(und, init, spec, cp)
  }

  /** (id, in_mis) over the vertices of the undirected simple view. */
  def membership(graph: LinkGraph): DataFrame =
    run(graph).state.select(col("id"), (col("status") === 1).as("in_mis"))
}
