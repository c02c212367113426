package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.LinkGraph
import graft.engine.{Activity, CheckpointConfig, Direction, Reduce, RunResult,
  Superstep, VertexProgramSpec}

/**
 * Deterministic greedy maximal matching — locally-dominant edge matching
 * (Preis 1999 / Hoepman 2004's handshake form) under a FIXED md5 edge
 * priority, which makes every run (and the g_matching DuckDB twin) replay
 * the same matching: per round each unmatched vertex points at its best
 * unmatched neighbor under the global edge order, and an edge whose two
 * endpoints point at each other (a locally-dominant edge) is matched. The
 * result equals the SEQUENTIAL greedy matching that scans edges in
 * descending (pri, a, b) order (pinned in MatchingSpec) — the standard
 * parallel-greedy equivalence. Beyond the reference's app set; matching is
 * the classic symmetry-breaking peel alongside MIS and coloring, and its
 * handshake is the engine's 3-op shape (⊗ compares sender against the
 * RECEIVER's candidate).
 *
 * One engine round = two supersteps, alternated by a `phase` bit carried in
 * the vertex state (the column engine runs one spec; the phase bit selects
 * which accumulator `apply` consumes):
 *  - propose (phase 0): unmatched vertices send; ⊕ keeps the max edge key
 *    over unmatched neighbors (algebraic max → map-side partials bound hub
 *    fan-in); `apply` decodes the candidate neighbor from the key.
 *  - handshake (phase 1): unmatched vertices send their candidate; ⊗ sees
 *    the receiver's candidate (needsRecvState) and ⊕ keeps the sender whose
 *    candidate is the receiver AND who is the receiver's candidate.
 * Terminates because every round the globally best edge between unmatched
 * vertices is locally dominant and matches; transcript-shaped graphs need
 * ≤6 rounds (the oracle unrolls 9 — extra rounds are no-ops at the
 * fixpoint).
 *
 * Edge key (cross-engine): 16-bit md5 priority of the canonical pair, then
 * the pair itself — the lexicographic tuple (pri, least, greatest) as a
 * native struct (Spark orders structs field-by-field under min/max), exact
 * for any 64-bit ids. The DuckDB twin packs the same tuple into an integer
 * (pri·2^40 + a·2^20 + b), which coincides with the struct order whenever
 * ids < 2^20 — true of every gate fixture; the engine itself has no id cap.
 */
object Matching {

  /** Lexicographic edge key (pri, a, b) over the canonical (a<b) pair as a
    * native STRUCT — Spark's min/max order structs field-by-field, so the
    * ⊕ stays an algebraic max with map-side partials, and unlike a packed
    * long the key is exact for ANY 64-bit vertex ids (an earlier packing
    * gave each id 20 bits, capping the graph at 2^20 vertices — too small
    * for the 65M-edge scale graph). On fixture-range ids (< 2^20) the
    * struct order coincides with the old packed-integer order, so the
    * g_matching DuckDB twin's packed arithmetic stays a faithful replay. */
  private def edgeKey(u: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) = {
    val a = least(u, v)
    val b = greatest(u, v)
    val pri = conv(substring(md5(concat(a.cast("string"), lit(":"), b.cast("string"), lit(":m"))), 1, 8),
      16, 10).cast("long") % 65536L
    struct(pri.as("pri"), a.as("a"), b.as("b"))
  }

  def run(graph: LinkGraph, cp: Option[CheckpointConfig] = None): RunResult = {
    val und = graph.undirected
    val init = und.vertices.select(
      col("id"), lit(true).as("active"),
      lit(-1L).as("mate"), lit(-1L).as("cand"), lit(0).as("phase"))
    val spec = VertexProgramSpec(
      direction = Direction.Out,
      activity = Activity.ActiveOnly,
      // active ⇔ unmatched, so the frontier is exactly the senders; both
      // phases send the candidate (ignored by the propose accumulator)
      send = fr => fr.select(col("id"), col("phase").as("sphase"), col("cand").as("scand")),
      needsRecvState = true,
      reduce = Reduce.byAggs(
        max(when(col("sphase") === 0, edgeKey(col("_send"), col("_recv")))).as("maxu"),
        max(when(col("sphase") === 1 && col("scand") === col("_recv") &&
          col("_send") === col("v_cand"), col("_send"))).as("hshake")),
      apply = (df, _) => {
        val lst = col("maxu").getField("a")
        val gst = col("maxu").getField("b")
        val newCand = when(col("phase") =!= 0 || col("mate") =!= -1L, col("cand"))
          .when(col("maxu").isNull, -1L)
          .otherwise(when(lst === col("id"), gst).otherwise(lst))
        val newMate = when(col("phase") === 1 && col("mate") === -1L,
          coalesce(col("hshake"), lit(-1L))).otherwise(col("mate"))
        df.select(col("id"), (newMate === -1L).as("active"),
          newMate.as("mate"), newCand.as("cand"),
          (lit(1) - col("phase")).as("phase"),
          (newMate =!= col("mate") || newCand =!= col("cand")).as("_changed"))
      },
      maxIterations = 64)
    Superstep.run(und, init, spec, cp)
  }

  /** (id, mate) over the vertices of the undirected simple view; -1 = unmatched. */
  def pairs(graph: LinkGraph): DataFrame =
    run(graph).state.select(col("id"), col("mate"))
}
