package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.LinkGraph

/**
 * HITS (Kleinberg's hubs-and-authorities) by synchronous power iteration
 * with per-phase L2 normalization:
 *
 *   auth'(v) = Σ_{(u,v)∈E} hub(u)   then  auth = auth' / ‖auth'‖₂
 *   hub'(u)  = Σ_{(u,v)∈E} auth(v)  then  hub  = hub'  / ‖hub'‖₂
 *
 * Beyond the reference's bundled app set, but expressed in the same two
 * primitives its runtime is built from: each half-iteration is one SpMV /
 * SpMTSpV (P1/P3 — a join against the pre-clustered edge view plus a sum
 * aggregate keyed on vertex id) and each norm is a MapReduce global fold
 * (P6, `/root/reference/include/GraphMatRuntime.h` program shapes). On the
 * transcript link graph, authorities are the heavily-replied-to turns and
 * hubs the turns that fan out into them.
 *
 * Scale shape (100 TB): both halves shuffle once on the vertex id the
 * aggregate already keys on; the edge side never re-shuffles (it joins from
 * `edgesBySrc`/`edgesByDst`); norms are tree-aggregated scalars collected to
 * the driver (one Double per half-iteration). State is localCheckpoint'd
 * every iteration, so the plan depth is constant in `iterations`.
 */
object Hits {

  /** Returns (id, hub, auth) after `iterations` full update rounds. */
  def run(graph: LinkGraph, iterations: Int = 5): DataFrame = {
    require(iterations >= 1, "HITS needs at least one iteration")
    val verts = graph.vertices // cached by LinkGraph
    var hub = verts.select(col("id"), lit(1.0).as("hub"))
    var auth: DataFrame = null
    for (it <- 1 to iterations) {
      // authority half: pull hub mass along in-edges (join keyed on src —
      // the CSR view — then aggregate on dst)
      val araw = graph.edgesBySrc
        .join(hub.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(sum("hub").as("x"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val an = math.sqrt(araw.agg(sum(col("x") * col("x"))).head().getDouble(0))
      auth = verts.join(araw, Seq("id"), "left_outer")
        .select(col("id"), (coalesce(col("x"), lit(0.0)) / an).as("auth"))
        .localCheckpoint() // eager: truncates lineage, lets araw go
      araw.unpersist(blocking = false)
      // hub half: pull authority mass along out-edges
      val hraw = graph.edgesByDst
        .join(auth.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id")).agg(sum("auth").as("x"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val hn = math.sqrt(hraw.agg(sum(col("x") * col("x"))).head().getDouble(0))
      hub = verts.join(hraw, Seq("id"), "left_outer")
        .select(col("id"), (coalesce(col("x"), lit(0.0)) / hn).as("hub"))
        .localCheckpoint()
      hraw.unpersist(blocking = false)
    }
    hub.join(auth, "id").select(col("id"), col("hub"), col("auth"))
  }
}
