package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.LinkGraph
import graft.engine._

/**
 * The reference's bundled vertex programs (SURVEY.md §2.7), re-expressed on
 * the Superstep engine, plus the two north-rule additions (connected
 * components, community label propagation). All are pure Column algebra —
 * the whole superstep stays in whole-stage codegen.
 */
object Degree {
  /**
   * The Degree program (`src/PageRank.cpp:53-79`): IN_EDGES + msg=1 + ⊕=sum
   * ⇒ every vertex counts its OUT-edges (GraphMat's IN_EDGES gathers at src
   * from dst — see Direction scaladoc). Algebraically that is one grouped
   * count, so we declare it as such and let Catalyst do partial+final agg;
   * `DegreeSpec.viaEngine` (tests) proves the superstep path agrees.
   */
  /** Both degree views read the src-clustered CACHED edge view (r06): every
    * degree consumer (PageRank/DeltaPR/Toposort/KCore init) also routes
    * messages through that view, so aggregating over it turns a second full
    * evaluation of the upstream edge derivation into a scan of materialized
    * blocks — and the groupBy(src) needs no exchange at all (the cache is
    * already hash-clustered on src). Guide §2.4. */
  def outDegrees(graph: LinkGraph): DataFrame =
    graph.edgesBySrc.groupBy(col("src").as("id")).agg(count("*").as("degree"))

  def inDegrees(graph: LinkGraph): DataFrame =
    graph.edgesBySrc.groupBy(col("dst").as("id")).agg(count("*").as("degree"))

  /** The literal 1-superstep vertex program, for engine-equivalence tests. */
  def viaEngine(graph: LinkGraph): DataFrame = {
    val init = graph.vertices
      .select(col("id"), lit(true).as("active"), lit(0L).as("degree"))
    val spec = VertexProgramSpec(
      direction = Direction.In,
      activity = Activity.AllVertices,
      send = fr => fr.select(col("id"), lit(1L).as("msg")),
      reduce = Reduce.byAggs(sum("msg").as("acc")),
      apply = (df, _) => df.select(
        col("id"), col("active"),
        coalesce(col("acc"), col("degree")).as("degree"),
        col("acc").isNotNull.as("_changed")),
      maxIterations = 1)
    Superstep.run(graph, init, spec).state.select("id", "degree")
  }
}

object PageRank {

  /**
   * GraphMat PageRank (`src/PageRank.cpp:81-161`), exact semantics:
   * state init pr=0.3 (PR ctor, `:39-42`); msg = pr/outdeg (0 if outdeg=0);
   * ⊕ = sum; apply pr' = α + (1−α)·Σ with α=0.3, applied only to vertices
   * that received ≥1 message; ALL_VERTICES; stop when no vertex moved by
   * more than `tol`=1e-5 (`PR::operator!=`, `:43-45`). Double accumulation
   * here vs float there — absorbed by the 1e-6 allclose target (SURVEY §7.4#1).
   *
   * Returns (id, degree, pagerank).
   */
  def run(graph: LinkGraph, alpha: Double = 0.3, tol: Double = 1e-5,
          maxIterations: Int = -1,
          cp: Option[CheckpointConfig] = None): RunResult = {
    val deg = Degree.outDegrees(graph)
    val init = graph.vertices
      .join(deg, Seq("id"), "left_outer")
      .select(
        col("id"), lit(true).as("active"),
        lit(0.3).as("pagerank"),
        coalesce(col("degree"), lit(0L)).as("degree"))
    Superstep.run(graph, init, spec(alpha, tol, maxIterations), cp)
  }

  def spec(alpha: Double, tol: Double, maxIterations: Int): VertexProgramSpec =
    VertexProgramSpec(
      direction = Direction.Out,
      activity = Activity.AllVertices,
      send = fr => fr.select(
        col("id"),
        when(col("degree") === 0, 0.0)
          .otherwise(col("pagerank") / col("degree")).as("msg")),
      reduce = Reduce.byAggs(sum("msg").as("acc")),
      apply = (df, _) => {
        val newPr = when(col("acc").isNull, col("pagerank"))
          .otherwise(lit(alpha) + lit(1.0 - alpha) * col("acc"))
        df.select(
          col("id"), lit(true).as("active"),
          newPr.as("pagerank"), col("degree"),
          (abs(newPr - col("pagerank")) > tol).as("_changed"))
      },
      maxIterations = maxIterations,
      // tol<0 = fixed-iteration mode: every vertex always "changes", so skip
      // the per-superstep convergence count (saves one job per superstep)
      trackChanges = tol >= 0)

  /**
   * Personalized PageRank (random walk with restart): the teleport mass is
   * confined to a source set instead of spread uniformly —
   * pr' = α·s(v) + (1−α)·Σ msg, s(v) = 1 for sources else 0, init pr = s(v).
   * Same superstep shape as global PageRank (one send projection, one
   * grouped sum, one apply — identical plan, so it inherits every scale
   * property: pre-clustered edge join, hub split, map-side partial sums).
   * Fixed-iteration mode so a gate's unrolled SQL twin replays it exactly.
   * Returns (id, ppr).
   */
  def personalized(graph: LinkGraph, isSource: org.apache.spark.sql.Column,
                   iterations: Int, alpha: Double = 0.3): DataFrame = {
    val deg = Degree.outDegrees(graph)
    val sv = when(isSource, 1.0).otherwise(0.0)
    val init = graph.vertices
      .join(deg, Seq("id"), "left_outer")
      .select(col("id"), lit(true).as("active"),
        sv.as("sv"), sv.as("pagerank"),
        coalesce(col("degree"), lit(0L)).as("degree"))
    val pprSpec = VertexProgramSpec(
      direction = Direction.Out,
      activity = Activity.AllVertices,
      send = fr => fr.select(col("id"),
        when(col("degree") === 0, 0.0)
          .otherwise(col("pagerank") / col("degree")).as("msg")),
      reduce = Reduce.byAggs(sum("msg").as("acc")),
      apply = (df, _) => df.select(
        col("id"), lit(true).as("active"), col("sv"),
        (lit(alpha) * col("sv") +
          lit(1.0 - alpha) * coalesce(col("acc"), lit(0.0))).as("pagerank"),
        col("degree"), lit(true).as("_changed")),
      maxIterations = iterations,
      trackChanges = false)
    Superstep.run(graph, init, pprSpec).state
      .select(col("id"), col("pagerank").as("ppr"))
  }
}

/**
 * Connected components via HashMin label propagation — a GraphMat v1 app the
 * north rule requires; one-superstep-pattern variant of SSSP (⊗=identity,
 * ⊕=min over an undirected view). Converges in O(diameter) supersteps; each
 * vertex ends with the minimum vertex id of its (weakly) connected component.
 */
object ConnectedComponents {
  def run(graph: LinkGraph, cp: Option[CheckpointConfig] = None): RunResult = {
    val und = graph.undirected
    val init = und.vertices.select(
      col("id"), lit(true).as("active"), col("id").as("component"))
    val spec = VertexProgramSpec(
      direction = Direction.Out, // undirected view holds both directions
      activity = Activity.ActiveOnly,
      send = fr => fr.select(col("id"), col("component").as("msg")),
      reduce = Reduce.byAggs(min("msg").as("acc")),
      apply = (df, _) => {
        val newC = least(col("component"), col("acc"))
        val changed = col("acc").isNotNull && col("acc") < col("component")
        df.select(
          col("id"), changed.as("active"),
          when(changed, newC).otherwise(col("component")).as("component"),
          changed.as("_changed"))
      })
    Superstep.run(und, init, spec, cp)
  }
}

/**
 * Community label propagation (north-rule addition): synchronous LP — each
 * superstep every vertex adopts the most frequent label among its neighbors
 * (undirected view), deterministic tie-break on the smaller label; keeps its
 * label when it has no neighbors. The ⊕ (mode-of-labels) is not a single
 * commutative fold, so `reduce` is a two-level aggregation: count per
 * (vertex, label), then max_by((count, -label)) — both hash aggregates with
 * map-side partials, no custom UDAF needed.
 *
 * LP can oscillate on bipartite-ish structures, so callers pass a fixed
 * iteration budget (the usual practice); a true fixpoint also stops early.
 */
object LabelPropagation {
  def run(graph: LinkGraph, iterations: Int,
          cp: Option[CheckpointConfig] = None): RunResult = {
    val und = graph.undirected
    val init = und.vertices.select(
      col("id"), lit(true).as("active"), col("id").as("label"))
    val spec = VertexProgramSpec(
      direction = Direction.Out,
      activity = Activity.AllVertices,
      send = fr => fr.select(col("id"), col("label").as("msg")),
      reduce = df => df
        .groupBy(col("_recv"), col("msg")).agg(count("*").as("cnt"))
        .groupBy("_recv")
        .agg(max_by(col("msg"), struct(col("cnt"), (-col("msg")).as("neg"))).as("acc")),
      apply = (df, _) => {
        val newL = coalesce(col("acc"), col("label"))
        df.select(
          col("id"), lit(true).as("active"), newL.as("label"),
          (newL =!= col("label")).as("_changed"))
      },
      maxIterations = iterations)
    Superstep.run(und, init, spec, cp)
  }
}

/**
 * BFS (`src/BFS.cpp:40-156`): depth + parent from a source. OUT_EDGES,
 * ACTIVE_ONLY; msg = sender id; apply sets depth = superstep index on first
 * touch. The reference's ⊕ is "arbitrary pick" (`BFS.cpp:75-77`, thread-order
 * dependent); we pick the MINIMUM sender id for determinism — a documented
 * deviation that never changes depths, only parents (SURVEY §7.4#2).
 * Unreached vertices keep depth = -1, parent = -1.
 */
object Bfs {
  def run(graph: LinkGraph, source: Long,
          cp: Option[CheckpointConfig] = None): RunResult = {
    val init = graph.vertices.select(
      col("id"),
      (col("id") === source).as("active"),
      when(col("id") === source, 0L).otherwise(-1L).as("depth"),
      when(col("id") === source, source).otherwise(-1L).as("parent"))
    val spec = VertexProgramSpec(
      direction = Direction.Out,
      activity = Activity.ActiveOnly,
      send = fr => fr.select(col("id"), col("id").as("msg")),
      reduce = Reduce.byAggs(min("msg").as("acc")),
      apply = (df, iter) => {
        val first = col("acc").isNotNull && col("depth") === -1L
        df.select(
          col("id"), first.as("active"),
          when(first, lit(iter + 1).cast("long")).otherwise(col("depth")).as("depth"),
          when(first, col("acc")).otherwise(col("parent")).as("parent"),
          first.as("_changed"))
      })
    Superstep.run(graph, init, spec, cp)
  }
}

/**
 * SSSP, Bellman-Ford flavor (`src/SSSP.cpp:44-142`): msg = dist, ⊗ = msg +
 * edge weight, ⊕ = min, apply = min into state; OUT_EDGES, ACTIVE_ONLY.
 * Unreachable vertices keep dist = +∞ (the reference's MAX sentinel).
 */
object Sssp {
  def run(graph: LinkGraph, source: Long,
          cp: Option[CheckpointConfig] = None): RunResult = {
    val inf = Double.PositiveInfinity
    val init = graph.vertices.select(
      col("id"),
      (col("id") === source).as("active"),
      when(col("id") === source, 0.0).otherwise(inf).as("dist"))
    val spec = VertexProgramSpec(
      direction = Direction.Out,
      activity = Activity.ActiveOnly,
      send = fr => fr.select(col("id"), col("dist").as("msg")),
      gather = df => df.withColumn("msg", col("msg") + col("weight")),
      reduce = Reduce.byAggs(min("msg").as("acc")),
      apply = (df, _) => {
        val better = col("acc").isNotNull && col("acc") < col("dist")
        df.select(
          col("id"), better.as("active"),
          when(better, col("acc")).otherwise(col("dist")).as("dist"),
          better.as("_changed"))
      })
    Superstep.run(graph, init, spec, cp)
  }
}

/**
 * Triangle counting (`src/TriangleCounting.cpp:39-216`). The reference runs
 * two supersteps whose ⊕ materializes per-vertex neighbor LISTS — unbounded
 * state that melts on hub vertices. Same semantics, Spark-first: triangles in
 * the DAG-canonicalized edge set (src<dst, the input shape the reference
 * expects) are 3-cliques (a<b<c) found by a self-join on the shared endpoint
 * + a semi-join on the closing edge. Per-vertex attribution matches the
 * reference: tri[v] = |{(u,w): w→u, w→v, u→v}| = # triangles whose LARGEST
 * vertex is v (each triangle attributed exactly once).
 *
 * Returns (id, triangles); total = sum (the reference's
 * `applyReduceAllVertices`, `TriangleCounting.cpp:194-196`).
 */
object TriangleCount {
  /** Orient the canonical (src<dst) edge set from the (degree, id)-smaller
    * endpoint — the standard scale fix: after orientation, out-degree is
    * O(sqrt(E)) even for hubs, so the wedge join enumerates O(E^1.5)
    * candidates instead of deg(hub)^2 around a hub. Returns
    * (lo, hi, dh = degree(hi)). */
  private[graft] def orientByDegree(e: DataFrame): DataFrame = {
    val deg = e.select(col("src").as("x")).union(e.select(col("dst").as("x")))
      .groupBy("x").agg(count("*").as("d"))
    val srcFirst =
      col("ds") < col("dd") || (col("ds") === col("dd") && col("src") < col("dst"))
    e.join(deg.select(col("x").as("src"), col("d").as("ds")), "src")
      .join(deg.select(col("x").as("dst"), col("d").as("dd")), "dst")
      .select(
        when(srcFirst, col("src")).otherwise(col("dst")).as("lo"),
        when(srcFirst, col("dst")).otherwise(col("src")).as("hi"),
        when(srcFirst, col("dd")).otherwise(col("ds")).as("dh"))
  }

  /** Every triangle exactly once, as (w, u, v) rows: w is the
    * (degree, id)-minimal corner, the closing edge (u, v) is oriented by the
    * same total order the wedge filter uses, so a semi-join against the
    * oriented edge set closes it. All of perVertex / participation /
    * clustering share this one enumeration. */
  private[graft] def triangles(graph: LinkGraph): DataFrame = {
    // the canonical DAG feeds orientByDegree THREE ways (degree count + two
    // join sides) and the oriented set feeds three consumers (both wedge
    // sides + the closing semi-join); materialize each once instead of
    // re-running the upstream edge derivation per branch (guide §2.4)
    val e = graft.core.EdgeOps.toDag(graph.edges).select("src", "dst").localCheckpoint(false)
    val o = orientByDegree(e).localCheckpoint(false)
    val o1 = o.select(col("lo").as("w"), col("hi").as("u"), col("dh").as("du"))
    val o2 = o.select(col("lo").as("w2"), col("hi").as("v"), col("dh").as("dv"))
    val wedges = o1.join(o2, col("w") === col("w2") &&
      (col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))))
    val closing = o.select(col("lo").as("u3"), col("hi").as("v3"))
    wedges.join(closing,
      col("u") === col("u3") && col("v") === col("v3"), "left_semi")
      .select("w", "u", "v")
  }

  def perVertex(graph: LinkGraph): DataFrame = {
    // per-vertex attribution matches the reference: the LARGEST original id
    // of the triangle gets the count (`TriangleCounting.cpp:39-216`)
    val counts = triangles(graph)
      .groupBy(greatest(col("w"), col("u"), col("v")).as("id"))
      .agg(count("*").as("triangles"))
    graph.vertices.join(counts, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** Triangles THROUGH each vertex (all three corners credited) — the input
    * the local clustering coefficient needs; Σ participation = 3 × total. */
  def participation(graph: LinkGraph): DataFrame = {
    val counts = triangles(graph)
      .select(explode(array(col("w"), col("u"), col("v"))).as("id"))
      .groupBy("id").agg(count("*").as("triangles"))
    graph.vertices.join(counts, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /**
   * Local clustering coefficient over the undirected simple view:
   * cc(v) = 2·t(v) / (d(v)·(d(v)−1)) with t = triangle participation and
   * d = distinct-neighbor count; 0 when d < 2. One triangle enumeration +
   * one degree aggregate + one hash join — no all-pairs anywhere, so the
   * plan scales exactly as far as triangle counting does (O(E^1.5) wedge
   * bound after degree orientation).
   */
  def localClustering(graph: LinkGraph): DataFrame = {
    val dag = graft.core.EdgeOps.toDag(graph.edges).select("src", "dst").localCheckpoint(false)
    val deg = dag.select(col("src").as("id")).union(dag.select(col("dst").as("id")))
      .groupBy("id").agg(count("*").as("d"))
    participation(graph).join(deg, Seq("id"), "left_outer")
      .select(col("id"),
        when(coalesce(col("d"), lit(0L)) < 2, 0.0)
          .otherwise(lit(2.0) * col("triangles") / (col("d") * (col("d") - lit(1.0))))
          .as("cc"))
  }

  def total(graph: LinkGraph): Long =
    perVertex(graph).agg(sum("triangles")).head().getLong(0)
}
