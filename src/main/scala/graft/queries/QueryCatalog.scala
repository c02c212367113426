package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.algos._
import graft.core.EdgeOps

/**
 * The driver-gate query surface: every entry has a Spark implementation here
 * and (where SQL-expressible) an exact DuckDB twin in `oracleSql`, run by the
 * round driver over the same parquet tables. Graph queries run the REAL
 * iterative engine; the oracles replay the same semantics as (unrolled or
 * closed-form) SQL.
 */
object QueryCatalog {
  import EventGraph._

  private def minVertex(g: graft.core.LinkGraph): Long =
    g.vertices.agg(min("id")).head().getLong(0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational anchors (scan/filter/agg/join/window/top-k) ----
    "q1_agg" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("sum_qty"))),
    "q_join" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      val c = s.read.parquet(s"$dir/customer.parquet")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count("*").as("n_orders"), round(sum("o_totalprice") + 1e-9, 4).as("rev"))
    }),
    "q_window" -> ((s, dir) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      s.read.parquet(s"$dir/lineitem.parquet")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "rk")
    }),
    "q_topk" -> ((s, dir) =>
      s.read.parquet(s"$dir/orders.parquet")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)),

    // ---- edge-list operators (SURVEY.md §2.5) ----
    "e_dag" -> ((s, dir) =>
      EdgeOps.toDag(richEdges(events(s, dir))).select("src", "dst")),
    "e_dims" -> ((s, dir) => {
      val (m, n) = EdgeOps.dimensions(richEdges(events(s, dir)))
      s.range(1).select(lit(m).as("m"), lit(n).as("n"))
    }),
    // P9 ApplyEdges: new edge weight from (old weight, src prop, dst prop)
    "e_applyedges" -> ((s, dir) => {
      val g = bucketGraph(s, dir)
      val deg = Degree.outDegrees(g)
      val state = g.vertices.join(deg, Seq("id"), "left_outer")
        .select(col("id"), lit(true).as("active"),
          coalesce(col("degree"), lit(0L)).as("degree"))
      graft.core.VertexOps.applyToAllEdges(g, state,
          round(col("weight") * (lit(1) + col("s_degree")) / (lit(1) + col("d_degree")) + 1e-9, 6))
        .select(col("src"), col("dst"), col("weight").as("new_weight"))
    }),

    // remaining §2.5 transforms, all deterministic + SQL-replayable:
    // create_bidirectional_edges on the bucket chains
    "e_bidir" -> ((s, dir) =>
      EdgeOps.bidirectional(bucketEdges(events(s, dir)))
        .select(col("src"), col("dst"), round(col("weight") + 1e-9, 6).as("weight"))),
    // shuffle_edges: redistribution must not change the row multiset (the
    // driver's compare sorts rows, so this IS the partition-invariance check)
    "e_shuffle" -> ((s, dir) =>
      EdgeOps.shuffleBySrc(bucketEdges(events(s, dir)), 7)
        .select(col("src"), col("dst"), round(col("weight") + 1e-9, 6).as("weight"))),
    // randomize_edgelist_square under an md5 hash order (cross-engine seed)
    "e_permute" -> ((s, dir) =>
      EdgeOps.permuteIdsBy(richEdges(events(s, dir)),
          id => md5(id.cast("string")))
        .select("src", "dst")),
    // remove_empty_columns: compact dst ids to dense 1..k
    "e_compact" -> ((s, dir) =>
      EdgeOps.compactDstIds(bucketEdges(events(s, dir)))._1
        .select(col("src"), col("dst"), round(col("weight") + 1e-9, 6).as("weight"))),
    // filter_edges_by_row: row-block extraction with re-based src
    "e_rowblock" -> ((s, dir) =>
      EdgeOps.filterByRow(bucketEdges(events(s, dir)), 100L, 900L)
        .select(col("src"), col("dst"), round(col("weight") + 1e-9, 6).as("weight"))),
    // the graph_converter CLI composition end-to-end (tools/GraphConverter
    // .scala; reference src/graph_converter.cpp:161-222) with its
    // deterministic flags, in the CLI's own order: shuffle → remove
    // self-loops → bidirectional → upper-triangular → dedup → id permutation
    // (md5 order, the cross-engine seed)
    "e_converter" -> ((s, dir) => {
      var e = richEdges(events(s, dir))
      e = EdgeOps.shuffleBySrc(e, 8)
      e = EdgeOps.removeSelfEdges(e)
      e = EdgeOps.bidirectional(e)
      e = EdgeOps.toDag(e)
      e = EdgeOps.dedupEdges(e)
      e = EdgeOps.permuteIdsBy(e, id => md5(id.cast("string")))
      e.select(col("src"), col("dst"), round(col("weight") + 1e-9, 6).as("weight"))
    }),

    // ---- graph algorithms over the events-derived link graph ----
    "g_degree" -> ((s, dir) =>
      Degree.outDegrees(richGraph(s, dir)).select(col("id"), col("degree"))),
    "g_pagerank" -> ((s, dir) =>
      // fixed 10 supersteps (tol<0 disables the stability stop) so the
      // unrolled SQL twin is exact; convergence semantics are covered by
      // sbt tests against the reference fold
      PageRank.run(richGraph(s, dir), alpha = 0.3, tol = -1.0, maxIterations = 10)
        .state.select(col("id"), round(col("pagerank") + 1e-9, 6).as("pr"))),
    "g_cc" -> ((s, dir) =>
      ConnectedComponents.run(bucketGraph(s, dir))
        .state.select(col("id"), col("component"))),
    "g_lp" -> ((s, dir) =>
      LabelPropagation.run(richGraph(s, dir), iterations = 2)
        .state.select(col("id"), col("label"))),
    // LP on the CSR fast path — the kernel's (mode, ·) pass: the exchange
    // ships RLE'd label histograms instead of packed sums; same external
    // oracle as the column-engine g_lp (engine/GatherScatter.scala)
    "g_lp_csr" -> ((s, dir) => {
      val built = graft.engine.GatherScatter.build(richGraph(s, dir).undirected, 8)
      val (labels, _) = graft.engine.GatherScatter.labelPropagation(built, 2)
      graft.engine.GatherScatter.toDF(s, labels)
        .select(col("id"), col("pagerank").cast("long").as("label"))
    }),
    "g_bfs" -> ((s, dir) => {
      val g = bucketGraph(s, dir)
      Bfs.run(g, minVertex(g)).state
        .filter(col("depth") >= 0).select(col("id"), col("depth"))
    }),
    // the same two algorithms on the CSR (min,+) fast path — the gather-
    // scatter kernel's SECOND semiring, gated against the same external
    // oracles the column-engine variants use (engine/GatherScatter.scala)
    "g_cc_csr" -> ((s, dir) => {
      val built = graft.engine.GatherScatter.build(bucketGraph(s, dir).undirected, 8)
      val (labels, _) = graft.engine.GatherScatter.connectedComponents(built)
      graft.engine.GatherScatter.toDF(s, labels)
        .select(col("id"), col("pagerank").cast("long").as("component"))
    }),
    "g_bfs_csr" -> ((s, dir) => {
      val g = bucketGraph(s, dir)
      val src = minVertex(g)
      val built = graft.engine.GatherScatter.build(g, 8)
      val (depths, _) = graft.engine.GatherScatter.bfs(built, src)
      graft.engine.GatherScatter.toDF(s, depths)
        .filter(col("pagerank") =!= Double.PositiveInfinity)
        .select(col("id"), col("pagerank").cast("long").as("depth"))
    }),
    "g_sssp" -> ((s, dir) => {
      val g = bucketGraph(s, dir)
      Sssp.run(g, minVertex(g)).state
        .filter(col("dist") =!= Double.PositiveInfinity)
        .select(col("id"), round(col("dist") + 1e-9, 6).as("dist"))
    }),
    // SSSP on the CSR weighted (min,+) fast path — the kernel's third
    // semiring instance (per-edge weights), same external oracle as g_sssp
    "g_sssp_csr" -> ((s, dir) => {
      val g = bucketGraph(s, dir)
      val src = minVertex(g)
      val built = graft.engine.GatherScatter.build(g, 8, weighted = true)
      val (dists, _) = graft.engine.GatherScatter.sssp(built, src)
      graft.engine.GatherScatter.toDF(s, dists)
        .filter(col("pagerank") =!= Double.PositiveInfinity)
        .select(col("id"), round(col("pagerank") + 1e-9, 6).as("dist"))
    }),
    "g_triangle" -> ((s, dir) =>
      TriangleCount.perVertex(richGraph(s, dir)).select(col("id"), col("triangles"))),
    // triangles on the CSR fast path (compact-forward over sorted primitive
    // adjacency blocks — engine/TriangleCsr.scala); same external oracle as
    // the column-engine g_triangle
    "g_triangle_csr" -> ((s, dir) =>
      graft.engine.TriangleCsr.perVertex(richGraph(s, dir), 8)),
    "g_toposort" -> ((s, dir) =>
      // bucket chains are disjoint paths: Kahn order == position in the path
      TopologicalSort.run(bucketGraph(s, dir)).state.select(col("id"), col("order"))),
    // Kahn peel on the CSR per-vertex sparse frontier
    // (engine/ToposortCsr.scala); same oracle as g_toposort
    "g_toposort_csr" -> ((s, dir) => {
      val built = graft.engine.GatherScatter.build(bucketGraph(s, dir), 8)
      val (orders, _) = graft.engine.ToposortCsr.run(built)
      graft.engine.GatherScatter.toDF(s, orders)
        .select(col("id"), col("pagerank").cast("long").as("order"))
    }),
    // local clustering coefficient: triangle participation (all three
    // corners credited) over the same enumeration g_triangle uses, divided
    // by the distinct-neighbor wedge count
    "g_clustcoef" -> ((s, dir) =>
      TriangleCount.localClustering(richGraph(s, dir))
        .select(col("id"), round(col("cc") + 1e-9, 6).as("cc"))),
    // personalized PageRank (random walk with restart) from the id%97
    // source set; fixed 10 supersteps like g_pagerank so the unrolled
    // SQL twin is exact
    "g_ppr" -> ((s, dir) =>
      PageRank.personalized(richGraph(s, dir), col("id") % 97 === 0,
          iterations = 10)
        .select(col("id"), round(col("ppr") + 1e-9, 6).as("ppr"))),
    // 2-core membership via the engine's synchronous peel (KCore — the
    // undirected twin of the Kahn peel); the oracle unrolls 4 peel rounds
    // (extra rounds are no-ops once the fixpoint is reached)
    "g_kcore" -> ((s, dir) =>
      KCore.membership(richGraph(s, dir), 2)),
    // personalized PageRank on the CSR fast path (per-vertex teleport base
    // through the same split exchange); same oracle as g_ppr
    "g_ppr_csr" -> ((s, dir) => {
      val built = graft.engine.GatherScatter.build(richGraph(s, dir), 8)
      val ranks = graft.engine.GatherScatter.personalizedPageRank(
        built, _ % 97 == 0, alpha = 0.3, iterations = 10)
      graft.engine.GatherScatter.toDF(s, ranks)
        .select(col("id"), round(col("pagerank") + 1e-9, 6).as("ppr"))
    }),
    // ANF/HyperBall neighborhood sketches: 4 FM bit registers per vertex
    // OR-folded along out-edges for 3 supersteps (the vector_bitor native
    // aggregate as ⊕). The gate ships the raw registers — deterministic
    // integers the oracle replays bit-for-bit
    "g_neigh" -> ((s, dir) =>
      Neighborhood.sketches(richGraph(s, dir), hops = 3, k = 4)
        .select(col("id"), posexplode(col("sk")).as(Seq("r", "reg")))
        .withColumn("r", col("r").cast("long"))),
    // DeepWalk corpus: 2 md5-deterministic walks of length 4 from every
    // vertex, each step one (src, idx) equi-join against the indexed
    // adjacency; the oracle replays every pick row-for-row
    "g_walks" -> ((s, dir) =>
      RandomWalks.corpus(richGraph(s, dir), walksPerVertex = 2, length = 4)),
    // skip-gram co-occurrence counts over the same corpus (window 2) — the
    // word2vec training input
    "g_walk_pairs" -> ((s, dir) =>
      RandomWalks.skipGramPairs(
          RandomWalks.corpus(richGraph(s, dir), walksPerVertex = 2, length = 4),
          window = 2)
        .groupBy("center", "context", "offset").agg(count(lit(1)).as("n"))),
    // deterministic Luby MIS (fixed md5 priorities, synchronous rounds to
    // convergence); the oracle unrolls 12 rounds over the same undirected
    // simple view — extra rounds are no-ops at the fixpoint
    "g_mis" -> ((s, dir) => Mis.membership(richGraph(s, dir))),
    // Jones-Plassmann greedy coloring on the same fixed priorities (the
    // engine's 3-op shape: gather compares sender vs receiver priority);
    // oracle unrolls 18 rounds, measured depth 12 at sf0.01
    "g_coloring" -> ((s, dir) => Coloring.colors(richGraph(s, dir))),
    // locally-dominant greedy maximal matching on fixed md5 edge keys (the
    // propose/handshake rounds alternate on a phase bit in vertex state);
    // oracle unrolls 9 rounds — extra rounds are no-ops at the fixpoint
    "g_matching" -> ((s, dir) => Matching.pairs(richGraph(s, dir))),
    // Newman modularity of the 2-iteration LP partition over the undirected
    // simple view — the quality fold on top of the g_lp gate's labels
    "g_modularity" -> ((s, dir) => {
      val g = richGraph(s, dir)
      Modularity.score(g,
        LabelPropagation.run(g, iterations = 2).state.select("id", "label"))
    }),
    // 3-truss peel: every surviving edge sits in ≥1 triangle within the
    // survivor set; the oracle unrolls 6 peel rounds (fixpoint ≤4 measured)
    "g_ktruss" -> ((s, dir) => KTruss.edges(richGraph(s, dir), 3)),
    // strongly connected components by forward-backward min-label refinement
    // on the cyclic bucket graph: each 10-row bucket is one cycle, cross
    // edges go strictly forward, so the true SCC partition has the closed
    // form scc = min(event_id) per (user, bucket) — the oracle states the
    // ANSWER, not a replay, making this gate algorithm-independent
    // runFast: refinement phases on the CSR (min,+) kernel — bit-equal to
    // the column-engine Scc.run (SccSpec pins both against Tarjan)
    "g_scc" -> ((s, dir) =>
      Scc.runFast(graft.core.LinkGraph(cyclicBucketEdges(events(s, dir))))),
    // HITS hubs/authorities: 5 full update rounds with L2 normalization,
    // unrolled exactly in the twin (norms are scalar subqueries)
    "g_hits" -> ((s, dir) =>
      Hits.run(richGraph(s, dir), iterations = 5)
        .select(col("id"), round(col("hub") + 1e-9, 6).as("hub"),
                round(col("auth") + 1e-9, 6).as("auth"))),
    // Adamic-Adar link prediction: top-20 non-adjacent pairs by shared-
    // neighbor score; scores rounded BEFORE ranking so the k-cut can't
    // hinge on summation-order ulps
    "g_linkpred" -> ((s, dir) =>
      LinkPrediction.adamicAdar(richGraph(s, dir), k = 20))
  )

  // ---------- DuckDB oracle twins ----------

  private val prUnrolled: String = {
    val iters = (1 to 10).map { k =>
      s"""pr$k AS (
         |  SELECT rv.id, coalesce(0.3 + 0.7*m.s, 0.3) AS pr FROM rv LEFT JOIN (
         |    SELECT e.dst AS id, sum(p.pr/deg.d) AS s
         |    FROM rich e JOIN pr${k - 1} p ON p.id = e.src JOIN deg ON deg.src = e.src
         |    GROUP BY 1) m ON m.id = rv.id)""".stripMargin
    }.mkString(",\n")
    EventGraph.sqlBase +
      s""", deg AS (SELECT src, count(*) AS d FROM rich GROUP BY 1),
         |pr0 AS (SELECT id, CAST(0.3 AS DOUBLE) AS pr FROM rv),
         |$iters
         |SELECT id, round(pr + 1e-9, 6) AS pr FROM pr10""".stripMargin
  }

  // shared by g_sssp (column engine) and g_sssp_csr (weighted (min,+) CSR
  // kernel): bucket chains make shortest distance a prefix sum of weights
  private val ssspOracle: String = EventGraph.sqlBase +
    """, mrn AS (
      |  SELECT src AS id, user_id, bkt, rn FROM bucket
      |  UNION SELECT dst, user_id, bkt, rn + 1 FROM bucket),
      |wv AS (SELECT m.id, m.user_id, m.bkt, m.rn, 1.0 + abs(b.value) AS wgt
      |       FROM mrn m JOIN base b ON b.event_id = m.id),
      |cum AS (SELECT *, sum(wgt) OVER (PARTITION BY user_id, bkt ORDER BY rn) AS c FROM wv),
      |s0 AS (SELECT * FROM cum WHERE id = (SELECT min(id) FROM cum))
      |SELECT m.id, round(m.c - s0.c + 1e-9, 6) AS dist FROM cum m, s0
      |WHERE m.user_id = s0.user_id AND m.bkt = s0.bkt AND m.rn >= s0.rn""".stripMargin

  /** LP rounds as a WITH prologue (labels land in l2) — shared by the g_lp
    * twins and the modularity fold on top of them. */
  private val lpWith: String = {
    def round(k: Int) =
      s"""n$k AS (SELECT u.dst AS id, l.label, count(*) AS c
         |  FROM und u JOIN l${k - 1} l ON l.id = u.src GROUP BY 1, 2),
         |p$k AS (SELECT id, label, row_number() OVER (PARTITION BY id ORDER BY c DESC, label ASC) AS rk FROM n$k),
         |l$k AS (SELECT rv.id, coalesce(p.label, rv.id) AS label
         |  FROM rv LEFT JOIN (SELECT id, label FROM p$k WHERE rk = 1) p ON p.id = rv.id)""".stripMargin
    EventGraph.sqlBase +
      s""", canon AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b FROM rich WHERE src <> dst),
         |und AS (SELECT a AS src, b AS dst FROM canon UNION ALL SELECT b, a FROM canon),
         |l0 AS (SELECT id, id AS label FROM rv),
         |${round(1)},
         |${round(2)}
         |""".stripMargin
  }

  private val lpUnrolled: String = lpWith + "SELECT id, label FROM l2"

  /** Modularity twin: the LP labels (l2), then Q = Σ_c [e_c/m − (d_c/2m)²]
    * over the canonical simple view. */
  private lazy val modularityOracle: String = lpWith +
    """, tg AS (SELECT la.label AS la, lb.label AS lb
      |         FROM canon JOIN l2 la ON la.id = canon.a JOIN l2 lb ON lb.id = canon.b),
      |mm AS (SELECT count(*) AS m FROM canon),
      |deg AS (SELECT c, count(*) AS d
      |        FROM (SELECT la AS c FROM tg UNION ALL SELECT lb FROM tg) q GROUP BY 1),
      |intra AS (SELECT la AS c, count(*) AS e FROM tg WHERE la = lb GROUP BY 1)
      |SELECT mm.m AS m, count(*) AS n_communities,
      |       round(sum(coalesce(i.e, 0) * 1.0 / mm.m - pow(d.d / (2.0 * mm.m), 2)) + 1e-9, 6) AS modularity
      |FROM deg d LEFT JOIN intra i ON i.c = d.c, mm
      |GROUP BY mm.m""".stripMargin

  /** Matching twin: 9 unrolled propose/handshake rounds on the same edge
    * keys the engine uses — key = pri16·2^40 + a·2^20 + b. */
  private lazy val matchingUnrolled: String = {
    val key = s"(${hexI("md5(least(u.a,u.b) || ':' || greatest(u.a,u.b) || ':m')")} % 65536)" +
      " * 1099511627776 + least(u.a,u.b) * 1048576 + greatest(u.a,u.b)"
    val rounds = (1 to 9).map { r =>
      s"""cd$r AS MATERIALIZED (
         |  SELECT u.a AS id, max($key) AS mk
         |  FROM und u JOIN st${r - 1} sa ON sa.id = u.a JOIN st${r - 1} sb ON sb.id = u.b
         |  WHERE sa.mate = -1 AND sb.mate = -1
         |  GROUP BY 1),
         |cn$r AS MATERIALIZED (
         |  SELECT id, CASE WHEN ((mk >> 20) & 1048575) = id THEN mk & 1048575
         |                  ELSE (mk >> 20) & 1048575 END AS cand FROM cd$r),
         |st$r AS MATERIALIZED (
         |  SELECT s.id,
         |    CASE WHEN s.mate <> -1 THEN s.mate
         |         WHEN c2.cand = s.id THEN c1.cand
         |         ELSE -1 END AS mate
         |  FROM st${r - 1} s
         |  LEFT JOIN cn$r c1 ON c1.id = s.id
         |  LEFT JOIN cn$r c2 ON c2.id = c1.cand)""".stripMargin
    }.mkString(",\n")
    EventGraph.sqlBase +
      s""", canon AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b FROM rich WHERE src <> dst),
         |und AS (SELECT a, b FROM canon UNION ALL SELECT b, a FROM canon),
         |st0 AS (SELECT id, CAST(-1 AS BIGINT) AS mate FROM rv),
         |$rounds
         |SELECT id, mate FROM st9""".stripMargin
  }

  /** 3-truss twin: 6 unrolled support-peel rounds over the canonical simple
    * view, then the fixpoint support recount. */
  private lazy val ktrussUnrolled: String = {
    def sup(r: Int, src: String) =
      s"""sup$r AS (
         |  SELECT e.a, e.b, count(*) AS s
         |  FROM $src e JOIN u${r - 1} x ON x.a = e.a
         |  JOIN u${r - 1} y ON y.a = e.b AND y.b = x.b
         |  GROUP BY 1, 2)""".stripMargin
    val rounds = (1 to 6).map { r =>
      s"""${sup(r, s"t${r - 1}")},
         |t$r AS MATERIALIZED (
         |  SELECT e.a, e.b FROM t${r - 1} e JOIN sup$r s ON s.a = e.a AND s.b = e.b
         |  WHERE s.s >= 1),
         |u$r AS (SELECT a, b FROM t$r UNION ALL SELECT b AS a, a AS b FROM t$r)""".stripMargin
    }.mkString(",\n")
    EventGraph.sqlBase +
      s""", t0 AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b FROM rich WHERE src <> dst),
         |u0 AS (SELECT a, b FROM t0 UNION ALL SELECT b AS a, a AS b FROM t0),
         |$rounds,
         |fin AS (
         |  SELECT e.a, e.b, count(*) AS support
         |  FROM t6 e JOIN u6 x ON x.a = e.a
         |  JOIN u6 y ON y.a = e.b AND y.b = x.b
         |  GROUP BY 1, 2)
         |SELECT a, b, support FROM fin""".stripMargin
  }

  /** SCC twin: the cyclic bucket graph's components ARE the buckets (every
    * cross edge is forward in bucket order), so the oracle is the closed
    * form — min event id per (user, bucket), over users with ≥2 events
    * (a 1-event user yields no edges, hence no vertex on the Spark side). */
  private val sccOracle: String = EventGraph.sqlBase +
    """, sv AS (
      |  SELECT event_id, user_id, CAST(floor((rn-1)/10) AS BIGINT) AS bkt
      |  FROM base),
      |uc AS (SELECT user_id FROM sv GROUP BY 1 HAVING count(*) >= 2)
      |SELECT s.event_id AS id, m.scc
      |FROM sv s
      |JOIN (SELECT user_id, bkt, min(event_id) AS scc FROM sv GROUP BY 1, 2) m
      |  USING (user_id, bkt)
      |JOIN uc USING (user_id)""".stripMargin

  /** HITS twin: 5 unrolled update rounds; each half is one join+sum and an
    * L2 scalar subquery — MATERIALIZED so the double reference (values +
    * norm) never re-inlines the round below it. */
  private lazy val hitsUnrolled: String = {
    val iters = (1 to 5).map { k =>
      s"""ar$k AS MATERIALIZED (
         |  SELECT e.dst AS id, sum(h.h) AS x FROM rich e JOIN h${k - 1} h ON h.id = e.src GROUP BY 1),
         |a$k AS MATERIALIZED (
         |  SELECT rv.id, coalesce(ar$k.x, 0) / (SELECT sqrt(sum(x*x)) FROM ar$k) AS a
         |  FROM rv LEFT JOIN ar$k ON ar$k.id = rv.id),
         |hr$k AS MATERIALIZED (
         |  SELECT e.src AS id, sum(a.a) AS x FROM rich e JOIN a$k a ON a.id = e.dst GROUP BY 1),
         |h$k AS MATERIALIZED (
         |  SELECT rv.id, coalesce(hr$k.x, 0) / (SELECT sqrt(sum(x*x)) FROM hr$k) AS h
         |  FROM rv LEFT JOIN hr$k ON hr$k.id = rv.id)""".stripMargin
    }.mkString(",\n")
    EventGraph.sqlBase +
      s""", h0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS h FROM rv),
         |$iters
         |SELECT h5.id, round(h5.h + 1e-9, 6) AS hub, round(a5.a + 1e-9, 6) AS auth
         |FROM h5 JOIN a5 ON a5.id = h5.id""".stripMargin
  }

  /** Adamic-Adar twin: same wedge enumeration in SQL; the top-20 cut ranks
    * on the ROUNDED score with (a, b) tie-breaks, so both engines cut the
    * identical set. */
  private lazy val linkpredOracle: String = EventGraph.sqlBase +
    """, canon AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b FROM rich WHERE src <> dst),
      |und AS (SELECT a AS w, b AS n FROM canon UNION ALL SELECT b, a FROM canon),
      |deg AS (SELECT w, count(*) AS d FROM und GROUP BY 1),
      |wed AS (SELECT u1.w, u1.n AS u, u2.n AS v, deg.d
      |        FROM und u1 JOIN und u2 USING (w) JOIN deg USING (w) WHERE u1.n < u2.n),
      |sc AS (SELECT u AS a, v AS b, count(*) AS common,
      |              round(sum(1.0/ln(d)) + 1e-9, 6) AS score FROM wed GROUP BY 1, 2),
      |fin AS (SELECT sc.* FROM sc LEFT JOIN canon c ON c.a = sc.a AND c.b = sc.b WHERE c.a IS NULL)
      |SELECT a, b, common, score FROM fin ORDER BY score DESC, a, b LIMIT 20""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q1_agg" -> "SELECT l_returnflag, sum(l_quantity) AS sum_qty FROM lineitem GROUP BY 1",
    "q_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice) + 1e-9, 4) AS rev
        |FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1""".stripMargin,
    "q_window" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, rk FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |         row_number() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rk
        |  FROM lineitem) t WHERE rk <= 3""".stripMargin,
    "q_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "e_dag" -> (EventGraph.sqlBase +
      "SELECT DISTINCT least(src,dst) AS src, greatest(src,dst) AS dst FROM rich WHERE src <> dst"),
    "e_dims" -> (EventGraph.sqlBase +
      "SELECT max(src) AS m, max(dst) AS n FROM rich"),
    "e_bidir" -> (EventGraph.sqlBase +
      """SELECT src, dst, round(weight + 1e-9, 6) AS weight FROM bucket
        |UNION ALL
        |SELECT dst, src, round(weight + 1e-9, 6) AS weight FROM bucket""".stripMargin),
    "e_shuffle" -> (EventGraph.sqlBase +
      "SELECT src, dst, round(weight + 1e-9, 6) AS weight FROM bucket"),
    "e_permute" -> (EventGraph.sqlBase +
      """, ids AS (SELECT DISTINCT id FROM (SELECT src AS id FROM rich UNION ALL SELECT dst FROM rich)),
        |mapping AS (SELECT id, row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) AS nid FROM ids)
        |SELECT ms.nid AS src, md.nid AS dst
        |FROM rich JOIN mapping ms ON ms.id = rich.src JOIN mapping md ON md.id = rich.dst""".stripMargin),
    "e_compact" -> (EventGraph.sqlBase +
      """, mapping AS (
        |  SELECT old, row_number() OVER (ORDER BY old) AS nid
        |  FROM (SELECT DISTINCT dst AS old FROM bucket) q)
        |SELECT b.src, m.nid AS dst, round(b.weight + 1e-9, 6) AS weight
        |FROM bucket b JOIN mapping m ON m.old = b.dst""".stripMargin),
    "e_rowblock" -> (EventGraph.sqlBase +
      """SELECT src - 100 AS src, dst, round(weight + 1e-9, 6) AS weight
        |FROM bucket WHERE src >= 100 AND src < 900""".stripMargin),
    // shuffle is row-order-only, bidirectional∘toDag = canonical distinct
    // non-loop pairs (weight 1 everywhere in rich), then the md5-order
    // permutation over the surviving vertex set
    "e_converter" -> (EventGraph.sqlBase +
      """, conv AS (SELECT DISTINCT least(src,dst) AS src, greatest(src,dst) AS dst
        |           FROM rich WHERE src <> dst),
        |cids AS (SELECT DISTINCT id FROM (SELECT src AS id FROM conv UNION ALL SELECT dst FROM conv)),
        |cmap AS (SELECT id, row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) AS nid FROM cids)
        |SELECT ms.nid AS src, md.nid AS dst, round(CAST(1.0 AS DOUBLE) + 1e-9, 6) AS weight
        |FROM conv JOIN cmap ms ON ms.id = conv.src JOIN cmap md ON md.id = conv.dst""".stripMargin),
    "e_applyedges" -> (EventGraph.sqlBase +
      """, deg AS (SELECT src AS id, count(*) AS d FROM bucket GROUP BY 1)
        |SELECT b.src, b.dst,
        |  round(b.weight * (1 + coalesce(ds.d, 0)) / (1 + coalesce(dd.d, 0)) + 1e-9, 6) AS new_weight
        |FROM bucket b
        |LEFT JOIN deg ds ON ds.id = b.src
        |LEFT JOIN deg dd ON dd.id = b.dst""".stripMargin),
    "g_degree" -> (EventGraph.sqlBase +
      "SELECT src AS id, count(*) AS degree FROM rich GROUP BY 1"),
    "g_pagerank" -> prUnrolled,
    "g_cc" -> (EventGraph.sqlBase +
      """, members AS (
        |  SELECT src AS id, user_id, bkt FROM bucket
        |  UNION SELECT dst, user_id, bkt FROM bucket)
        |SELECT id, min(id) OVER (PARTITION BY user_id, bkt) AS component FROM members""".stripMargin),
    "g_cc_csr" -> (EventGraph.sqlBase +
      """, members AS (
        |  SELECT src AS id, user_id, bkt FROM bucket
        |  UNION SELECT dst, user_id, bkt FROM bucket)
        |SELECT id, min(id) OVER (PARTITION BY user_id, bkt) AS component FROM members""".stripMargin),
    "g_lp" -> lpUnrolled,
    "g_lp_csr" -> lpUnrolled,
    "g_bfs" -> (EventGraph.sqlBase +
      """, mrn AS (
        |  SELECT src AS id, user_id, bkt, rn FROM bucket
        |  UNION SELECT dst, user_id, bkt, rn + 1 FROM bucket),
        |s0 AS (SELECT * FROM mrn WHERE id = (SELECT min(id) FROM mrn))
        |SELECT m.id, m.rn - s0.rn AS depth FROM mrn m, s0
        |WHERE m.user_id = s0.user_id AND m.bkt = s0.bkt AND m.rn >= s0.rn""".stripMargin),
    "g_bfs_csr" -> (EventGraph.sqlBase +
      """, mrn AS (
        |  SELECT src AS id, user_id, bkt, rn FROM bucket
        |  UNION SELECT dst, user_id, bkt, rn + 1 FROM bucket),
        |s0 AS (SELECT * FROM mrn WHERE id = (SELECT min(id) FROM mrn))
        |SELECT m.id, m.rn - s0.rn AS depth FROM mrn m, s0
        |WHERE m.user_id = s0.user_id AND m.bkt = s0.bkt AND m.rn >= s0.rn""".stripMargin),
    "g_sssp" -> ssspOracle,
    "g_sssp_csr" -> ssspOracle,
    "g_toposort" -> (EventGraph.sqlBase +
      """, mrn AS (
        |  SELECT src AS id, user_id, bkt, rn FROM bucket
        |  UNION SELECT dst, user_id, bkt, rn + 1 FROM bucket)
        |SELECT id, rn - min(rn) OVER (PARTITION BY user_id, bkt) AS "order" FROM mrn""".stripMargin),
    "g_toposort_csr" -> (EventGraph.sqlBase +
      """, mrn AS (
        |  SELECT src AS id, user_id, bkt, rn FROM bucket
        |  UNION SELECT dst, user_id, bkt, rn + 1 FROM bucket)
        |SELECT id, rn - min(rn) OVER (PARTITION BY user_id, bkt) AS "order" FROM mrn""".stripMargin),
    "g_triangle" -> triangleOracle,
    "g_triangle_csr" -> triangleOracle,
    "g_clustcoef" -> clustcoefOracle,
    "g_ppr" -> pprUnrolled,
    "g_ppr_csr" -> pprUnrolled,
    "g_kcore" -> kcoreUnrolled,
    "g_neigh" -> neighUnrolled,
    "g_walks" -> walksUnrolled,
    "g_walk_pairs" -> walkPairsUnrolled,
    "g_mis" -> misUnrolled,
    "g_coloring" -> coloringUnrolled,
    "g_matching" -> matchingUnrolled,
    "g_modularity" -> modularityOracle,
    "g_ktruss" -> ktrussUnrolled,
    "g_scc" -> sccOracle,
    "g_hits" -> hitsUnrolled,
    "g_linkpred" -> linkpredOracle
  )

  /** Triangle participation (each triangle credits all three corners) over
    * the canonical DAG, then cc = 2t / (d(d−1)) with d = distinct-neighbor
    * degree; 0 when d < 2. */
  private lazy val clustcoefOracle: String = EventGraph.sqlBase +
    """, dag AS (SELECT DISTINCT least(src,dst) AS src, greatest(src,dst) AS dst FROM rich WHERE src <> dst),
      |deg AS (SELECT id, count(*) AS d FROM (
      |  SELECT src AS id FROM dag UNION ALL SELECT dst FROM dag) GROUP BY 1),
      |tri AS (
      |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      |  FROM dag e1 JOIN dag e2 ON e1.src = e2.src AND e1.dst < e2.dst
      |  WHERE EXISTS (SELECT 1 FROM dag e3 WHERE e3.src = e1.dst AND e3.dst = e2.dst)),
      |part AS (SELECT v, count(*) AS t FROM (
      |  SELECT a AS v FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri) GROUP BY 1)
      |SELECT rv.id, round(CASE WHEN coalesce(deg.d, 0) < 2 THEN 0.0
      |  ELSE 2.0 * coalesce(part.t, 0) / (deg.d * (deg.d - 1.0)) END + 1e-9, 6) AS cc
      |FROM rv LEFT JOIN deg ON deg.id = rv.id LEFT JOIN part ON part.v = rv.id""".stripMargin

  /** Personalized PageRank, 10 unrolled supersteps: s(v) = 1 iff id%97=0,
    * pr0 = s, pr' = 0.3·s + 0.7·Σ in-contributions (no-message ⇒ 0.3·s). */
  private lazy val pprUnrolled: String = {
    val iters = (1 to 10).map { k =>
      s"""pr$k AS (
         |  SELECT rv.id, 0.3*sv.s + 0.7*coalesce(m.acc, 0) AS pr
         |  FROM rv JOIN sv ON sv.id = rv.id LEFT JOIN (
         |    SELECT e.dst AS id, sum(p.pr/deg.d) AS acc
         |    FROM rich e JOIN pr${k - 1} p ON p.id = e.src JOIN deg ON deg.src = e.src
         |    GROUP BY 1) m ON m.id = rv.id)""".stripMargin
    }.mkString(",\n")
    EventGraph.sqlBase +
      s""", deg AS (SELECT src, count(*) AS d FROM rich GROUP BY 1),
         |sv AS (SELECT id, CASE WHEN id % 97 = 0 THEN 1.0 ELSE 0.0 END AS s FROM rv),
         |pr0 AS (SELECT id, s AS pr FROM sv),
         |$iters
         |SELECT id, round(pr + 1e-9, 6) AS ppr FROM pr10""".stripMargin
  }

  /** 2-core by 4 unrolled parallel-peel rounds (the peel on this graph
    * family converges in ≤2 — single-pair components peel, every ≥3-event
    * component contains its skip-edge triangles; extra rounds are no-ops). */
  private lazy val kcoreUnrolled: String = {
    val rounds = (1 to 4).map { r =>
      s"""a$r AS (SELECT a AS id FROM und${r - 1} GROUP BY 1 HAVING count(*) >= 2),
         |und$r AS (SELECT u.a, u.b FROM und${r - 1} u
         |  JOIN a$r x ON x.id = u.a JOIN a$r y ON y.id = u.b)""".stripMargin
    }.mkString(",\n")
    EventGraph.sqlBase +
      s""", canon AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b FROM rich WHERE src <> dst),
         |und0 AS (SELECT a, b FROM canon UNION ALL SELECT b, a FROM canon),
         |$rounds
         |SELECT rv.id, (a4.id IS NOT NULL) AS in_core
         |FROM rv LEFT JOIN a4 ON a4.id = rv.id""".stripMargin
  }

  /** md5 hex prefix → exact 32-bit integer (BIGINT arithmetic end to end —
    * the integer twin of AdvancedQueries' hexU). */
  private def hexI(hexExpr: String): String =
    (1 to 8).map(i =>
      s"(strpos('0123456789abcdef', substr($hexExpr, $i, 1)) - 1) * ${math.pow(16, 8 - i).toLong}")
      .mkString("(", " + ", ")")

  /** ANF sketch twin: FM registers seeded with h & -h of the md5 hash, then
    * 3 rounds of bit_or over out-neighbors — integer ops only, bit-exact. */
  private lazy val neighUnrolled: String = {
    val rounds = (1 to 3).map { h =>
      s"""sk$h AS (
         |  SELECT s.id, s.r, s.reg | coalesce(m.acc, 0) AS reg
         |  FROM sk${h - 1} s LEFT JOIN (
         |    SELECT e.src AS id, n.r, bit_or(n.reg) AS acc
         |    FROM rich e JOIN sk${h - 1} n ON n.id = e.dst GROUP BY 1, 2) m
         |  ON m.id = s.id AND m.r = s.r)""".stripMargin
    }.mkString(",\n")
    EventGraph.sqlBase +
      s""", rs AS (SELECT unnest(generate_series(0, 3)) AS r),
         |h0 AS (SELECT rv.id, rs.r, ${hexI("md5(rv.id || ':' || rs.r)")} AS h FROM rv CROSS JOIN rs),
         |sk0 AS (SELECT id, r, CASE WHEN h = 0 THEN 0 ELSE h & (-h) END AS reg FROM h0),
         |$rounds
         |SELECT id, r, reg FROM sk3""".stripMargin
  }

  /** Random-walk twin: the indexed adjacency (row_number over dst order,
    * degree embedded per row) and 4 unrolled md5-pick steps, 2 walks per
    * start vertex — integer picks, replayed row-for-row. */
  /** WITH-prologue ending in a `corpus(walk, step, v)` CTE — shared by
    * g_walks and g_walk_pairs. */
  private lazy val walksWith: String = {
    val steps = (1 to 4).map { t =>
      s"""w$t AS (
         |  SELECT w.walk, a.dst AS v, a.dstdeg AS vdeg
         |  FROM w${t - 1} w JOIN adjd a ON a.src = w.v
         |   AND a.idx = (${hexI(s"md5(w.walk || ':' || $t || ':' || w.v)")} % w.vdeg)
         |  WHERE w.vdeg > 0)""".stripMargin
    }.mkString(",\n")
    val sel = (0 to 4).map(t =>
      s"SELECT walk, CAST($t AS BIGINT) AS step, v FROM w$t").mkString("\n  UNION ALL ")
    EventGraph.sqlBase +
      s""", deg AS (SELECT src, count(*) AS d FROM rich GROUP BY 1),
         |adj AS (SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx FROM rich),
         |adjd AS (SELECT a.src, a.dst, a.idx, coalesce(dd.d, 0) AS dstdeg
         |         FROM adj a LEFT JOIN deg dd ON dd.src = a.dst),
         |w0 AS (SELECT rv.id || '#' || ws.wi AS walk, rv.id AS v, coalesce(deg.d, 0) AS vdeg
         |       FROM rv CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS wi) ws
         |       LEFT JOIN deg ON deg.src = rv.id),
         |$steps,
         |corpus AS (
         |  $sel)
         |""".stripMargin
  }

  private lazy val walksUnrolled: String =
    walksWith + "SELECT walk, step, v FROM corpus"

  private lazy val walkPairsUnrolled: String = walksWith +
    """SELECT a.v AS center, b.v AS context, b.step - a.step AS offset, count(*) AS n
      |FROM corpus a JOIN corpus b
      |  ON a.walk = b.walk AND a.step <> b.step AND abs(a.step - b.step) <= 2
      |GROUP BY 1, 2, 3""".stripMargin

  /** MIS twin: the engine's synchronous rounds replayed exactly — per round
    * an undecided vertex is excluded if any neighbor is in, else joins when
    * its (priority, id) beats the max over undecided neighbors. Priorities
    * encode the engine's struct(pri, id) order as pri·2^20 + id (event ids
    * stay < 2^20 at driver scale, so the orders coincide). */
  private lazy val misUnrolled: String = {
    val rounds = (1 to 12).map { r =>
      // MATERIALIZED: each round references the previous TWICE; DuckDB
      // inlines plain CTEs, which would make the base scan count double per
      // round (2^12 parquet opens — measured "too many open files")
      s"""st$r AS MATERIALIZED (
         |  SELECT s.id, s.p,
         |    CASE WHEN s.st <> 0 THEN s.st
         |         WHEN coalesce(m.anymis, 0) = 1 THEN 2
         |         WHEN m.maxu IS NULL OR m.maxu < s.p THEN 1
         |         ELSE 0 END AS st
         |  FROM st${r - 1} s LEFT JOIN (
         |    SELECT u.a AS id,
         |           max(CASE WHEN n.st = 1 THEN 1 ELSE 0 END) AS anymis,
         |           max(CASE WHEN n.st = 0 THEN n.p END) AS maxu
         |    FROM und u JOIN st${r - 1} n ON n.id = u.b
         |    WHERE n.st < 2
         |    GROUP BY 1) m ON m.id = s.id)""".stripMargin
    }.mkString(",\n")
    EventGraph.sqlBase +
      s""", canon AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b FROM rich WHERE src <> dst),
         |und AS (SELECT a, b FROM canon UNION ALL SELECT b, a FROM canon),
         |st0 AS (SELECT id, ${hexI("md5(id || ':p')")} * 1048576 + id AS p, 0 AS st FROM rv),
         |$rounds
         |SELECT id, (st = 1) AS in_mis FROM st12""".stripMargin
  }

  /** Jones–Plassmann twin: per round, messages = higher-priority neighbors'
    * states; an uncolored vertex with no uncolored higher neighbor takes
    * mex(their colors) via a correlated generate_series anti-join. Rounds
    * and state CTEs MATERIALIZED (multi-referenced — see misUnrolled). */
  private lazy val coloringUnrolled: String = {
    val rounds = (1 to 18).map { r =>
      s"""msgs$r AS MATERIALIZED (
         |  SELECT u.a AS id, n.c
         |  FROM und u JOIN c${r - 1} n ON n.id = u.b JOIN c${r - 1} s ON s.id = u.a
         |  WHERE n.p > s.p),
         |nu$r AS (SELECT id, count(DISTINCT CASE WHEN c >= 0 THEN c END) AS nu,
         |                max(CASE WHEN c < 0 THEN 1 ELSE 0 END) AS anyunc
         |         FROM msgs$r GROUP BY 1),
         |mex$r AS (SELECT t.id, min(t.g) AS mex FROM (
         |            SELECT id, unnest(generate_series(0, nu)) AS g FROM nu$r) t
         |          WHERE NOT EXISTS (SELECT 1 FROM msgs$r m WHERE m.id = t.id AND m.c = t.g)
         |          GROUP BY 1),
         |c$r AS MATERIALIZED (
         |  SELECT s.id, s.p,
         |    CASE WHEN s.c >= 0 THEN s.c
         |         WHEN coalesce(a.anyunc, 0) = 1 THEN -1
         |         ELSE coalesce(x.mex, 0) END AS c
         |  FROM c${r - 1} s LEFT JOIN nu$r a ON a.id = s.id LEFT JOIN mex$r x ON x.id = s.id)""".stripMargin
    }.mkString(",\n")
    EventGraph.sqlBase +
      s""", canon AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b FROM rich WHERE src <> dst),
         |und AS (SELECT a, b FROM canon UNION ALL SELECT b, a FROM canon),
         |c0 AS (SELECT id, ${hexI("md5(id || ':p')")} * 1048576 + id AS p, -1 AS c FROM rv),
         |$rounds
         |SELECT id, c AS color FROM c18""".stripMargin
  }

  private lazy val triangleOracle: String = EventGraph.sqlBase +
    """, dag AS (SELECT DISTINCT least(src,dst) AS src, greatest(src,dst) AS dst FROM rich WHERE src <> dst),
      |tri AS (
      |  SELECT e2.dst AS v, count(*) AS t
      |  FROM dag e1 JOIN dag e2 ON e1.src = e2.src AND e1.dst < e2.dst
      |  WHERE EXISTS (SELECT 1 FROM dag e3 WHERE e3.src = e1.dst AND e3.dst = e2.dst)
      |  GROUP BY 1)
      |SELECT rv.id, coalesce(tri.t, 0) AS triangles FROM rv LEFT JOIN tri ON tri.v = rv.id""".stripMargin
}
