package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algos.{DeltaPageRank, DeltaStepping, Lda, Sgd}
import graft.core.{DenseRank, LinkGraph}

/**
 * Driver-gate coverage for the four algorithms that round 1 left sbt-only:
 * DeltaPageRank, DeltaStepping, SGD and LDA, each with an exact DuckDB twin.
 *
 * The iterative runs use md5-derived randomness (SGD/LDA init) so DuckDB can
 * replay them bit-compatibly, fixed iteration counts where the reference
 * main uses them, and bounded-diameter inputs (bucket chains / bipartite
 * tables) so the unrolled or closed-form SQL stays exact.
 */
object AdvancedQueries {
  import EventGraph._

  private def minVertex(g: LinkGraph): Long =
    g.vertices.agg(min("id")).head().getLong(0)

  /** Bipartite rating graph from events: user → event-type item, weight =
    * interaction count (exact integer, so both engines agree bit-for-bit). */
  private def ratingGraph(s: SparkSession, dir: String): LinkGraph = {
    val ev = events(s, dir)
    val items = DenseRank
      .denseOrdBy(ev.select("event_type").distinct(), "iord", col("event_type"))
      .select(col("event_type"), (lit(2000000000L) + col("iord")).as("item"))
    val r = ev.join(items, "event_type")
      .groupBy(col("user_id").as("src"), col("item").as("dst"))
      .agg(count("*").cast("double").as("weight"))
    // partition count from the SOURCE table's size: post-join/aggregate size
    // estimates are unusable (they inflate to the cap), but the rating table
    // is bounded by the events table it aggregates
    LinkGraph(r, LinkGraph.adaptivePartitions(ev))
  }

  /** Bipartite doc→term graph over the documents table, weight = term count.
    * Term ids offset to 1e6 so the reference's id-threshold type rule
    * (`LDA.cpp:276-285`) applies. */
  private def docTermGraph(s: SparkSession, dir: String): (LinkGraph, DataFrame) = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val toks = docs
      .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    val counts = toks.groupBy("doc_id", "w").agg(count("*").cast("double").as("weight"))
    val words = DenseRank.denseOrdBy(counts.select("w").distinct(), "word", col("w"))
      .select(col("w"), (lit(1000000L) + col("word")).as("wid"))
    // cache: LDA's init + per-iteration routing otherwise re-runs the whole
    // tokenize + DenseRank pipeline several times
    val edges = counts.join(words, "w")
      .select(col("doc_id").as("src"), col("wid").as("dst"), col("weight"))
      .cache()
    // partition count from the documents table's size (same rationale as
    // ratingGraph: post-join estimates inflate to the cap)
    val g = LinkGraph(edges, LinkGraph.adaptivePartitions(docs))
    (g, Lda.typesByThreshold(g, 999999L))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Sampled-source betweenness centrality (batched Brandes) on the bucket
    // chains. Sources = 4 chain heads in md5 order (replayed in SQL). On a
    // pure chain sigma = 1 everywhere, so the true value has the closed form
    // bc(v) = len - pos for v > head inside a sampled chain, 0 elsewhere —
    // the oracle states the ANSWER; diamonds/merges (sigma > 1) are pinned
    // against sequential Brandes in BetweennessSpec.
    "g_betweenness" -> ((s, dir) => {
      val heads = bucketHeads(events(s, dir))
        .select(col("event_id"), md5(col("event_id").cast("string")).as("h"))
        .orderBy(col("h"), col("event_id")).limit(4)
        .collect().map(_.getLong(0)).toSeq
      graft.algos.Betweenness.run(bucketGraph(s, dir), heads)
        .select(col("id"), round(col("bc") + 1e-9, 6).as("bc"))
    }),

    // Incremental PageRank to convergence on the bucket chains — a chain
    // position k converges to exactly 1 - 0.7^(k+1), the closed form the
    // oracle replays.
    // the same incremental program on the CSR path's per-vertex sparse
    // frontier (engine/DeltaPrCsr.scala); same closed-form oracle
    "g_deltapr_csr" -> ((s, dir) => {
      val built = graft.engine.GatherScatter.build(bucketGraph(s, dir), 8)
      val (ranks, _) = graft.engine.DeltaPrCsr.run(built)
      graft.engine.GatherScatter.toDF(s, ranks)
        .select(col("id"), round(col("pagerank") + 1e-9, 6).as("pr"))
    }),

    "g_deltapr" -> ((s, dir) =>
      DeltaPageRank.run(bucketGraph(s, dir))
        .state.select(col("id"), round(col("pagerank") + 1e-9, 6).as("pr"))),

    // Incremental PageRank under GRAPH GROWTH: converge on the first-5-edge
    // prefix of every bucket chain, then add the remaining edges (new tail
    // vertices + junction re-seed) and warm-start from the residuals of the
    // old ranks on the grown graph. Must land on the full graph's exact
    // fixpoint — the same closed form the cold g_deltapr oracle replays —
    // proving the warm path converges to truth, not near it.
    "g_deltapr_warm" -> ((s, dir) => {
      val ev = events(s, dir)
      val before = graft.core.LinkGraph(EventGraph.bucketPrefixEdges(ev, 5))
      val prev = DeltaPageRank.run(before).state.select("id", "pagerank")
      val grown = bucketGraph(s, dir)
      // `before`'s clustered-edge caches are released by the caller's
      // inter-query sweep (Verify/Bench), same contract as every graph query
      DeltaPageRank.warmStart(grown, prev)
        .state.select(col("id"), round(col("pagerank") + 1e-9, 6).as("pr"))
    }),

    // Incremental PageRank under DELETION — the negative-residual path:
    // converge the FULL bucket chains, then drop each chain's first edge and
    // warm-start. Every surviving chain head just lost its in-edge (residual
    // 0.3 − 0.51 < 0) and the correction must cascade down the whole chain
    // to the truncated graph's closed form. Chains make this the sharpest
    // possible check: every vertex's value changes, all via negative deltas.
    "g_deltapr_shrink" -> ((s, dir) => {
      val ev = events(s, dir)
      val prev = DeltaPageRank.run(bucketGraph(s, dir)).state.select("id", "pagerank")
      val shrunk = graft.core.LinkGraph(EventGraph.bucketSuffixEdges(ev, 1))
      DeltaPageRank.warmStart(shrunk, prev)
        .state.select(col("id"), round(col("pagerank") + 1e-9, 6).as("pr"))
    }),

    // DeltaStepping SSSP (light/heavy split at delta=512, shared state);
    // distances equal the SSSP prefix sums, bucket = floor(dist/delta).
    "g_deltastep" -> ((s, dir) => {
      val g = bucketGraph(s, dir)
      val (st, _) = DeltaStepping.run(g, minVertex(g), delta = 512.0)
      st.filter(col("dist") =!= Double.PositiveInfinity)
        .select(col("id"), round(col("dist") + 1e-9, 6).as("dist"), col("bucket"))
    }),

    // SGD matrix factorization, 2 fixed iterations, md5 init, step/lambda
    // scaled so the updates are visible at 4 decimals.
    "g_sgd" -> ((s, dir) => {
      val g = ratingGraph(s, dir)
      Sgd.run(g, iterations = 2, lambda = 0.05, step = 0.001,
          initState = Sgd.md5Init(g))
        .state.select(col("id"), posexplode(col("lv")).as(Seq("k", "v")))
        .select(col("id"), col("k"), round(col("v") + 1e-9, 4).as("v"))
    }),

    // The SAME SGD program on the CSR 3-op vector kernel
    // (engine/VectorSuperstep.scala): bidirectional weighted build, scalar
    // md5 init. Shares g_sgd's oracle — ⊕ fold order is the two engines'
    // only divergence (~1e-12), absorbed by the 4-decimal rounding.
    "g_sgd_csr" -> ((s, dir) => {
      val g = ratingGraph(s, dir)
      // explode-based doubling: one evaluation of the rating aggregation
      val bidir = graft.core.EdgeOps.bidirectional(g.edges)
      val pg = graft.engine.GatherScatter.build(LinkGraph(bidir), 8, weighted = true)
      val blocks = graft.engine.VectorSuperstep.sgd(pg, k = Sgd.K, iterations = 2,
        lambda = 0.05, stepSize = 0.001, init = Sgd.md5InitScalar)
      graft.engine.VectorSuperstep.toDF(s, blocks)
        .select(col("id"), posexplode(col("lv")).as(Seq("k", "v")))
        .select(col("id"), col("k"), round(col("v") + 1e-9, 4).as("v"))
    }),

    // LDA, 2 fixed iterations over the doc-term graph, md5 gamma init.
    "g_lda" -> ((s, dir) => {
      val (g, types) = docTermGraph(s, dir)
      Lda.run(g, types, iterations = 2, gammaFn = Lda.gamma0Md5)
        .select(col("id"), posexplode(col("n")).as(Seq("k", "v")))
        .select(col("id"), col("k"), round(col("v") + 1e-9, 4).as("v"))
    }),

    // The SAME LDA program on the CSR 3-op vector kernel (init pass + 2
    // iterate passes with the per-superstep global-topic refresh); shares
    // g_lda's oracle — ⊕ fold order is the only divergence, absorbed by
    // the 4-decimal rounding (engine/VectorSuperstep.scala).
    "g_lda_csr" -> ((s, dir) => {
      val (g, _) = docTermGraph(s, dir)
      val bidir = graft.core.EdgeOps.bidirectional(g.edges)
      val pg = graft.engine.GatherScatter.build(LinkGraph(bidir), 8, weighted = true)
      val blocks = graft.engine.VectorSuperstep.lda(pg, k = Lda.K, iterations = 2,
        termMinId = 1000000L, gammaInit = Sgd.md5InitScalar)
      graft.engine.VectorSuperstep.toDF(s, blocks)
        .select(col("id"), posexplode(col("lv")).as(Seq("k", "v")))
        .select(col("id"), col("k"), round(col("v") + 1e-9, 4).as("v"))
    }),

    // LDA top-words report (`/root/reference/src/LDA.cpp:344-374`, the
    // commented-out print_results): top-5 word ids per topic by topic count.
    // Ties break on the ROUNDED count then word id so both engines agree.
    "g_lda_topwords" -> ((s, dir) => {
      val (g, types) = docTermGraph(s, dir)
      val words = Lda.run(g, types, iterations = 2, gammaFn = Lda.gamma0Md5)
        .filter(col("id") >= 1000000L)
        .select(col("id"), posexplode(col("n")).as(Seq("k", "v")))
        .select(col("id"), col("k"), round(col("v") + 1e-9, 4).as("v"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy(col("v").desc, col("id"))
      words.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select("k", "rank", "id", "v")
    }),

    // LDA log-likelihood companion (`LDALLProgram`, run by the reference main
    // after the topic iterations): total corpus loglik over the 2-iter md5
    // state, evaluated at the gate's own 4-dp quantization so DuckDB replays
    // it exactly (Lda.logLikelihoodGated).
    "g_lda_loglik" -> ((s, dir) => {
      val (g, types) = docTermGraph(s, dir)
      val st = Lda.run(g, types, iterations = 2, gammaFn = Lda.gamma0Md5)
      Lda.logLikelihoodGated(g, st)
    })
  )

  // ---------- DuckDB oracle twins ----------

  /** First 8 hex digits of an md5 → uniform [0,1): every term is an exact
    * integer in double, so the sum is order-independent — bit-identical to
    * Spark's conv(substring(md5(...),1,8),16,10)/2^32. */
  private def hexU(hexExpr: String): String =
    (1 to 8).map(i =>
      s"(strpos('0123456789abcdef', substr($hexExpr, $i, 1)) - 1) * ${math.pow(16, 8 - i).toLong}.0")
      .mkString("(", " + ", ") / 4294967296.0")

  private val sgdIter: Int => String = n =>
    s"""est$n AS (
       |  SELECT r.u, r.i, r.w, sum(a.v * b.v) AS est
       |  FROM r JOIN lv${n - 1} a ON a.id = r.u JOIN lv${n - 1} b ON b.id = r.i AND b.k = a.k
       |  GROUP BY 1, 2, 3),
       |c$n AS (
       |  SELECT id, k, sum(s) AS s FROM (
       |    SELECT e.u AS id, b.k, b.v * (e.w - e.est) AS s
       |    FROM est$n e JOIN lv${n - 1} b ON b.id = e.i
       |    UNION ALL
       |    SELECT e.i, a.k, a.v * (e.w - e.est)
       |    FROM est$n e JOIN lv${n - 1} a ON a.id = e.u) t
       |  GROUP BY 1, 2),
       |lv$n AS (
       |  SELECT l.id, l.k,
       |         CASE WHEN c.s IS NULL THEN l.v
       |              ELSE l.v + 0.001 * (-0.05 * l.v + c.s) END AS v
       |  FROM lv${n - 1} l LEFT JOIN c$n c ON c.id = l.id AND c.k = l.k)""".stripMargin

  /** The md5-replayable 2-iteration SGD pipeline — shared by g_sgd (column
    * engine) and g_sgd_csr (the CSR 3-op vector kernel). */
  private val sgdOracle: String =
    s"""WITH items AS (
       |  SELECT event_type, 2000000000 + row_number() OVER (ORDER BY event_type) - 1 AS item
       |  FROM (SELECT DISTINCT event_type FROM events) q),
       |r AS (
       |  SELECT user_id AS u, item AS i, CAST(count(*) AS DOUBLE) AS w
       |  FROM events JOIN items USING (event_type) GROUP BY 1, 2),
       |verts AS (SELECT u AS id FROM r UNION SELECT i FROM r),
       |ks AS (SELECT unnest(generate_series(0, 19)) AS k),
       |lv0 AS (
       |  SELECT id, k, ${hexU("md5(id || ':' || k)")} AS v
       |  FROM verts CROSS JOIN ks),
       |${sgdIter(1)},
       |${sgdIter(2)}
       |SELECT id, k, round(v + 1e-9, 4) AS v FROM lv2""".stripMargin

  private val ldaIter: Int => String = n =>
    s"""gn$n AS (SELECT k, sum(n) AS g FROM s${n - 1} WHERE id >= 1000000 GROUP BY 1),
       |gm$n AS (
       |  SELECT p.r, p.m, p.wt, sr.k,
       |    ((sr.n + CASE WHEN p.r < 1000000 THEN 1.0 ELSE 5.0 END - 1) *
       |     (sm.n + CASE WHEN p.r < 1000000 THEN 5.0 ELSE 1.0 END - 1)) /
       |    (g.g + (SELECT v FROM vv) * 4.0) AS gamma
       |  FROM pr p
       |  JOIN s${n - 1} sr ON sr.id = p.r
       |  JOIN s${n - 1} sm ON sm.id = p.m AND sm.k = sr.k
       |  JOIN gn$n g ON g.k = sr.k),
       |s$n AS (
       |  SELECT r AS id, k, sum(gamma / gs * wt) AS n FROM (
       |    SELECT *, sum(gamma) OVER (PARTITION BY r, m) AS gs FROM gm$n) t
       |  GROUP BY 1, 2)""".stripMargin

  /** The md5-replayable 2-iteration LDA pipeline through state `s2` — shared
    * by the three LDA gates. */
  private val ldaBase: String =
    s"""WITH toks AS (
       |  SELECT doc_id AS d, w, CAST(count(*) AS DOUBLE) AS wt
       |  FROM (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
       |        FROM documents) t
       |  WHERE length(w) > 0 GROUP BY 1, 2),
       |words AS (
       |  SELECT w, 1000000 + row_number() OVER (ORDER BY w) - 1 AS wid
       |  FROM (SELECT DISTINCT w FROM toks) q),
       |e AS (SELECT d AS src, wid AS dst, wt FROM toks JOIN words USING (w)),
       |ks AS (SELECT unnest(generate_series(0, 19)) AS k),
       |vv AS (SELECT count(*) AS v FROM words),
       |gam AS (
       |  SELECT wt, k, ${hexU("md5(CAST(wt AS BIGINT) || ':' || k)")} AS g
       |  FROM (SELECT DISTINCT wt FROM e) q CROSS JOIN ks),
       |gamn AS (SELECT wt, k, g / sum(g) OVER (PARTITION BY wt) AS gn FROM gam),
       |pairs0 AS (SELECT src AS id, wt FROM e UNION ALL SELECT dst, wt FROM e),
       |s0 AS (
       |  SELECT p.id, g.k, sum(g.gn * p.wt) AS n
       |  FROM pairs0 p JOIN gamn g ON g.wt = p.wt GROUP BY 1, 2),
       |pr AS (SELECT src AS r, dst AS m, wt FROM e UNION ALL SELECT dst, src, wt FROM e),
       |${ldaIter(1)},
       |${ldaIter(2)}""".stripMargin

  /** DuckDB twin of `Lda.logLikelihoodGated`: state quantized to 1e-4 integer
    * units (all sums exact), the 20-term dot unrolled left-associatively —
    * the same fold order Spark's `aggregate` uses, so the doubles agree
    * bit-for-bit before the final per-edge 4-dp quantization. */
  private val ldaLoglikTail: String = {
    val ks20 = 0 until 20
    val pivots = ks20.map(i => s"sum(CASE WHEN k = $i THEN nq ELSE 0 END) AS n$i")
      .mkString(",\n|           ")
    val gsums = ks20.map(i => s"sum(n$i) AS g$i").mkString(", ")
    val gsm = ks20.map(i => s"CAST(g$i + (SELECT v FROM vv) * 40000 AS DOUBLE) AS g$i")
      .mkString(",\n|           ")
    val sdSum = ks20.map(i => s"n$i").mkString(" + ")
    val dotTerms = ks20.map(i =>
      s"(CAST(w.n$i + 40000 AS DOUBLE) / g.g$i) * (CAST(d.n$i + 40000 AS DOUBLE) / d.sd)")
      .mkString("\n|      + ")
    s""",
       |qst AS (SELECT id, k, CAST(round((n + 1e-9) * 10000) AS BIGINT) AS nq FROM s2),
       |qp AS (SELECT id, $pivots FROM qst GROUP BY id),
       |gq AS (SELECT $gsums FROM qp WHERE id >= 1000000),
       |gs AS (SELECT $gsm FROM gq),
       |dd AS (SELECT *, CAST($sdSum + 800000 AS DOUBLE) AS sd FROM qp),
       |cqs AS (
       |  SELECT CAST(round(e.wt * ln(
       |        $dotTerms
       |      ) * 10000) AS BIGINT) AS cq
       |  FROM e JOIN dd d ON d.id = e.src JOIN qp w ON w.id = e.dst CROSS JOIN gs g)
       |SELECT CAST(sum(cq) AS DOUBLE) / 10000.0 AS ll, count(*) AS n_edges FROM cqs""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    // closed form on chains: the 4 md5-first chain heads are the sources;
    // every vertex strictly after a sampled head carries (chain length −
    // position) — each downstream target contributes exactly one unit
    // through it; everything else is 0
    "g_betweenness" -> (EventGraph.sqlBase +
      """, mrn AS (
        |  SELECT src AS id, user_id, bkt, rn FROM bucket
        |  UNION SELECT dst, user_id, bkt, rn + 1 FROM bucket),
        |pos AS (
        |  SELECT id, user_id, bkt,
        |         rn - min(rn) OVER (PARTITION BY user_id, bkt) + 1 AS p,
        |         max(rn) OVER (PARTITION BY user_id, bkt)
        |           - min(rn) OVER (PARTITION BY user_id, bkt) + 1 AS len
        |  FROM mrn),
        |srcs AS (
        |  SELECT user_id, bkt FROM pos WHERE p = 1
        |  ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT 4)
        |SELECT pos.id,
        |  round(CASE WHEN s.user_id IS NOT NULL AND pos.p > 1
        |        THEN CAST(pos.len - pos.p AS DOUBLE) ELSE 0.0 END + 1e-9, 6) AS bc
        |FROM pos LEFT JOIN srcs s ON s.user_id = pos.user_id AND s.bkt = pos.bkt""".stripMargin),

    "g_deltapr" -> (EventGraph.sqlBase +
      """, mrn AS (
        |  SELECT src AS id, user_id, bkt, rn FROM bucket
        |  UNION SELECT dst, user_id, bkt, rn + 1 FROM bucket)
        |SELECT id,
        |  round(1 - pow(0.7, rn - min(rn) OVER (PARTITION BY user_id, bkt) + 1) + 1e-9, 6) AS pr
        |FROM mrn""".stripMargin),

    // same closed-form oracle: the warm-start must converge from the prefix
    // graph's ranks to the FULL graph's fixpoint — any residual-seeding error
    // (mispriced junction, unseeded new vertex, stale degree) shifts a tail
    // value and breaks the hash
    "g_deltapr_warm" -> (EventGraph.sqlBase +
      """, mrn AS (
        |  SELECT src AS id, user_id, bkt, rn FROM bucket
        |  UNION SELECT dst, user_id, bkt, rn + 1 FROM bucket)
        |SELECT id,
        |  round(1 - pow(0.7, rn - min(rn) OVER (PARTITION BY user_id, bkt) + 1) + 1e-9, 6) AS pr
        |FROM mrn""".stripMargin),

    // the deletion twin: the closed form over the SUFFIX chains (first edge
    // of every chain dropped; min(rn) renormalizes the position) — the warm
    // start's negative residuals must land exactly here
    "g_deltapr_shrink" -> (EventGraph.sqlBase +
      """, suf AS (SELECT * FROM bucket WHERE (rn - 1) % 10 >= 1),
        |mrn AS (
        |  SELECT src AS id, user_id, bkt, rn FROM suf
        |  UNION SELECT dst, user_id, bkt, rn + 1 FROM suf)
        |SELECT id,
        |  round(1 - pow(0.7, rn - min(rn) OVER (PARTITION BY user_id, bkt) + 1) + 1e-9, 6) AS pr
        |FROM mrn""".stripMargin),

    // same closed-form oracle: the CSR sparse-frontier variant converges to
    // the identical fixpoint on the bucket chains
    "g_deltapr_csr" -> (EventGraph.sqlBase +
      """, mrn AS (
        |  SELECT src AS id, user_id, bkt, rn FROM bucket
        |  UNION SELECT dst, user_id, bkt, rn + 1 FROM bucket)
        |SELECT id,
        |  round(1 - pow(0.7, rn - min(rn) OVER (PARTITION BY user_id, bkt) + 1) + 1e-9, 6) AS pr
        |FROM mrn""".stripMargin),

    "g_deltastep" -> (EventGraph.sqlBase +
      """, mrn AS (
        |  SELECT src AS id, user_id, bkt, rn FROM bucket
        |  UNION SELECT dst, user_id, bkt, rn + 1 FROM bucket),
        |wv AS (SELECT m.id, m.user_id, m.bkt, m.rn, 1.0 + abs(b.value) AS wgt
        |       FROM mrn m JOIN base b ON b.event_id = m.id),
        |cum AS (SELECT *, sum(wgt) OVER (PARTITION BY user_id, bkt ORDER BY rn) AS c FROM wv),
        |s0 AS (SELECT * FROM cum WHERE id = (SELECT min(id) FROM cum))
        |SELECT m.id, round(m.c - s0.c + 1e-9, 6) AS dist,
        |       CAST(floor((m.c - s0.c) / 512.0) AS BIGINT) AS bucket
        |FROM cum m, s0
        |WHERE m.user_id = s0.user_id AND m.bkt = s0.bkt AND m.rn >= s0.rn""".stripMargin),

    "g_sgd" -> sgdOracle,

    // same oracle: the CSR vector kernel replays the identical program
    // (md5 init, 2 iterations); 4-decimal rounding absorbs ⊕-order ulps
    "g_sgd_csr" -> sgdOracle,

    "g_lda" -> (ldaBase + "\nSELECT id, k, round(n + 1e-9, 4) AS v FROM s2"),

    // same oracle: the CSR vector kernel replays the identical program
    "g_lda_csr" -> (ldaBase + "\nSELECT id, k, round(n + 1e-9, 4) AS v FROM s2"),

    "g_lda_topwords" -> (ldaBase +
      """
        |SELECT k, rank, id, v FROM (
        |  SELECT k, id, round(n + 1e-9, 4) AS v,
        |         row_number() OVER (PARTITION BY k ORDER BY round(n + 1e-9, 4) DESC, id) AS rank
        |  FROM s2 WHERE id >= 1000000) t
        |WHERE rank <= 5""".stripMargin),

    "g_lda_loglik" -> (ldaBase + ldaLoglikTail)
  )
}
