package graft.algos

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.LinkGraph
import graft.engine._

/**
 * LDA, collapsed-variational flavor — `src/LDA.cpp:36-391`. Bipartite graph
 * of documents ('d') and terms ('w') with integer token counts as edge
 * values; K topic pseudo-counts per vertex.
 *
 *  - Init (`LDAInitProgram`, `:67-111`): each incident edge contributes a
 *    normalized random gamma vector × edge count to both endpoints; the
 *    randomness is seeded BY THE EDGE VALUE so both directions agree. The
 *    reference uses glibc rand_r(edge_value); we use xxhash64(edge_value, i)
 *    — same determinism/symmetry property, documented deviation.
 *  - Iterate (`LDAProgram`, `:129-192`): gamma_i ∝ (recv.N[i]+off−1)·
 *    (msg.N[i]+off'−1)/(global.N[i]+V(η−1)) normalized per edge ×
 *    edge count, summed at the receiver and REPLACING its N; the global
 *    topic vector Σ_{'w'} N is recomputed between supersteps
 *    (`do_every_iteration` → `calcGlobalN`, `:144-147,190-192`) — here a
 *    driver-side aggregate collected and folded back in as literals.
 *  - Defaults as the reference main (`:291-293`): α=1.0, η=5.0, V=#terms,
 *    10 iterations.
 */
object Lda {
  val K = 20

  /** Per-(edge value, dim) uniform [0,1): xxhash64-based (overflow-free in
    * ANSI mode), identical for both directions of an edge. */
  def gamma0(weight: Column, i: Int): Column =
    shiftrightunsigned(xxhash64(weight.cast("long"), lit(i)), 11).cast("double") /
      lit(9007199254740992.0)

  /** md5-derived gamma init (first 8 hex digits → uniform [0,1)): exactly
    * replayable by the DuckDB oracle, unlike xxhash64. Same symmetry property
    * (seeded by the edge value alone). */
  def gamma0Md5(weight: Column, i: Int): Column =
    (conv(substring(md5(concat(weight.cast("long").cast("string"), lit(":"), lit(i))), 1, 8),
      16, 10).cast("long").cast("double")) / lit(4294967296.0)

  /** Elementwise ⊕ over the K topic dims: (id, contrib array) → summed
    * arrays. One shuffle via the native `vector_sum` aggregate (partial
    * primitive-array buffers, map-side combined) — the old
    * posexplode→groupBy(key,k)→regroup shape shuffled K× the rows twice. */
  private def sumArrays(df: DataFrame, key: String): DataFrame = df
    .groupBy(key).agg(graft.functions.VectorSum.vector_sum(col("contrib")).as("n"))

  /** The init superstep as its algebraic meaning: per-vertex sum of
    * gamma-normalized edge-count vectors over ALL incident edges. */
  def init(graph: LinkGraph, types: DataFrame,
           gammaFn: (Column, Int) => Column = gamma0): DataFrame = {
    val e = graph.edges
    // one explode instead of a self-union (one evaluation of the edge table)
    val both = e.select(explode(array(col("dst"), col("src"))).as("id"), col("weight"))
    val gs = array((0 until K).map(i => gammaFn(col("weight"), i)): _*)
    val gsum = aggregate(gs, lit(0.0), _ + _)
    // gammas are seeded by the edge VALUE alone, so normalize once per
    // DISTINCT value (a tiny table — counts/ratings) and broadcast-join it
    // back. Inlining the K-hash array expression instead re-evaluates all K
    // digests PER EXPLODED ROW downstream (measured 20x the whole init cost).
    val gtab = e.select(col("weight")).distinct()
      .withColumn("gn", transform(gs, g => g / gsum))
    val contrib = both.join(broadcast(gtab), "weight")
      .withColumn("contrib",
        graft.functions.VectorArith.vector_mul(col("gn"), col("weight")))
    sumArrays(contrib, "id")
      .join(types, Seq("id"), "right_outer")
      .select(col("id"), lit(true).as("active"), col("type"),
        coalesce(col("n"),
          array_repeat(lit(0.0), K)).as("n"))
  }

  /** Assign types the reference way (`LDA.cpp:276-285`): id ≤ ndoc → 'd'. */
  def typesByThreshold(graph: LinkGraph, ndoc: Long): DataFrame =
    graph.vertices.select(col("id"),
      when(col("id") <= ndoc, "d").otherwise("w").as("type"))

  def globalN(state: DataFrame): Array[Double] = {
    val r = state.filter(col("type") === "w")
      .agg(graft.functions.VectorSum.vector_sum(col("n"))).head()
    if (r.isNullAt(0)) new Array[Double](K)
    else r.getSeq[Double](0).toArray
  }

  def run(graph: LinkGraph, types: DataFrame, iterations: Int = 10,
          alpha: Double = 1.0, eta: Double = 5.0,
          vocabSize: Long = -1L,
          gammaFn: (Column, Int) => Column = gamma0): DataFrame = {
    val v = if (vocabSize > 0) vocabSize
            else types.filter(col("type") === "w").count()
    var state = init(graph, types, gammaFn)
    var it = 0
    while (it < iterations) {
      val gN = globalN(state) // do_every_iteration / pre-run calcGlobalN
      val gLit = array(gN.map(x => lit(x + v * (eta - 1.0))): _*)
      val spec = VertexProgramSpec(
        direction = Direction.All,
        activity = Activity.AllVertices,
        needsRecvState = true,
        send = fr => fr.select(col("id"), col("n").as("msg")),
        gather = df => {
          // native vector algebra (one codegen'd loop per op) replacing the
          // zip_with/transform lambdas — bit-identical operation order:
          // ((x+my)−1)·((x+oth)−1) / g, then (γ/Σγ)·weight
          import graft.functions.VectorArith._
          import graft.functions.VectorLSum.vector_lsum
          val my = when(col("v_type") === "d", alpha).otherwise(eta)
          val oth = when(col("v_type") === "d", eta).otherwise(alpha)
          val numer = vector_mul(
            vector_sub(vector_add(col("v_n"), my), lit(1.0)),
            vector_sub(vector_add(col("msg"), oth), lit(1.0)))
          val gammas = vector_div(numer, gLit)
          val gsum = vector_lsum(gammas)
          df.withColumn("contrib",
            vector_mul(vector_div(gammas, gsum), col("weight")))
        },
        reduce = df => sumArrays(df, "_recv").withColumnRenamed("n", "acc"),
        apply = (df, _) => df.select(
          col("id"), lit(true).as("active"), col("type"),
          coalesce(col("acc"), col("n")).as("n"),
          col("acc").isNotNull.as("_changed")),
        maxIterations = 1,
        trackChanges = false)
      state = Superstep.run(graph, state, spec).state
      it += 1
    }
    state.select("id", "type", "n")
  }

  /**
   * `LDALLProgram` (`/root/reference/src/LDA.cpp:196-250`, run by the LDA
   * main at `:334-341`): per-token log-likelihood. Along each STORED edge
   * doc→word (the program runs OUT_EDGES), the receiver w scores its tokens:
   *   phi_wk   = (w.N[k] + η−1) / (N_k[k] + V(η−1))      (smoothed topic-word;
   *              N_k = Σ over 'w' vertices of N, the post-run global vector)
   *   theta_kj = (doc.N[k] + η−1) / Σ_k (doc.N[k] + η−1) (doc-topic mix; the
   *              reference uses η here too, NOT α — mirrored faithfully)
   *   token_loglik(w) += count · ln(Σ_k phi_wk · theta_kj)
   * The reference then folds Σ_v token_loglik with applyReduceAllVertices
   * (`:336-341`) — here `logLikelihood`.
   */
  def tokenLogLik(graph: LinkGraph, state: DataFrame, eta: Double = 5.0,
                  vocabSize: Long = -1L): DataFrame = {
    val v = if (vocabSize > 0) vocabSize
            else state.filter(col("type") === "w").count()
    val gN = globalN(state)
    val nkS = array(gN.map(x => lit(x + v * (eta - 1.0))): _*)
    import graft.functions.VectorArith._
    import graft.functions.VectorLSum.vector_lsum
    val d = state.select(col("id").as("src"), col("n").as("dn"))
    val w = state.select(col("id").as("dst"), col("n").as("wn"))
    val thetaRaw = vector_add(col("dn"), lit(eta - 1.0))
    val thetaSum = vector_lsum(thetaRaw)
    val phi = vector_div(vector_add(col("wn"), lit(eta - 1.0)), nkS)
    val dot = graft.functions.VectorDot.vector_dot(phi, thetaRaw) / thetaSum
    graph.edges.join(d, "src").join(w, "dst")
      .withColumn("c", col("weight") * log(dot))
      .groupBy(col("dst").as("id")).agg(sum("c").as("token_loglik"))
  }

  /** Total corpus log-likelihood — the reference's `Total Loglikelihood`
    * print (`LDA.cpp:336-341`). */
  def logLikelihood(graph: LinkGraph, state: DataFrame, eta: Double = 5.0,
                    vocabSize: Long = -1L): Double =
    tokenLogLik(graph, state, eta, vocabSize)
      .agg(sum("token_loglik")).head().getDouble(0)

  /**
   * Oracle-replayable total log-likelihood: the same program evaluated over
   * the state QUANTIZED to the gate's 4-decimal precision (1e-4 integer
   * units), so every cross-engine aggregate — the global topic vector, each
   * doc's theta denominator, the final total — is exact integer arithmetic
   * with no float-summation-order dependence, and the only float ops are
   * IEEE-deterministic divisions of small integers plus a 20-term dot folded
   * in one fixed left-to-right order (Spark `aggregate` ≡ SQL's left-assoc
   * `t0+t1+…`). η is fixed at 5.0 (offset η−1 = 40000 quantized units).
   * Returns one row (ll, n_edges).
   */
  def logLikelihoodGated(graph: LinkGraph, state: DataFrame): DataFrame = {
    val q = state.select(col("id"), col("type"),
        transform(col("n"), x => round((x + lit(1e-9)) * 10000).cast("long")).as("nq"))
      .cache()
    val v = q.filter(col("type") === "w").count()
    val gRows = q.filter(col("type") === "w")
      .select(posexplode(col("nq")).as(Seq("k", "x")))
      .groupBy("k").agg(sum("x").as("g")).collect()
    val nkS = new Array[Long](K)
    gRows.foreach(r => nkS(r.getInt(0)) = r.getLong(1))
    val nkSLit = array(nkS.map(g => lit((g + v * 40000L).toDouble)): _*)
    val d = q.select(col("id").as("src"), col("nq").as("dn"))
    val w = q.select(col("id").as("dst"), col("nq").as("wn"))
    val sd = (aggregate(col("dn"), lit(0L), _ + _) + lit(800000L)).cast("double")
    val phi = zip_with(col("wn"), nkSLit, (x, g) => (x + lit(40000L)).cast("double") / g)
    val theta = transform(col("dn"), x => (x + lit(40000L)).cast("double") / sd)
    val dot = aggregate(zip_with(phi, theta, _ * _), lit(0.0), _ + _)
    val out = graph.edges.join(d, "src").join(w, "dst")
      .select(round(col("weight") * log(dot) * 10000).cast("long").as("cq"))
      .agg((sum("cq").cast("double") / 10000.0).as("ll"),
           count(lit(1)).as("n_edges"))
    val r = out.collect() // materialize before dropping the quantized cache
    q.unpersist()
    state.sparkSession.createDataFrame(
      java.util.Arrays.asList(r: _*), out.schema)
  }
}
