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

  /** One ⊕ over exploded topic dims: (id, contrib array) → summed arrays. */
  private def sumArrays(df: DataFrame, key: String): DataFrame = df
    .select(col(key), posexplode(col("contrib")).as(Seq("k", "v")))
    .groupBy(key, "k").agg(sum("v").as("v"))
    .groupBy(key)
    .agg(transform(array_sort(collect_list(struct(col("k"), col("v")))),
      s => s.getField("v")).as("n"))

  /** The init superstep as its algebraic meaning: per-vertex sum of
    * gamma-normalized edge-count vectors over ALL incident edges. */
  def init(graph: LinkGraph, types: DataFrame,
           gammaFn: (Column, Int) => Column = gamma0): DataFrame = {
    val e = graph.edges
    val both = e.select(col("dst").as("id"), col("weight"))
      .union(e.select(col("src").as("id"), col("weight")))
    val gs = array((0 until K).map(i => gammaFn(col("weight"), i)): _*)
    val gsum = aggregate(gs, lit(0.0), _ + _)
    // gammas are seeded by the edge VALUE alone, so normalize once per
    // DISTINCT value (a tiny table — counts/ratings) and broadcast-join it
    // back. Inlining the K-hash array expression instead re-evaluates all K
    // digests PER EXPLODED ROW downstream (measured 20x the whole init cost).
    val gtab = e.select(col("weight")).distinct()
      .withColumn("gn", transform(gs, g => g / gsum))
    val contrib = both.join(broadcast(gtab), "weight")
      .withColumn("contrib", transform(col("gn"), g => g * col("weight")))
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
    val rows = state.filter(col("type") === "w")
      .select(posexplode(col("n")).as(Seq("k", "v")))
      .groupBy("k").agg(sum("v").as("v"))
      .collect()
    val out = new Array[Double](K)
    rows.foreach(r => out(r.getInt(0)) = r.getDouble(1))
    out
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
          val my = when(col("v_type") === "d", alpha).otherwise(eta)
          val oth = when(col("v_type") === "d", eta).otherwise(alpha)
          val numer = zip_with(
            transform(col("v_n"), x => x + my - 1.0),
            transform(col("msg"), x => x + oth - 1.0), _ * _)
          val gammas = zip_with(numer, gLit, _ / _)
          val gsum = aggregate(gammas, lit(0.0), _ + _)
          df.withColumn("contrib", transform(gammas, g => g / gsum * col("weight")))
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
}
