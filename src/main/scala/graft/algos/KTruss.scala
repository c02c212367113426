package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.LinkGraph

/**
 * K-truss decomposition by synchronous support peeling: keep every edge
 * whose support (triangles through it) is ≥ k−2 in the CURRENT edge set,
 * rounds until a fixpoint. The canonical parallel k-truss (Cohen 2008;
 * the same triangle join g_triangle uses, iterated), and the natural
 * next peel after k-core — cores peel vertices by degree, trusses peel
 * edges by triangle support.
 *
 * Shape at scale: each round is ONE self-join pass — canon edges joined
 * through the undirected adjacency on both endpoints (the wedge join),
 * counted per edge, filtered. No collect, no window; the edge set only
 * shrinks, and the loop localCheckpoints each round's survivors so the
 * plan stays flat. Transcript-shaped graphs settle in ≤4 rounds (the
 * g_ktruss oracle unrolls 6 — extra rounds are no-ops at the fixpoint).
 */
object KTruss {

  /** Surviving (a, b, support) edges of the k-truss of the undirected
    * simple view of `graph`; support = triangle count at the fixpoint. */
  def edges(graph: LinkGraph, k: Int, maxRounds: Int = 32): DataFrame = {
    val minSupport = k - 2
    var canon = graph.edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    var n = canon.count()
    var rounds = 0
    var stable = false
    while (!stable && rounds < maxRounds) {
      val supported = withSupport(canon).filter(col("support") >= minSupport)
        .select("a", "b").localCheckpoint()
      val m = supported.count()
      stable = m == n
      canon = supported
      n = m
      rounds += 1
    }
    // no silent caps: an un-converged peel would return edges whose support
    // is still below k-2 — fail loudly like Scc does on its outer rail
    if (!stable)
      throw new IllegalStateException(
        s"KTruss: peel did not reach the fixpoint within maxRounds=$maxRounds " +
          s"($n edges still live); raise maxRounds")
    withSupport(canon)
  }

  /** (a, b, support): triangles through each canon edge within the set. */
  private def withSupport(canon: DataFrame): DataFrame = {
    val und = canon.union(canon.select(col("b").as("a"), col("a").as("b")))
    val sup = canon.alias("e")
      .join(und.alias("x"), col("e.a") === col("x.a"))
      .join(und.alias("y"),
        col("e.b") === col("y.a") && col("x.b") === col("y.b"))
      .groupBy(col("e.a").as("a"), col("e.b").as("b"))
      .agg(count(lit(1)).as("support"))
    canon.join(sup, Seq("a", "b"), "left_outer")
      .select(col("a"), col("b"), coalesce(col("support"), lit(0L)).as("support"))
  }
}
