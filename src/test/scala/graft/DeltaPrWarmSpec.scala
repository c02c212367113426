package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.algos.DeltaPageRank
import graft.core.LinkGraph

/**
 * Warm-start delta PageRank under graph change: the maintained ranks must
 * land on the SAME fixpoint a cold run computes on the changed graph — for
 * growth (including source-degree changes and new cycles), for shrink, and
 * for no-op updates. Residual seeding is the part the closed-form driver
 * gate (g_deltapr_warm, chain graphs) cannot fully exercise: chains never
 * change a source's out-degree, these graphs do.
 */
class DeltaPrWarmSpec extends AnyFunSuite {
  lazy val s = SparkTestBase.spark
  import s.implicits._

  private def graph(es: Seq[(Long, Long)]): LinkGraph =
    LinkGraph(es.toDF("src", "dst"), numPartitions = 4)

  private def ranksOf(df: DataFrame): Map[Long, Double] =
    df.select("id", "pagerank").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def assertClose(got: Map[Long, Double], want: Map[Long, Double], tol: Double = 1e-6): Unit = {
    assert(got.keySet === want.keySet)
    for ((id, w) <- want)
      assert(math.abs(got(id) - w) < tol, s"vertex $id: got ${got(id)}, want $w")
  }

  // before: 1→{2,3}, 3→4 (a small DAG)
  private val before = Seq((1L, 2L), (1L, 3L), (3L, 4L))
  // growth: 1 gains a THIRD out-edge (deg 2→3 re-prices vertices 2 and 3),
  // new vertices 5 and 6 appear, and 1→2→6→1 closes a cycle
  private val grown = before ++ Seq((1L, 5L), (2L, 6L), (6L, 1L))

  test("warm start after growth (degree change + new cycle + new vertices) matches a cold run") {
    val prev = DeltaPageRank.run(graph(before)).state.select("id", "pagerank")
    val warm = DeltaPageRank.warmStart(graph(grown), prev)
    val cold = DeltaPageRank.run(graph(grown))
    assert(warm.converged && cold.converged)
    assertClose(ranksOf(warm.state), ranksOf(cold.state))
  }

  test("warm start after shrink (edges and a vertex removed) matches a cold run") {
    val prev = DeltaPageRank.run(graph(grown)).state.select("id", "pagerank")
    val warm = DeltaPageRank.warmStart(graph(before), prev)
    val cold = DeltaPageRank.run(graph(before))
    assert(warm.converged)
    // vertices 5 and 6 left the graph: they must not appear in the state
    assert(ranksOf(warm.state).keySet === Set(1L, 2L, 3L, 4L))
    assertClose(ranksOf(warm.state), ranksOf(cold.state))
  }

  test("warm start on an unchanged graph is a near-no-op and moves nothing") {
    val g = graph(grown)
    val cold = DeltaPageRank.run(g)
    val warm = DeltaPageRank.warmStart(g, cold.state.select("id", "pagerank"))
    assert(warm.converged)
    // residuals at a converged state are truncation-sized (≤ eps/(1−0.7));
    // a couple of tiny supersteps are allowed, a re-convergence is not
    assert(warm.iterations <= 4, s"unchanged graph took ${warm.iterations} supersteps")
    assertClose(ranksOf(warm.state), ranksOf(cold.state), tol = 1e-6)
  }

  test("warm start on the reference fixture grown edge-by-region matches the sequential oracle") {
    val all = SparkTestBase.testGraphEdges
    val half = all.take(7)
    val prev = DeltaPageRank.run(graph(half)).state.select("id", "pagerank")
    val warm = DeltaPageRank.warmStart(graph(all), prev)
    val want = SparkTestBase.refPageRank(all, tol = 1e-8)
    assertClose(ranksOf(warm.state), want, tol = 1e-5)
  }
}
