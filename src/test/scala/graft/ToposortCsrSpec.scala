package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Edge, LinkGraph}
import graft.engine.{GatherScatter, ToposortCsr}
import graft.algos.TopologicalSort

/** Kahn peel on the CSR per-vertex sparse frontier (ToposortCsr) against
  * the column engine's TopologicalSort: identical orders (−1 sentinel for
  * cycle members/descendants) and identical superstep counts. */
class ToposortCsrSpec extends AnyFunSuite {
  lazy val s = SparkTestBase.spark

  def csr(es: Seq[Edge], nParts: Int, hotDegree: Long)
      : (Map[Long, Long], Int) = {
    val g = LinkGraph.fromSeq(s, es, nParts)
    val built = GatherScatter.build(g, nParts, hotDegree = hotDegree)
    val (orders, iters) = ToposortCsr.run(built)
    val out = GatherScatter.toDF(s, orders).collect()
      .map(r => r.getLong(0) -> r.getDouble(1).toLong).toMap
    orders.unpersist(false)
    built.unpersist()
    g.unpersistAll()
    (out, iters)
  }

  def column(es: Seq[Edge]): (Map[Long, Long], Int) = {
    val g = LinkGraph.fromSeq(s, es, 4)
    val res = TopologicalSort.run(g)
    val out = res.state.select("id", "order").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    res.state.unpersist()
    g.unpersistAll()
    (out, res.iterations)
  }

  test("CSR Kahn peel == column engine on a diamond DAG (orders + supersteps)") {
    // diamonds with shared sinks and varying depths
    val es = (0 until 10).flatMap { c =>
      val b = 100L * c
      Seq(Edge(b, b + 1, 1.0), Edge(b, b + 2, 1.0), Edge(b + 1, b + 3, 1.0),
        Edge(b + 2, b + 3, 1.0), Edge(b + 3, b + 4, 1.0), Edge(b + 2, b + 4, 1.0))
    }
    val (fast, fi) = csr(es, 4, -1L)
    val (col, ci) = column(es)
    assert(fast === col)
    assert(fi === ci, s"superstep counts differ: csr $fi vs column $ci")
  }

  test("cycles leave the -1 sentinel on members and descendants") {
    val es = Seq(
      Edge(1, 2, 1.0), Edge(2, 3, 1.0), Edge(3, 1, 1.0), // 3-cycle
      Edge(3, 4, 1.0), Edge(4, 5, 1.0),                  // behind the cycle
      Edge(10, 11, 1.0), Edge(11, 12, 1.0))              // clean chain
    val (fast, _) = csr(es, 2, -1L)
    for (v <- Seq(1L, 2L, 3L, 4L, 5L)) assert(fast(v) === -1L, s"vertex $v")
    assert(fast(10L) === 0L && fast(11L) === 1L && fast(12L) === 2L)
    assert(fast === column(es)._1)
  }

  test("hot-vertex split leaves orders unchanged (planted hub source)") {
    val hub = (2L to 901L).map(d => Edge(1L, d, 1.0))
    val tail = (2L to 901L).map(d => Edge(d, 10000L + d, 1.0))
    val es = hub ++ tail
    val (split, si) = csr(es, 8, hotDegree = 100)
    val (plain, pi) = csr(es, 8, hotDegree = -1L)
    assert(split === plain)
    assert(si === pi)
    assert(split === column(es)._1)
  }
}
