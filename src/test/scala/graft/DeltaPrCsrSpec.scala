package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Edge, LinkGraph}
import graft.engine.{DeltaPrCsr, GatherScatter}
import graft.algos.DeltaPageRank

/** Incremental PageRank on the CSR per-vertex sparse frontier
  * (DeltaPrCsr) against the column engine's DeltaPageRank: identical
  * fixpoint ranks AND identical superstep counts (the frontier shrinks the
  * same way in both engines). */
class DeltaPrCsrSpec extends AnyFunSuite {
  lazy val s = SparkTestBase.spark

  def csr(es: Seq[Edge], nParts: Int, hotDegree: Long)
      : (Map[Long, Double], Int) = {
    val g = LinkGraph.fromSeq(s, es, nParts)
    val built = GatherScatter.build(g, nParts, hotDegree = hotDegree)
    val (ranks, iters) = DeltaPrCsr.run(built)
    val out = GatherScatter.toDF(s, ranks).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ranks.unpersist(false)
    built.unpersist()
    g.unpersistAll()
    (out, iters)
  }

  def column(es: Seq[Edge]): (Map[Long, Double], Int) = {
    val g = LinkGraph.fromSeq(s, es, 4)
    val res = DeltaPageRank.run(g)
    val out = res.state.select("id", "pagerank").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    res.state.unpersist()
    g.unpersistAll()
    (out, res.iterations)
  }

  def assertClose(a: Map[Long, Double], b: Map[Long, Double], tol: Double): Unit = {
    assert(a.keySet === b.keySet)
    for ((id, x) <- a) assert(math.abs(x - b(id)) < tol, s"vertex $id: $x vs ${b(id)}")
  }

  test("CSR delta PageRank == column engine on the reference graph (ranks + supersteps)") {
    val es = SparkTestBase.testGraphEdges.map { case (a, b) => Edge(a, b, 1.0) }
    val (fast, fi) = csr(es, 4, -1L)
    val (col, ci) = column(es)
    assertClose(fast, col, 1e-12)
    assert(fi === ci, s"superstep counts differ: csr $fi vs column $ci")
  }

  test("chains converge to the closed form 1 - 0.7^(k+1)") {
    // disjoint directed paths: position k in a path settles at 1-0.7^(k+1)
    val es = (0 until 12).flatMap(c =>
      (0 until 9).map(i => Edge(1000L * c + i, 1000L * c + i + 1, 1.0)))
    val (fast, _) = csr(es, 4, -1L)
    for (c <- 0 until 12; i <- 0 to 9)
      assert(math.abs(fast(1000L * c + i) - (1.0 - math.pow(0.7, i + 1))) < 1e-7,
        s"chain $c pos $i")
  }

  test("hot-vertex split leaves the fixpoint unchanged (planted hub)") {
    val hub = (2L to 1201L).map(d => Edge(1L, d, 1.0))
    val chains = (0 until 30).flatMap(c =>
      (0 until 15).map(i => Edge(50000L + c * 100 + i, 50000L + c * 100 + i + 1, 1.0)))
    val es = hub ++ chains
    val (split, si) = csr(es, 8, hotDegree = 100)
    val (plain, pi) = csr(es, 8, hotDegree = -1L)
    assertClose(split, plain, 1e-12)
    assert(si === pi)
    assertClose(split, column(es)._1, 1e-12)
  }
}
