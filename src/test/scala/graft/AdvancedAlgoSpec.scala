package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Edge, LinkGraph}
import graft.algos._

class AdvancedAlgoSpec extends AnyFunSuite {
  import SparkTestBase._
  lazy val s = spark

  def graphOf(es: Seq[(Long, Long, Double)], parts: Int = 4): LinkGraph =
    LinkGraph.fromSeq(s, es.map { case (a, b, w) => Edge(a, b, w) }, parts)

  test("delta pagerank converges to the PageRank fixpoint on the reference graph") {
    val g = graphOf(testGraphEdges.map { case (a, b) => (a, b, 1.0) })
    val res = DeltaPageRank.run(g)
    assert(res.converged)
    val got = res.state.select("id", "pagerank").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // truth: high-precision fixpoint of the same recurrence
    val truth = refPageRank(testGraphEdges, tol = 1e-12)
    for ((v, p) <- truth) assert(math.abs(got(v) - p) < 1e-4, s"vertex $v: ${got(v)} vs $p")
  }

  test("topological sort: orders = longest-path depth from sources; exact on the reference DAG") {
    val g = graphOf(testGraphEdges.map { case (a, b) => (a, b, 1.0) })
    val res = TopologicalSort.run(g)
    val got = res.state.select("id", "order").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L,
                   6L -> 4L, 7L -> 5L, 8L -> 5L)
    assert(got === want)
    assert(TopologicalSort.unreachable(res) === 0L)
  }

  test("topological sort detects cycles (unreachable vertices keep order -1)") {
    val g = graphOf(Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0), (1L, 4L, 1.0)))
    val res = TopologicalSort.run(g)
    assert(TopologicalSort.unreachable(res) === 4L) // the cycle + everything behind it
  }

  test("delta-stepping distances == Bellman-Ford SSSP, multiple buckets processed") {
    val es = Seq(
      (1L, 2L, 5.0), (1L, 3L, 1.0), (3L, 2L, 1.0), (2L, 4L, 2.0), (3L, 4L, 8.0),
      (4L, 5L, 1.0), (1L, 5L, 10.0), (5L, 6L, 4.0), (3L, 6L, 9.0))
    val g = graphOf(es)
    val (state, buckets) = DeltaStepping.run(g, 1L, delta = 3.0)
    val got = state.select("id", "dist").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Sssp.run(g, 1L).state.select("id", "dist").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === want)
    assert(got(6L) === 9.0 && got(4L) === 4.0)
    assert(buckets >= 3) // 2 light rounds + heavy relaxations spread the buckets
  }

  test("sgd: distributed updates match a sequential fold with the same init; rmse drops") {
    // ratings7 fixture (FIXTURES.md): users 1-4, items 5-7, weighted edges
    val ratings = Seq((1L, 5L, 1.0), (1L, 7L, 2.0), (2L, 5L, 2.0), (2L, 7L, 4.0),
                      (3L, 6L, 2.0), (3L, 7L, 3.0), (4L, 7L, 3.0))
    val g = graphOf(ratings)
    val iters = 5
    val lambda = 0.001
    val step = 0.1 // large step so movement is visible above float noise
    val res = Sgd.run(g, iters, lambda, step)
    val got = res.state.select("id", "lv").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

    // sequential oracle with identical init + update rule
    def initLv(id: Long, k: Int): Double = Sgd.initLv(id, k)
    val K = Sgd.K
    val vs = (ratings.map(_._1) ++ ratings.map(_._2)).distinct
    var lv = vs.map(v => v -> Array.tabulate(K)(k => initLv(v, k))).toMap
    val undirected = ratings.flatMap { case (u, v, r) => Seq((u, v, r), (v, u, r)) }
    for (_ <- 0 until iters) {
      val acc = scala.collection.mutable.Map[Long, Array[Double]]()
      for ((snd, rcv, r) <- undirected) {
        val m = lv(snd); val p = lv(rcv)
        val est = (0 until K).map(k => m(k) * p(k)).sum
        val err = r - est
        val a = acc.getOrElseUpdate(rcv, new Array[Double](K))
        for (k <- 0 until K) a(k) += m(k) * err
      }
      lv = lv.map { case (v, cur) =>
        acc.get(v) match {
          case Some(a) => v -> Array.tabulate(K)(k => cur(k) + step * (-lambda * cur(k) + a(k)))
          case None => v -> cur
        }
      }
    }
    for (v <- vs; k <- 0 until K)
      assert(math.abs(got(v)(k) - lv(v)(k)) < 1e-9, s"vertex $v dim $k")

    // rmse improves over the init state
    val rmseAfter = Sgd.rmse(g, res.state)
    val init0 = Sgd.run(g, 0, lambda, step) // 0 iterations = init only
    val rmseBefore = Sgd.rmse(g, init0.state)
    assert(rmseAfter < rmseBefore, s"$rmseAfter !< $rmseBefore")
  }
}
