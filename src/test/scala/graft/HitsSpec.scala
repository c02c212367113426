package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Edge, LinkGraph}
import graft.algos.Hits

/** HITS parity against a sequential power-iteration reference, plus the
  * structural properties (unit norms, star-graph extremes, partition
  * invariance) the gate's unrolled twin can't distinguish from luck. */
class HitsSpec extends AnyFunSuite {
  import SparkTestBase._
  lazy val s = spark

  private def graphOf(es: Seq[(Long, Long)], parts: Int = 4): LinkGraph =
    LinkGraph.fromSeq(s, es.map { case (a, b) => Edge(a, b, 1.0) }, parts)

  /** Sequential HITS with the same update order: auth half then hub half,
    * each L2-normalized. */
  private def refHits(es: Seq[(Long, Long)], iters: Int): Map[Long, (Double, Double)] = {
    val vs = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val in = es.groupBy(_._2); val out = es.groupBy(_._1)
    var hub = vs.map(_ -> 1.0).toMap
    var auth = Map.empty[Long, Double]
    for (_ <- 1 to iters) {
      val araw = vs.map(v => v -> in.getOrElse(v, Nil).map(e => hub(e._1)).sum).toMap
      val an = math.sqrt(araw.values.map(x => x * x).sum)
      auth = araw.map { case (k, v) => k -> v / an }
      val hraw = vs.map(v => v -> out.getOrElse(v, Nil).map(e => auth(e._2)).sum).toMap
      val hn = math.sqrt(hraw.values.map(x => x * x).sum)
      hub = hraw.map { case (k, v) => k -> v / hn }
    }
    vs.map(v => v -> (hub(v), auth(v))).toMap
  }

  private def sparkHits(es: Seq[(Long, Long)], iters: Int,
                        parts: Int = 4): Map[Long, (Double, Double)] =
    Hits.run(graphOf(es, parts), iters).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap

  private def allClose(a: Map[Long, (Double, Double)],
                       b: Map[Long, (Double, Double)], tol: Double = 1e-9): Unit = {
    assert(a.keySet === b.keySet)
    for (k <- a.keys) {
      assert(math.abs(a(k)._1 - b(k)._1) < tol, s"hub($k): ${a(k)._1} vs ${b(k)._1}")
      assert(math.abs(a(k)._2 - b(k)._2) < tol, s"auth($k): ${a(k)._2} vs ${b(k)._2}")
    }
  }

  test("reference test graph matches the sequential fold at 1, 3, 8 iterations") {
    for (iters <- Seq(1, 3, 8))
      allClose(sparkHits(testGraphEdges, iters), refHits(testGraphEdges, iters))
  }

  test("both score vectors are unit L2 after every run") {
    val got = sparkHits(testGraphEdges, 4)
    assert(math.abs(math.sqrt(got.values.map(_._1).map(x => x * x).sum) - 1.0) < 1e-9)
    assert(math.abs(math.sqrt(got.values.map(_._2).map(x => x * x).sum) - 1.0) < 1e-9)
  }

  test("in-star: center is the sole authority, leaves are the hubs") {
    val es = (1L to 6L).map(i => (i, 100L))
    val got = sparkHits(es, 3)
    assert(math.abs(got(100L)._2 - 1.0) < 1e-9) // all authority mass
    assert(got(100L)._1 === 0.0)                // no out-edges -> zero hub
    for (i <- 1L to 6L) {
      assert(got(i)._2 === 0.0)
      assert(math.abs(got(i)._1 - 1.0 / math.sqrt(6)) < 1e-9)
    }
  }

  test("disconnected bipartite blocks: mass splits by block size") {
    // block A: 3 hubs -> 1 auth; block B: 1 hub -> 1 auth
    val es = Seq((1L, 10L), (2L, 10L), (3L, 10L), (20L, 30L))
    allClose(sparkHits(es, 5), refHits(es, 5))
  }

  test("partition invariance") {
    allClose(sparkHits(testGraphEdges, 4, parts = 2),
             sparkHits(testGraphEdges, 4, parts = 7))
  }
}
