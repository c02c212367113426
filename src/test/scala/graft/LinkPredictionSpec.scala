package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Edge, LinkGraph}
import graft.algos.LinkPrediction

class LinkPredictionSpec extends AnyFunSuite {
  import SparkTestBase._
  lazy val s = spark

  private def graphOf(es: Seq[(Long, Long)], parts: Int = 4): LinkGraph =
    LinkGraph.fromSeq(s, es.map { case (a, b) => Edge(a, b, 1.0) }, parts)

  /** Brute-force Adamic-Adar over the undirected simple view; wedge centers
    * above `maxDeg` are skipped, mirroring the operator's cut. */
  private def refAA(es: Seq[(Long, Long)],
                    maxDeg: Long = Long.MaxValue): Map[(Long, Long), (Long, Double)] = {
    val canon = es.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val nbrs = (canon ++ canon.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val deg = nbrs.map { case (k, v) => k -> v.size }
    val vs = nbrs.keys.toSeq.sorted
    val adj = canon.toSet
    (for {
      i <- vs.indices; j <- (i + 1) until vs.size
      a = vs(i); b = vs(j)
      if !adj.contains((a, b))
      common = nbrs(a).intersect(nbrs(b)).filter(w => deg(w) <= maxDeg)
      if common.nonEmpty
    } yield (a, b) -> (common.size.toLong,
        common.toSeq.map(w => 1.0 / math.log(deg(w).toDouble)).sum))
      .toMap
  }

  private def sparkAA(es: Seq[(Long, Long)], k: Int,
                      maxDegree: Long = Long.MaxValue): Seq[(Long, Long, Long, Double)] =
    LinkPrediction.adamicAdar(graphOf(es), k, maxDegree).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq

  test("path graph: endpoints-of-wedges scored, adjacent pairs excluded") {
    // 1-2-3-4-5 chain: candidates are exactly the distance-2 pairs
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = sparkAA(es, 100)
    val want = refAA(es)
    assert(got.map(g => (g._1, g._2)).toSet === want.keySet)
    for ((a, b, common, score) <- got) {
      assert(common === want((a, b))._1)
      assert(math.abs(score - want((a, b))._2) < 1e-6)
    }
    // middle-vertex degree 2 => each distance-2 score is 1/ln(2)
    assert(math.abs(got.find(g => (g._1, g._2) == (1L, 3L)).get._4 - 1.0 / math.log(2)) < 1e-6)
  }

  test("reference test graph matches brute force, and top-k is the score order") {
    val got = sparkAA(testGraphEdges, 1000)
    val want = refAA(testGraphEdges)
    assert(got.size === want.size)
    for ((a, b, common, score) <- got) {
      assert(common === want((a, b))._1, s"common($a,$b)")
      assert(math.abs(score - want((a, b))._2) < 1e-6, s"score($a,$b)")
    }
    // k cuts the same prefix the full ranking has
    val top3 = sparkAA(testGraphEdges, 3)
    assert(top3 === got.sortBy(g => (-g._4, g._1, g._2)).take(3))
  }

  test("maxDegree drops hub centers deterministically") {
    // star center 100 has degree 6; capping below that kills all its wedges
    val star = (1L to 6L).map(i => (i, 100L))
    assert(sparkAA(star, 100).nonEmpty)
    assert(sparkAA(star, 100, maxDegree = 5).isEmpty)
    // on a mixed graph the cap removes exactly the hub-centered wedges
    val mixed = star ++ Seq((1L, 2L), (2L, 3L))
    val capped = sparkAA(mixed, 100, maxDegree = 5)
    val want = refAA(mixed, maxDeg = 5)
    assert(capped.map(g => (g._1, g._2)).toSet === want.keySet)
    for ((a, b, common, score) <- capped)
      assert(common === want((a, b))._1 && math.abs(score - want((a, b))._2) < 1e-6)
  }

  test("self-loops and duplicate directed edges don't inflate scores") {
    val es = Seq((1L, 2L), (2L, 1L), (2L, 2L), (2L, 3L), (3L, 2L))
    val got = sparkAA(es, 100)
    val want = refAA(es)
    assert(got.map(g => (g._1, g._2)).toSet === want.keySet)
    for ((a, b, common, score) <- got)
      assert(common === want((a, b))._1 && math.abs(score - want((a, b))._2) < 1e-6)
  }
}
