package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Edge, LinkGraph}
import graft.algos.Neighborhood

/** ANF/HyperBall sketches: bit-exact determinism (the gate covers the DuckDB
  * twin; these cover partition invariance), FM estimate accuracy against
  * exact BFS reach, and the monotone-growth invariant OR-registers guarantee. */
class NeighborhoodSpec extends AnyFunSuite {
  import SparkTestBase._
  lazy val s = spark

  private def graphOf(es: Seq[(Long, Long)], parts: Int = 4): LinkGraph =
    LinkGraph.fromSeq(s, es.map { case (a, b) => Edge(a, b, 1.0) }, parts)

  /** Vertex-transitive ring with skip edges: every vertex's h-hop reach is
    * identical, so one BFS gives the exact per-vertex truth. */
  private val n = 1500
  private val ringSkip: Seq[(Long, Long)] =
    (0L until n).flatMap(i => Seq((i, (i + 1) % n), (i, (i + 7) % n)))

  private def exactReach(h: Int): Long = {
    val adj = ringSkip.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var frontier = Set(0L); var seen = Set(0L)
    for (_ <- 1 to h) {
      frontier = frontier.flatMap(adj.getOrElse(_, Nil)) -- seen
      seen ++= frontier
    }
    seen.size.toLong
  }

  test("sketch registers are partition-invariant bit-for-bit") {
    def regs(parts: Int) =
      Neighborhood.sketches(graphOf(testGraphEdges, parts), hops = 3, k = 4)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(regs(1) === regs(7))
  }

  test("FM estimate tracks exact h-hop reach on a vertex-transitive graph") {
    val g = graphOf(ringSkip, 8)
    for (h <- Seq(3, 6)) {
      val truth = exactReach(h).toDouble * n
      val est = Neighborhood.reach(g, hops = h, k = 64)
        .agg(org.apache.spark.sql.functions.sum("reach")).head().getDouble(0)
      assert(math.abs(est - truth) / truth < 0.3,
        s"h=$h: est $est vs exact $truth (${est / truth}x)")
    }
  }

  test("neighborhood function is monotone nondecreasing in h") {
    val nf = Neighborhood.neighborhoodFunction(graphOf(testGraphEdges), maxH = 4, k = 16)
    assert(nf.map(_._1) === (0 to 4))
    nf.sliding(2).foreach { case Seq((_, a), (_, b)) => assert(b >= a - 1e-9) }
  }

  test("harmonic centrality: star center ~= leaf count, leaves exactly 0") {
    val star = graphOf((1L to 400L).map(i => (0L, i)), 4)
    val hc = Neighborhood.harmonicCentrality(star, maxH = 3, k = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // center reaches 400 leaves all at distance 1: H(center) = 400
    assert(math.abs(hc(0L) - 400.0) / 400.0 < 0.35, s"center ${hc(0L)}")
    // leaves reach nothing: registers never change, diffs identically 0
    (1L to 400L).foreach(l => assert(hc(l) === 0.0, s"leaf $l"))
  }

  test("effective diameter: star saturates by hop 1, chain grows linearly") {
    val star = graphOf((1L to 400L).map(i => (0L, i)), 4)
    assert(Neighborhood.effectiveDiameter(star, q = 0.9, maxH = 3, k = 32) <= 1.5)
    // directed chain of 120: exact eff. diameter at q=0.9 is ~96% of length;
    // FM noise tolerated with a wide but meaningful band
    val chain = graphOf((0L until 119L).map(i => (i, i + 1)), 4)
    val d = Neighborhood.effectiveDiameter(chain, q = 0.9, maxH = 119, k = 32)
    assert(d > 50.0 && d <= 119.0, s"chain effective diameter $d")
  }
}
