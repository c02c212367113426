package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Edge, LinkGraph}
import graft.algos._
import graft.engine._

class GraphAlgoSpec extends AnyFunSuite {
  import SparkTestBase._
  lazy val s = spark

  def graphOf(es: Seq[(Long, Long)], parts: Int = 4): LinkGraph =
    LinkGraph.fromSeq(s, es.map { case (a, b) => Edge(a, b, 1.0) }, parts)

  lazy val testGraph = graphOf(testGraphEdges)

  test("degree: out-degrees on the reference test graph") {
    val got = Degree.outDegrees(testGraph).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = testGraphEdges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    assert(got === want)
  }

  test("degree: 1-superstep engine path agrees with the direct aggregate") {
    val viaEngine = Degree.viaEngine(testGraph).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = Degree.outDegrees(testGraph).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // engine path also reports degree-0 vertices (init state covers all)
    assert(viaEngine.filter(_._2 > 0) === direct)
    assert(viaEngine.keySet === (1L to 8L).toSet)
  }

  test("pagerank matches GraphMat semantics on the reference test graph (allclose 1e-6)") {
    val res = PageRank.run(testGraph)
    val got = res.state.select("id", "pagerank").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPageRank(testGraphEdges)
    assert(got.keySet === want.keySet)
    for ((v, p) <- want)
      assert(math.abs(got(v) - p) < 1e-6, s"vertex $v: got ${got(v)}, want $p")
    assert(res.converged)
  }

  test("pagerank is partition-count invariant") {
    val a = PageRank.run(graphOf(testGraphEdges, 1)).state
      .select("id", "pagerank").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = PageRank.run(graphOf(testGraphEdges, 7)).state
      .select("id", "pagerank").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (v <- a.keys) assert(math.abs(a(v) - b(v)) < 1e-12)
  }

  test("connected components: HashMin finds exact components") {
    val es = testGraphEdges ++ Seq((20L, 21L), (21L, 22L), (30L, 30L))
    val res = ConnectedComponents.run(graphOf(es))
    val got = res.state.select("id", "component").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (v <- 1L to 8L) assert(got(v) === 1L)
    for (v <- 20L to 22L) assert(got(v) === 20L)
    assert(res.converged)
  }

  test("bfs: depths on reference test graph; chain generator oracle depth(i)=i-1") {
    val res = Bfs.run(testGraph, 1L)
    val got = res.state.select("id", "depth", "parent").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .map(t => t._1 -> (t._2, t._3)).toMap
    val wantDepth = Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L,
                        6L -> 2L, 7L -> 3L, 8L -> 2L)
    for ((v, d) <- wantDepth) assert(got(v)._1 === d, s"vertex $v")
    assert(got(7L)._2 === 4L) // min-parent determinism (parents 4,5,6 reach 7)

    // circular chain generator (`test/generator.h:151-167`; oracle
    // `test_bfs.cpp:191-236`): depth(i) = i-1 from source 1
    val n = 30L
    val chain = (1L until n).map(i => (i, i + 1)) :+ (n, 1L)
    val cres = Bfs.run(graphOf(chain), 1L)
    val cgot = cres.state.select("id", "depth").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (i <- 1L to n) assert(cgot(i) === i - 1, s"chain vertex $i")
  }

  test("bfs: upper-triangular complete + dense complete generator oracles") {
    val n = 40L
    // upper-triangular complete (`generator.h:107-127`): from v, all w>v at depth 1
    val ut = for (i <- 1L to n; j <- (i + 1) to n) yield (i, j)
    val g1 = Bfs.run(graphOf(ut), 5L).state.select("id", "depth").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (w <- 6L to n) assert(g1(w) === 1L)
    for (w <- 1L to 4L) assert(g1(w) === -1L) // unreachable
    // dense complete with self-loops (`generator.h:129-149`): all others depth 1
    val dense = for (i <- 1L to 20L; j <- 1L to 20L) yield (i, j)
    val g2 = Bfs.run(graphOf(dense), 7L).state.select("id", "depth").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (w <- 1L to 20L; if w != 7L) assert(g2(w) === 1L)
  }

  test("sssp: unit weights = bfs depths; weighted relaxation finds shorter path") {
    val res = Sssp.run(testGraph, 1L)
    val got = res.state.select("id", "dist").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bfsD = Map(1L -> 0.0, 2L -> 1.0, 3L -> 1.0, 4L -> 2.0, 5L -> 3.0,
                   6L -> 2.0, 7L -> 3.0, 8L -> 2.0)
    for ((v, d) <- bfsD) assert(got(v) === d)

    // weighted: 1->2 (w10), 1->3 (w1), 3->2 (w2): dist(2) = 3 via relaxation
    val g = LinkGraph.fromSeq(s, Seq(Edge(1, 2, 10), Edge(1, 3, 1), Edge(3, 2, 2)))
    val wgot = Sssp.run(g, 1L).state.select("id", "dist").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(wgot(2L) === 3.0 && wgot(3L) === 1.0)
  }

  test("label propagation: two disjoint triangles converge to min labels") {
    val es = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
    val res = LabelPropagation.run(graphOf(es), iterations = 10)
    val got = res.state.select("id", "label").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).map(got) === Seq(1L, 1L, 1L))
    assert(Seq(10L, 11L, 12L).map(got) === Seq(10L, 10L, 10L))
    assert(res.converged) // reached a fixpoint before the budget
  }

  test("triangle orientation is degree-ordered: a star hub generates no wedges") {
    import org.apache.spark.sql.functions._
    // star: hub 1 with 60 spokes (id-ordering would enumerate C(60,2)=1770
    // wedges around it) + a 4-clique holding the only real triangles
    val star = (2L to 61L).map(d => Edge(1L, d, 1.0))
    val clique = for (a <- 100L to 103L; b <- (a + 1) to 103L) yield Edge(a, b, 1.0)
    val g = LinkGraph.fromSeq(s, star ++ clique, 4)
    val tri = TriangleCount.perVertex(g).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri.values.sum === 4L)                 // C(4,3) triangles
    assert(tri(103L) === 3L && tri(102L) === 1L)  // max-id attribution
    val o = TriangleCount.orientByDegree(
      graft.core.EdgeOps.toDag(g.edges).select("src", "dst"))
    val wedgeCount = o.groupBy("lo").count()
      .agg(sum(col("count") * (col("count") - 1) / 2)).head().getDouble(0)
    assert(wedgeCount === 4.0, s"degree orientation should leave only the clique's wedges, got $wedgeCount")
  }

  test("triangle count: reference test graph has 6 triangles, attributed to max vertex") {
    val got = TriangleCount.perVertex(testGraph).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 0L,
                       6L -> 1L, 7L -> 2L, 8L -> 1L))
    assert(TriangleCount.total(testGraph) === 6L)
  }

  test("exact component/label results are partition-count invariant") {
    val es = testGraphEdges ++ Seq((20L, 21L), (21L, 22L))
    def ccAt(p: Int) = ConnectedComponents.run(graphOf(es, p)).state
      .select("id", "component").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ccAt(1) === ccAt(4))
    def lpAt(p: Int) = LabelPropagation.run(graphOf(es, p), 5).state
      .select("id", "label").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lpAt(1) === lpAt(4))
  }
}
