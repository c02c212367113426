package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{Edge, LinkGraph}
import graft.algos.{KTruss, Modularity}

/** K-truss laws (every survivor in ≥ k−2 triangles within the survivor set,
  * the peel cascade the fixed-round oracle can't prove, known fixtures) and
  * modularity closed forms. */
class TrussCommunitySpec extends AnyFunSuite {
  import SparkTestBase._
  lazy val s = spark

  private def graphOf(es: Seq[(Long, Long)], parts: Int = 4): LinkGraph =
    LinkGraph.fromSeq(s, es.map { case (a, b) => Edge(a, b, 1.0) }, parts)

  /** Two 4-cliques joined by a bridge, plus a dangling triangle whose edge
    * into the clique is NOT in any triangle — the peel must cascade: the
    * bridge dies in round 1, nothing else. */
  private val cliques: Seq[(Long, Long)] =
    Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (6L, 8L), (7L, 8L),
      (4L, 5L), // bridge
      (10L, 11L), (10L, 12L), (11L, 12L), (4L, 10L)) // triangle + pendant

  test("3-truss: survivors each in ≥1 triangle; bridge and pendant peeled") {
    val got = KTruss.edges(graphOf(cliques), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (6L, 8L), (7L, 8L),
      (10L, 11L), (10L, 12L), (11L, 12L))
    assert(got.keySet === want)
    assert(got.forall(_._2 >= 1), "every survivor supported")
    // clique edges sit in exactly 2 triangles, the dangling triangle's in 1
    assert(got((1L, 2L)) === 2L && got((10L, 11L)) === 1L)
  }

  test("4-truss: cascade kills the triangle, keeps the cliques") {
    val got = KTruss.edges(graphOf(cliques), 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val clique = Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (6L, 8L), (7L, 8L))
    assert(got === clique)
    // 5-truss of this graph is empty (4-cliques have support 2)
    assert(KTruss.edges(graphOf(cliques), 5).count() === 0L)
  }

  test("modularity closed forms: two disjoint triangles, and one blob") {
    val twoTri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
    val g = graphOf(twoTri)
    val perfect = g.vertices.select(col("id"),
      when(col("id") <= 3, 1L).otherwise(2L).as("label"))
    val r = Modularity.score(g, perfect).head()
    // m=6, each community: e=3, d=6 → Q = 2·(3/6 − (6/12)²) = 0.5
    assert(r.getLong(0) === 6L && r.getLong(1) === 2L)
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-6)
    // everything in one community → Q = 1 − 1 = 0
    val one = g.vertices.select(col("id"), lit(1L).as("label"))
    assert(math.abs(Modularity.score(g, one).head().getDouble(2)) < 1e-6)
  }
}
