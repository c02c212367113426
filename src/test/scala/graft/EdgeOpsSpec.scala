package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{Edge, EdgeOps}

class EdgeOpsSpec extends AnyFunSuite {
  lazy val s = SparkTestBase.spark
  import s.implicits._

  def df(es: (Long, Long, Double)*) = es.map { case (a, b, w) => Edge(a, b, w) }.toDF()

  test("removeSelfEdges / filterEdges / dimensions") {
    val e = df((1, 2, 1), (2, 2, 1), (3, 1, 5))
    assert(EdgeOps.removeSelfEdges(e).count() === 2)
    assert(EdgeOps.filterEdges(e, col("weight") > 2).count() === 1)
    assert(EdgeOps.dimensions(e) === (3L, 2L))
  }

  test("dedupEdges keeps one row per (src,dst) with min weight") {
    val got = EdgeOps.dedupEdges(df((1, 2, 5), (1, 2, 3), (2, 3, 1)))
      .as[Edge].collect().toSet
    assert(got === Set(Edge(1, 2, 3), Edge(2, 3, 1)))
  }

  test("bidirectional doubles rows; toDag canonicalizes them back") {
    val e = df((1, 2, 1), (3, 2, 1))
    val bi = EdgeOps.bidirectional(e)
    assert(bi.count() === 4)
    val dag = EdgeOps.toDag(bi).select("src", "dst").as[(Long, Long)].collect().toSet
    assert(dag === Set((1L, 2L), (2L, 3L)))
  }

  test("permuteIds preserves graph structure (degree multiset)") {
    val e = df((1, 2, 1), (1, 3, 1), (2, 3, 1), (3, 4, 1))
    val p = EdgeOps.permuteIds(e, seed = 7)
    def degMultiset(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("src").count().select("count").as[Long].collect().sorted.toSeq
    assert(degMultiset(p) === degMultiset(e))
    assert(p.select("src", "dst").distinct().count() === 4)
  }

  test("compactDstIds produces dense 1..k dst range; filterByRow rebases") {
    val e = df((1, 10, 1), (2, 20, 1), (3, 10, 1))
    val (remapped, mapping) = EdgeOps.compactDstIds(e)
    assert(remapped.select("dst").as[Long].collect().toSet === Set(1L, 2L))
    assert(mapping.count() === 2)
    val fr = EdgeOps.filterByRow(df((5, 1, 1), (6, 1, 1), (9, 1, 1)), 5, 8)
    assert(fr.select("src").as[Long].collect().toSet === Set(0L, 1L))
  }

  test("randomWeights / randomizeDirection are seeded-deterministic") {
    val e = df((1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1))
    val w1 = EdgeOps.randomWeights(e, 10, seed = 3).as[Edge].collect().toSet
    val w2 = EdgeOps.randomWeights(e, 10, seed = 3).as[Edge].collect().toSet
    assert(w1 === w2)
    assert(w1.forall(x => x.weight >= 1 && x.weight <= 10))
    val d1 = EdgeOps.randomizeDirection(e, seed = 3).as[Edge].collect().toSet
    val d2 = EdgeOps.randomizeDirection(e, seed = 3).as[Edge].collect().toSet
    assert(d1 === d2)
    // every edge survives as either original or swapped
    assert(d1.map(x => Set(x.src, x.dst)) === Set(Set(1L, 2L), Set(2L, 3L), Set(3L, 4L), Set(4L, 5L)))
  }
}
