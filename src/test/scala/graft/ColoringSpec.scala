package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Edge, LinkGraph}
import graft.algos.Coloring

/** Jones–Plassmann laws the row-replay oracle can't see: properness (no
  * edge is monochromatic), completeness (no vertex left uncolored), exact
  * equality with the sequential greedy coloring in decreasing fixed-priority
  * order, and partition invariance. */
class ColoringSpec extends AnyFunSuite {
  import SparkTestBase._
  lazy val s = spark

  private def graphOf(es: Seq[(Long, Long)], parts: Int = 4): LinkGraph =
    LinkGraph.fromSeq(s, es.map { case (a, b) => Edge(a, b, 1.0) }, parts)

  private def und(es: Seq[(Long, Long)]): Map[Long, Set[Long]] = {
    val pairs = es.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1)).distinct
    pairs.groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2).toSet }
  }

  /** Sequential greedy coloring in decreasing fixed-priority order — the
    * unique coloring Jones–Plassmann with fixed priorities converges to:
    * each vertex takes mex(colors of already-colored neighbors). */
  private def greedyColors(es: Seq[(Long, Long)]): Map[Long, Int] = {
    val adj = und(es)
    def p(id: Long): (Long, Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:p".getBytes("UTF-8"))
      (java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16), id)
    }
    val colors = scala.collection.mutable.Map.empty[Long, Int]
    for (v <- adj.keys.toSeq.sortBy(p).reverse) {
      val used = adj(v).flatMap(colors.get)
      colors(v) = Iterator.from(0).find(!used(_)).get
    }
    colors.toMap
  }

  private val chainSkip: Seq[(Long, Long)] =
    (1L to 11L).map(i => (i, i + 1)) ++ (1L to 10L).map(i => (i, i + 2))

  test("proper, complete, and equal to the sequential greedy coloring") {
    val star = (1L to 60L).map(i => (0L, i))
    val clique = for (a <- 1L to 8L; b <- (a + 1) to 8L) yield (a, b)
    for ((es, name) <- Seq((testGraphEdges, "ref"), (chainSkip, "chainSkip"),
                           (star, "star"), (clique, "clique"))) {
      val adj = und(es)
      val got = Coloring.colors(graphOf(es)).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got.keySet === adj.keySet, s"$name vertex set")
      for ((v, c) <- got) assert(c >= 0, s"$name: $v uncolored")
      for (v <- adj.keys; u <- adj(v) if v < u)
        assert(got(v) != got(u), s"$name: edge $v-$u monochromatic")
      assert(got === greedyColors(es), s"$name greedy parity")
    }
  }

  test("clique of k needs exactly k colors; star needs exactly 2") {
    val clique = for (a <- 1L to 8L; b <- (a + 1) to 8L) yield (a, b)
    assert(Coloring.colors(graphOf(clique)).collect()
      .map(_.getInt(1)).toSet === (0 until 8).toSet)
    val star = (1L to 60L).map(i => (0L, i))
    assert(Coloring.colors(graphOf(star)).collect()
      .map(_.getInt(1)).toSet === Set(0, 1))
  }

  test("partition-count invariant") {
    def cols(parts: Int) = Coloring.colors(graphOf(chainSkip, parts))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cols(1) === cols(7))
  }
}
