package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Edge, LinkGraph}
import graft.algos.Mis

/** MIS laws the row-replay oracle can't see: independence (no two members
  * adjacent), maximality (every non-member has a member neighbor), greedy
  * determinism vs a sequential reference, partition invariance. */
class MisSpec extends AnyFunSuite {
  import SparkTestBase._
  lazy val s = spark

  private def graphOf(es: Seq[(Long, Long)], parts: Int = 4): LinkGraph =
    LinkGraph.fromSeq(s, es.map { case (a, b) => Edge(a, b, 1.0) }, parts)

  private def und(es: Seq[(Long, Long)]): Map[Long, Set[Long]] = {
    val pairs = es.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1)).distinct
    pairs.groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2).toSet }
  }

  /** Sequential greedy MIS in decreasing fixed-priority order — the unique
    * set Luby-with-fixed-priorities converges to. */
  private def greedyMis(es: Seq[(Long, Long)]): Set[Long] = {
    val adj = und(es)
    def p(id: Long): (Long, Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:p".getBytes("UTF-8"))
      (java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16), id)
    }
    val mis = scala.collection.mutable.Set.empty[Long]
    val excluded = scala.collection.mutable.Set.empty[Long]
    for (v <- adj.keys.toSeq.sortBy(p).reverse)
      if (!excluded(v)) { mis += v; excluded ++= adj(v) }
    mis.toSet
  }

  private val chainSkip: Seq[(Long, Long)] =
    (1L to 11L).map(i => (i, i + 1)) ++ (1L to 10L).map(i => (i, i + 2))

  test("independent, maximal, and equal to the sequential greedy set") {
    val star = (1L to 60L).map(i => (0L, i))
    for ((es, name) <- Seq((testGraphEdges, "ref"), (chainSkip, "chainSkip"),
                           (star, "star"))) {
      val adj = und(es)
      val got = Mis.membership(graphOf(es)).collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(got.keySet === adj.keySet, s"$name vertex set")
      val members = got.filter(_._2).keySet
      for (v <- members; u <- adj(v))
        assert(!members(u), s"$name: adjacent members $v,$u")
      for ((v, in) <- got if !in)
        assert(adj(v).exists(members), s"$name: $v has no member neighbor")
      assert(members === greedyMis(es), s"$name greedy parity")
    }
  }

  test("partition-count invariant") {
    def mis(parts: Int) = Mis.membership(graphOf(chainSkip, parts))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(mis(1) === mis(7))
  }
}
