package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Edge, LinkGraph}
import graft.algos.Matching

/** Matching laws the row-replay oracle can't see: it IS a matching
  * (symmetric, degree ≤ 1), maximal (no edge between two unmatched
  * vertices), equal to the sequential greedy matching in descending
  * edge-key order, and partition invariant. */
class MatchingSpec extends AnyFunSuite {
  import SparkTestBase._
  lazy val s = spark

  private def graphOf(es: Seq[(Long, Long)], parts: Int = 4): LinkGraph =
    LinkGraph.fromSeq(s, es.map { case (a, b) => Edge(a, b, 1.0) }, parts)

  private def canon(es: Seq[(Long, Long)]): Seq[(Long, Long)] =
    es.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct

  /** The engine's edge key: pri16·2^40 + a·2^20 + b. */
  private def key(a: Long, b: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$a:$b:m".getBytes("UTF-8"))
    val pri = java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16) % 65536L
    pri * 1099511627776L + a * 1048576L + b
  }

  /** Sequential greedy matching scanning edges in descending key order —
    * the unique matching locally-dominant handshaking converges to. */
  private def greedyMatching(es: Seq[(Long, Long)]): Map[Long, Long] = {
    val taken = scala.collection.mutable.Map.empty[Long, Long]
    for ((a, b) <- canon(es).sortBy { case (a, b) => -key(a, b) })
      if (!taken.contains(a) && !taken.contains(b)) { taken(a) = b; taken(b) = a }
    taken.toMap
  }

  private val chainSkip: Seq[(Long, Long)] =
    (1L to 11L).map(i => (i, i + 1)) ++ (1L to 10L).map(i => (i, i + 2))

  test("matching, maximal, and equal to the sequential greedy matching") {
    val star = (1L to 60L).map(i => (0L, i))
    for ((es, name) <- Seq((testGraphEdges, "ref"), (chainSkip, "chainSkip"),
                           (star, "star"))) {
      val got = Matching.pairs(graphOf(es)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val adj = canon(es).flatMap(e => Seq(e, e.swap)).groupBy(_._1)
        .map { case (v, ns) => v -> ns.map(_._2).toSet }
      assert(got.keySet === adj.keySet, s"$name vertex set")
      for ((v, m) <- got if m != -1L)
        assert(got(m) === v && adj(v).contains(m), s"$name: $v->$m not symmetric")
      for ((v, m) <- got if m == -1L)
        assert(adj(v).forall(u => got(u) != -1L), s"$name: $v unmatched with unmatched neighbor")
      val want = greedyMatching(es)
      assert(got.filter(_._2 != -1L) === want, s"$name greedy parity")
    }
  }

  test("partition-count invariant") {
    def m(parts: Int) = Matching.pairs(graphOf(chainSkip, parts))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1) === m(7))
  }
}
