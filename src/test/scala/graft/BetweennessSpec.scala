package graft

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Edge, LinkGraph}
import graft.algos.Betweenness

/** Batched-Brandes parity against a sequential reference — the g_betweenness
  * gate only sees the chain fixture's closed form (sigma = 1 everywhere), so
  * these pin the path-counting and dependency machinery on shapes the gate
  * graph doesn't contain: diamonds (sigma > 1), cycles, merges, unreachable
  * regions, and partition invariance. */
class BetweennessSpec extends AnyFunSuite {
  import SparkTestBase._
  lazy val s = spark

  private def graphOf(es: Seq[(Long, Long)], parts: Int = 4): LinkGraph =
    LinkGraph.fromSeq(s, es.map { case (a, b) => Edge(a, b, 1.0) }, parts)

  /** Sequential Brandes restricted to `sources` (directed, unit weights). */
  private def brute(es: Seq[(Long, Long)], sources: Seq[Long]): Map[Long, Double] = {
    val vs = es.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val bc = mutable.Map.empty[Long, Double].withDefaultValue(0.0)
    for (src <- sources if vs.contains(src)) {
      val dist = mutable.Map.empty[Long, Int]
      val sigma = mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      val preds = mutable.Map.empty[Long, mutable.ArrayBuffer[Long]]
      dist(src) = 0; sigma(src) = 1.0
      val order = mutable.ArrayBuffer.empty[Long]
      val q = mutable.Queue(src)
      while (q.nonEmpty) {
        val v = q.dequeue(); order += v
        for (w <- adj.getOrElse(v, Nil)) {
          if (!dist.contains(w)) { dist(w) = dist(v) + 1; q.enqueue(w) }
          if (dist(w) == dist(v) + 1) {
            sigma(w) += sigma(v)
            preds.getOrElseUpdate(w, mutable.ArrayBuffer.empty) += v
          }
        }
      }
      val delta = mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      for (w <- order.reverse; v <- preds.getOrElse(w, Nil))
        delta(v) += sigma(v) / sigma(w) * (1 + delta(w))
      for (v <- vs if v != src) bc(v) += delta(v)
    }
    vs.map(v => v -> bc(v)).toMap
  }

  private def run(es: Seq[(Long, Long)], sources: Seq[Long],
                  parts: Int = 4): Map[Long, Double] =
    Betweenness.run(graphOf(es, parts), sources).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def check(es: Seq[(Long, Long)], sources: Seq[Long], parts: Int = 4): Unit = {
    val got = run(es, sources, parts)
    val want = brute(es, sources)
    assert(got.keySet === want.keySet)
    for ((v, w) <- want)
      assert(math.abs(got(v) - w) < 1e-9, s"vertex $v: got ${got(v)}, want $w")
  }

  test("chain: interior vertices carry len - pos") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    check(es, Seq(1L))
    val got = run(es, Seq(1L))
    assert(got(2L) === 3.0 && got(3L) === 2.0 && got(4L) === 1.0)
    assert(got(1L) === 0.0 && got(5L) === 0.0)
  }

  test("diamond splits path counts (sigma = 2)") {
    // 1 -> {2,3} -> 4 -> 5: delta(4) = (2/2)(1+0) = 1 (both s→5 paths pass
    // through 4 but are pair-normalized), delta(2) = delta(3) = (1/2)(1+1) = 1
    val es = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    check(es, Seq(1L))
    val got = run(es, Seq(1L))
    assert(got(2L) === 1.0 && got(3L) === 1.0 && got(4L) === 1.0)
  }

  test("multiple sources accumulate; unreachable regions stay zero") {
    val es = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (20L, 21L))
    check(es, Seq(1L, 10L))
    val got = run(es, Seq(1L, 10L))
    assert(got(21L) === 0.0 && got(20L) === 0.0) // no sampled source reaches them
  }

  test("cycle: shortest paths wrap but never revisit") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 4L))
    check(es, Seq(1L, 3L))
  }

  test("merge then fan-out with asymmetric branch lengths") {
    val es = Seq((1L, 2L), (1L, 3L), (3L, 4L), (2L, 5L), (4L, 5L),
      (5L, 6L), (5L, 7L), (6L, 8L), (7L, 8L))
    check(es, Seq(1L, 2L, 3L))
  }

  test("partition invariance") {
    val es = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L), (5L, 6L),
      (2L, 6L), (6L, 7L), (9L, 1L))
    val a = run(es, Seq(9L, 2L), parts = 2)
    val b = run(es, Seq(9L, 2L), parts = 7)
    assert(a.keySet === b.keySet)
    for ((v, x) <- a) assert(math.abs(x - b(v)) < 1e-9)
    check(es, Seq(9L, 2L))
  }
}
