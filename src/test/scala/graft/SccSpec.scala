package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Edge, LinkGraph}
import graft.algos.Scc

/** SCC parity against a sequential Tarjan reference — the g_scc gate only
  * sees the bucket fixture's closed form, so these pin the refinement on
  * shapes the gate graph doesn't contain: nested/merged cycles, DAGs,
  * self-loops, adversarial id orderings, and partition invariance. */
class SccSpec extends AnyFunSuite {
  import SparkTestBase._
  lazy val s = spark

  private def graphOf(es: Seq[(Long, Long)], parts: Int = 4): LinkGraph =
    LinkGraph.fromSeq(s, es.map { case (a, b) => Edge(a, b, 1.0) }, parts)

  /** id -> min id of its SCC, via Tarjan (recursive; test graphs are small). */
  private def tarjan(es: Seq[(Long, Long)]): Map[Long, Long] = {
    val vs = (es.map(_._1) ++ es.map(_._2)).distinct
    val adj = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val index = scala.collection.mutable.Map.empty[Long, Int]
    val low = scala.collection.mutable.Map.empty[Long, Int]
    val onStack = scala.collection.mutable.Set.empty[Long]
    val stack = scala.collection.mutable.Stack.empty[Long]
    val out = scala.collection.mutable.Map.empty[Long, Long]
    var counter = 0
    def strong(v: Long): Unit = {
      index(v) = counter; low(v) = counter; counter += 1
      stack.push(v); onStack += v
      for (w <- adj.getOrElse(v, Nil)) {
        if (!index.contains(w)) { strong(w); low(v) = math.min(low(v), low(w)) }
        else if (onStack(w)) low(v) = math.min(low(v), index(w))
      }
      if (low(v) == index(v)) {
        val comp = scala.collection.mutable.ArrayBuffer.empty[Long]
        var w = -1L
        do { w = stack.pop(); onStack -= w; comp += w } while (w != v)
        val m = comp.min
        comp.foreach(out(_) = m)
      }
    }
    vs.foreach(v => if (!index.contains(v)) strong(v))
    out.toMap
  }

  /** Runs BOTH engines (column Scc.run + CSR Scc.runFast) and asserts their
    * partitions are bit-equal before returning — every shape in this spec
    * pins the fast path against the semantics reference for free. */
  private def sparkScc(es: Seq[(Long, Long)], parts: Int = 4): Map[Long, Long] = {
    val g = graphOf(es, parts)
    val slow = Scc.run(g).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = Scc.runFast(graphOf(es, parts)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === slow, "CSR runFast diverged from column-engine run")
    slow
  }

  test("pure DAG: every vertex its own component") {
    val es = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val got = sparkScc(es)
    assert(got === tarjan(es))
    assert(got.forall { case (v, c) => v == c })
  }

  test("two cycles bridged forward stay separate; bridged both ways merge") {
    val c1 = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val c2 = Seq((10L, 11L), (11L, 12L), (12L, 10L))
    val fwd = c1 ++ c2 :+ (3L, 10L)
    val gotFwd = sparkScc(fwd)
    assert(gotFwd === tarjan(fwd))
    assert(gotFwd(10L) === 10L && gotFwd(1L) === 1L)
    val both = fwd :+ (12L, 2L)
    val gotBoth = sparkScc(both)
    assert(gotBoth === tarjan(both))
    assert(gotBoth.values.toSet === Set(1L))
  }

  test("adversarial ids: min of the sink cycle smaller than sources") {
    // ids chosen so the global min (1) sits in the SINK component — round 1
    // colors everything with 1 forward but B differs, forcing refinement
    val es = Seq((7L, 8L), (8L, 7L), // source cycle {7,8}
      (7L, 5L), (8L, 6L),            // two parallel bridges
      (5L, 1L), (6L, 1L),            // into the sink cycle
      (1L, 2L), (2L, 1L))            // sink cycle {1,2}
    val got = sparkScc(es)
    assert(got === tarjan(es))
    assert(got(7L) === 7L && got(2L) === 1L)
    assert(got(5L) === 5L && got(6L) === 6L)
  }

  test("self-loops and isolated-in-subgraph vertices") {
    val es = Seq((1L, 1L), (1L, 2L), (2L, 3L), (3L, 3L))
    assert(sparkScc(es) === tarjan(es))
  }

  test("md5-random digraph with a planted ring matches Tarjan") {
    def h(a: Long, b: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$a:$b:scc".getBytes("UTF-8"))
      java.lang.Byte.toUnsignedInt(md(0))
    }
    val n = 48L
    val ring = (0L until 12L).map(i => (i, (i + 1) % 12))
    val rand = for {
      a <- 0L until n; b <- 0L until n
      if a != b && h(a, b) < 16 // ~6% density
    } yield (a, b)
    val es = (ring ++ rand).distinct
    val want = tarjan(es)
    assert(sparkScc(es) === want)
    // the fixture must be non-trivial: at least one multi-vertex SCC and
    // at least one singleton
    val sizes = want.groupBy(_._2).map(_._2.size)
    assert(sizes.exists(_ > 1), "planted ring should survive or merge")
  }

  test("bucket-cycle shape (the gate graph in miniature) + partition invariance") {
    // two users of 23 events each -> buckets of 10/10/3 per user
    def bucketEdges(base: Long): Seq[(Long, Long)] = {
      val ids = (0 until 23).map(i => base + i)
      val bkts = ids.grouped(10).toSeq
      bkts.flatMap { b =>
        val cyc = b.zip(b.tail) ++ (if (b.size >= 2) Seq((b.last, b.head)) else Nil)
        val chords = b.zip(b.drop(2)) ++ b.zip(b.drop(4))
        cyc ++ chords
      } ++ bkts.map(_.head).zip(bkts.map(_.head).tail) // cross first->first
    }
    val es = bucketEdges(1000L) ++ bucketEdges(2000L)
    val want = tarjan(es)
    // closed form: scc = min of own bucket
    for (base <- Seq(1000L, 2000L); g <- (0 until 23).grouped(10))
      g.foreach(i => assert(want(base + i) === base + g.head))
    assert(sparkScc(es, 4) === want)
    assert(sparkScc(es, 7) === want)
  }
}
