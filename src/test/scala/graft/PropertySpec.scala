package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Edge, LinkGraph}
import graft.algos.{ConnectedComponents, TriangleCount}

/** Property-style tests (SURVEY.md §5): algorithm results vs independent
  * oracles on seeded random graphs (the reference's random k-per-row
  * generator, made deterministic — `test/generator.h:73-105`). */
class PropertySpec extends AnyFunSuite {
  lazy val s = SparkTestBase.spark

  def randomGraphs(trials: Int): Seq[Seq[(Long, Long)]] =
    (1 to trials).map { t =>
      val rnd = new scala.util.Random(42 + t)
      val n = 2 + rnd.nextInt(24)
      val m = 1 + rnd.nextInt(50)
      (0 until m).map { _ =>
        (1L + rnd.nextInt(n), 1L + rnd.nextInt(n))
      }.filter(e => e._1 != e._2).distinct
    }.filter(_.nonEmpty)

  private def unionFind(es: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val vs = (es.map(_._1) ++ es.map(_._2)).distinct
    // canonical representative = min vertex id of the component
    val groups = vs.groupBy(find)
    groups.flatMap { case (_, members) =>
      val m = members.min; members.map(_ -> m)
    }.toMap
  }

  private def localTriangles(es: Seq[(Long, Long)]): Long = {
    val canon = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(p => p._1 != p._2).distinct.toSet
    val vs = (canon.map(_._1) ++ canon.map(_._2)).toSeq.distinct.sorted
    var t = 0L
    for {
      i <- vs; j <- vs if j > i && canon((i, j))
      k <- vs if k > j && canon((j, k)) && canon((i, k))
    } t += 1
    t
  }

  test("HashMin components equal union-find components on random graphs") {
    for (es <- randomGraphs(5)) {
      val g = LinkGraph.fromSeq(s, es.map { case (a, b) => Edge(a, b, 1.0) }, 3)
      val got = ConnectedComponents.run(g).state
        .select("id", "component").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === unionFind(es), s"edges: $es")
    }
  }

  test("triangle totals equal a brute-force local count on random graphs") {
    for (es <- randomGraphs(5)) {
      val g = LinkGraph.fromSeq(s, es.map { case (a, b) => Edge(a, b, 1.0) }, 3)
      assert(TriangleCount.total(g) === localTriangles(es), s"edges: $es")
    }
  }
}
