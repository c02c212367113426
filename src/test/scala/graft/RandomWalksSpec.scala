package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Edge, LinkGraph}
import graft.algos.RandomWalks

/** Walk-corpus laws the row-replay oracle can't see: every emitted step is a
  * real edge, sinks truncate, counts are exact, picks actually spread. */
class RandomWalksSpec extends AnyFunSuite {
  import SparkTestBase._
  lazy val s = spark

  private def graphOf(es: Seq[(Long, Long)], parts: Int = 4): LinkGraph =
    LinkGraph.fromSeq(s, es.map { case (a, b) => Edge(a, b, 1.0) }, parts)

  test("every consecutive (step t-1 -> t) pair is an edge of the graph") {
    val g = graphOf(testGraphEdges)
    val c = RandomWalks.corpus(g, walksPerVertex = 2, length = 5)
    val hops = c.as("a").join(c.as("b"),
        col("a.walk") === col("b.walk") && col("a.step") + 1 === col("b.step"))
      .select(col("a.v").as("src"), col("b.v").as("dst"))
    val edges = testGraphEdges.toSet
    val bad = hops.collect().filterNot(r => edges((r.getLong(0), r.getLong(1))))
    assert(bad.isEmpty, s"non-edges walked: ${bad.take(5).mkString(",")}")
  }

  test("deterministic and partition-invariant") {
    def rows(parts: Int) =
      RandomWalks.corpus(graphOf(testGraphEdges, parts), 2, 4)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(1) === rows(7))
  }

  test("walks stop at sinks; starts are exactly walksPerVertex x |V|") {
    // chain 1 -> 2 -> 3: vertex 3 is a sink
    val c = RandomWalks.corpus(graphOf(Seq((1L, 2L), (2L, 3L))), 3, 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(c.count(_._2 == 0) === 9) // 3 vertices x 3 walks
    // walks starting at 3 emit ONLY step 0
    assert(c.filter(_._1.startsWith("3#")).forall(_._2 == 0L))
    // walks from 1 deterministically reach 3 and stop at step 2
    assert(c.filter(_._1.startsWith("1#")).map(_._2).max === 2L)
    assert(c.count(_._1.startsWith("1#")) === 9) // 3 walks x steps 0,1,2
  }

  test("skip-gram pairs: exactly the within-window ordered pairs, offsets signed") {
    // chain 1 -> 2 -> 3: one walk visits 1,2,3 at steps 0,1,2
    val c = RandomWalks.corpus(graphOf(Seq((1L, 2L), (2L, 3L))), 1, 5)
    val pairs = RandomWalks.skipGramPairs(c, window = 1)
      .filter(col("center") =!= col("context") || col("offset") =!= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the walk from 1 contributes (1,2,+1),(2,1,-1),(2,3,+1),(3,2,-1);
    // the walk from 2 contributes (2,3,+1),(3,2,-1) again (set-collapsed)
    assert(pairs === Set((1L, 2L, 1L), (2L, 1L, -1L), (2L, 3L, 1L), (3L, 2L, -1L)))
  }

  test("picks spread over a hub's out-neighbors") {
    val star = graphOf((1L to 40L).map(l => (0L, l)))
    val firstHops = RandomWalks.corpus(star, walksPerVertex = 8, length = 1)
      .filter(col("step") === 1 && col("walk").startsWith("0#"))
      .collect().map(_.getLong(2)).toSet
    assert(firstHops.size >= 4, s"8 walks collapsed onto $firstHops")
  }
}
