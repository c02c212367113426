package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{Edge, LinkGraph}
import graft.algos.PageRank
import graft.engine.Reduce

/** North-rule skew machinery in the Column engine: degree-aware hub split in
  * the routing join (LinkGraph.joinAlong) and the salted two-phase ⊕. */
class SkewSpec extends AnyFunSuite {
  lazy val s = SparkTestBase.spark

  // planted hub: vertex 1 fans out to 4000 spokes, plus background chains
  private lazy val hubEdges =
    (2L to 4001L).map(d => Edge(1L, d, 1.0)) ++
      (0 until 40).flatMap(c =>
        (0 until 20).map(i => Edge(10000L + c * 100 + i, 10000L + c * 100 + i + 1, 1.0)))

  test("joinAlong splits a hub's edge list across partitions") {
    val split = LinkGraph.fromSeq(s, hubEdges, 8).copyWithHotDegree(100)
    val off = LinkGraph.fromSeq(s, hubEdges, 8).copyWithHotDegree(-1)
    assert(split.hotIds("src").toSeq === Seq(1L))
    assert(off.hotIds("src").isEmpty)

    def maxPartitionRows(g: LinkGraph): Long = {
      val msgs = g.vertices.select(col("id").as("_send"), lit(1.0).as("msg"))
      g.joinAlong(msgs, "src")
        .groupBy(spark_partition_id().as("p")).count()
        .agg(max("count")).head().getLong(0)
    }
    val balanced = maxPartitionRows(split)
    val skewed = maxPartitionRows(off)
    assert(skewed >= 4000L, s"without the split the hub should pin one partition, max=$skewed")
    assert(balanced < skewed / 2,
      s"hub split should halve the max routed partition (got $balanced vs $skewed)")
    split.unpersistAll(); off.unpersistAll()
  }

  test("hub split changes placement, not results: PageRank identical on/off") {
    val split = LinkGraph.fromSeq(s, hubEdges, 8).copyWithHotDegree(100)
    val off = LinkGraph.fromSeq(s, hubEdges, 8).copyWithHotDegree(-1)
    val a = PageRank.run(split, tol = -1.0, maxIterations = 6).state
      .select("id", "pagerank").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = PageRank.run(off, tol = -1.0, maxIterations = 6).state
      .select("id", "pagerank").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.keySet === b.keySet)
    for ((k, v) <- b) assert(math.abs(a(k) - v) < 1e-12, s"vertex $k")
    split.unpersistAll(); off.unpersistAll()
  }

  test("salted two-phase ⊕ equals the direct fold") {
    import s.implicits._
    // a hub receiver (_recv=7) with 5000 senders, plus scattered receivers
    val routed = ((1L to 5000L).map(i => (i, 7L, 1.0)) ++
      (1L to 100L).map(i => (i, i % 13, 2.0)))
      .toDF("_send", "_recv", "msg")
    val direct = Reduce.byAggs(sum("msg").as("acc"))(routed)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val salted = Reduce.saltedByAggs(16,
      partial = Seq(sum("msg").as("part")),
      merge = Seq(sum("part").as("acc")))(routed)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(salted === direct)
  }
}
