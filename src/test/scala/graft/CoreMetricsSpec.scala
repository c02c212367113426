package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Edge, LinkGraph}
import graft.algos._

/** Local clustering coefficient, k-core peel, and personalized PageRank
  * against sequential brute-force references (the driver gates cover the
  * DuckDB twins; these cover the hard cases — peel cascades, k sweeps). */
class CoreMetricsSpec extends AnyFunSuite {
  import SparkTestBase._
  lazy val s = spark

  def graphOf(es: Seq[(Long, Long)], parts: Int = 4): LinkGraph =
    LinkGraph.fromSeq(s, es.map { case (a, b) => Edge(a, b, 1.0) }, parts)

  /** Undirected simple adjacency (no self-loops). */
  private def adj(es: Seq[(Long, Long)]): Map[Long, Set[Long]] = {
    val pairs = es.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1)).distinct
    pairs.groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2).toSet }
  }

  private def bruteCc(es: Seq[(Long, Long)]): Map[Long, Double] =
    adj(es).map { case (v, ns) =>
      val d = ns.size
      if (d < 2) v -> 0.0
      else {
        val links = ns.toSeq.combinations(2)
          .count { case Seq(a, b) => adj(es)(a).contains(b) }
        v -> 2.0 * links / (d * (d - 1.0))
      }
    }

  /** Sequential synchronous parallel peel: round r removes every survivor
    * whose degree among round-(r-1) survivors is < k. Returns the k-core. */
  private def brutePeel(es: Seq[(Long, Long)], k: Int): Set[Long] = {
    var alive = adj(es)
    var changed = true
    while (changed) {
      val keep = alive.filter { case (_, ns) => ns.count(alive.contains) >= k }.keySet
      changed = keep.size != alive.size
      alive = alive.filter { case (v, _) => keep(v) }
    }
    alive.keySet
  }

  private def brutePpr(es: Seq[(Long, Long)], sources: Set[Long],
                       iters: Int, alpha: Double = 0.3): Map[Long, Double] = {
    val vs = (es.map(_._1) ++ es.map(_._2)).distinct
    val outDeg = es.groupBy(_._1).map { case (u, e) => u -> e.size }
    val inE = es.groupBy(_._2)
    def sv(v: Long) = if (sources(v)) 1.0 else 0.0
    var pr = vs.map(v => v -> sv(v)).toMap
    for (_ <- 1 to iters) {
      pr = vs.map { v =>
        val in = inE.getOrElse(v, Nil).map { case (u, _) => pr(u) / outDeg(u) }.sum
        v -> (alpha * sv(v) + (1 - alpha) * in)
      }.toMap
    }
    pr
  }

  // chain 1..12 with skip edges i→i+2: the k=3 peel cascades one vertex per
  // round from each end (the case an unrolled oracle could never cover)
  private val chainSkip: Seq[(Long, Long)] =
    (1L to 11L).map(i => (i, i + 1)) ++ (1L to 10L).map(i => (i, i + 2))

  test("local clustering coefficient matches brute force (reference graph)") {
    val got = TriangleCount.localClustering(graphOf(testGraphEdges))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = bruteCc(testGraphEdges)
    assert(got.keySet === want.keySet)
    for ((v, c) <- want) assert(math.abs(got(v) - c) < 1e-12, s"vertex $v")
  }

  test("triangle participation sums to 3 x total") {
    val g = graphOf(testGraphEdges)
    val partSum = TriangleCount.participation(g)
      .agg(org.apache.spark.sql.functions.sum("triangles")).head().getLong(0)
    assert(partSum === 3L * TriangleCount.total(g))
  }

  test("k-core peel matches brute force across k (incl. cascading chain)") {
    for ((es, name) <- Seq((testGraphEdges, "ref"), (chainSkip, "chainSkip"));
         k <- 1 to 4) {
      val got = KCore.membership(graphOf(es), k).collect()
        .filter(_.getBoolean(1)).map(_.getLong(0)).toSet
      assert(got === brutePeel(es, k), s"$name k=$k")
    }
  }

  test("k=3 chain cascade peels to empty over many rounds (not one)") {
    val res = KCore.run(graphOf(chainSkip), 3)
    assert(res.state.filter(org.apache.spark.sql.functions.col("removed"))
      .count() === 12L)
    // the cascade is sequential: well more than one announce round ran
    assert(res.iterations >= 4, s"expected a multi-round cascade, got ${res.iterations}")
  }

  test("k-core is partition-count invariant") {
    val a = KCore.membership(graphOf(chainSkip, 1), 2).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val b = KCore.membership(graphOf(chainSkip, 7), 2).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(a === b)
  }

  test("personalized PageRank matches brute-force power iteration") {
    val sources = Set(1L, 5L)
    val got = PageRank.personalized(graphOf(testGraphEdges),
        org.apache.spark.sql.functions.col("id").isin(1L, 5L), iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = brutePpr(testGraphEdges, sources, 10)
    assert(got.keySet === want.keySet)
    for ((v, p) <- want) assert(math.abs(got(v) - p) < 1e-12, s"vertex $v")
  }

  test("CSR personalized PageRank == column engine (reference graph + planted hub source)") {
    import graft.engine.GatherScatter
    // hub 1 → 2..601 trips the hot split AND is itself a source, so its
    // teleport base must flow through the broadcast mirror; back-edges into
    // the hub make it a receiver too (both apply branches exercised)
    val hubEdges: Seq[(Long, Long)] =
      (2L to 601L).map(d => (1L, d)) ++
        Seq((602L, 1L), (603L, 602L), (603L, 604L), (605L, 1L))
    val cases = Seq(
      ("ref", testGraphEdges, Set(1L, 5L), 0L),
      ("hub", hubEdges, Set(1L, 604L), 100L))
    for ((name, es, sources, hotDeg) <- cases) {
      val g = graphOf(es)
      val want = PageRank.personalized(g,
          org.apache.spark.sql.functions.col("id").isin(sources.toSeq: _*),
          iterations = 10)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val built = GatherScatter.build(g, 4, hotDegree = hotDeg)
      if (name == "hub") assert(built.hotIds.toSeq === Seq(1L), "hub must be hot")
      val got = GatherScatter.toDF(s,
          GatherScatter.personalizedPageRank(built, sources, alpha = 0.3,
            iterations = 10))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.keySet === want.keySet, s"case $name")
      for ((v, p) <- want)
        assert(math.abs(got(v) - p) < 1e-12, s"case $name vertex $v")
      built.unpersist()
    }
  }

  test("PPR with an empty source set is identically zero") {
    val got = PageRank.personalized(graphOf(testGraphEdges),
        org.apache.spark.sql.functions.lit(false), iterations = 3)
      .collect().map(_.getDouble(1))
    assert(got.forall(_ == 0.0))
  }
}
