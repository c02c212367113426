package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.col

import graft.core.{Edge, LinkGraph}
import graft.engine.{GatherScatter, VectorSuperstep}
import graft.algos.{Lda, Sgd}

/** LDA on the 3-op vector kernel (VectorSuperstep.lda) against the column
  * engine's Lda program: same md5 gamma init, same per-iteration global
  * topic refresh, allclose topic-count vectors. */
class LdaCsrSpec extends AnyFunSuite {
  lazy val s = SparkTestBase.spark

  /** Deterministic doc-term counts: docs 1..nDocs, terms 1000000+t,
    * integer token counts 1..5, varying doc lengths. */
  def docTerm(nDocs: Int): Seq[Edge] =
    (1 to nDocs).flatMap { d =>
      (0 until 4 + d % 6).map { j =>
        val t = 1000000L + (d * 11 + j * 17) % (nDocs / 2 + 8)
        Edge(d.toLong, t, 1.0 + (d * 7 + t) % 5)
      }
    }

  def bidir(es: Seq[Edge]): Seq[Edge] =
    es ++ es.map(e => Edge(e.dst, e.src, e.weight))

  def columnN(es: Seq[Edge], iters: Int): Map[Long, Array[Double]] = {
    val g = LinkGraph.fromSeq(s, es, 4)
    val types = Lda.typesByThreshold(g, 999999L)
    val out = Lda.run(g, types, iterations = iters, gammaFn = Lda.gamma0Md5)
      .select(col("id"), col("n")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    g.unpersistAll()
    out
  }

  def csrN(es: Seq[Edge], iters: Int, nParts: Int, hotDegree: Long)
      : Map[Long, Array[Double]] = {
    val g = LinkGraph.fromSeq(s, bidir(es), nParts)
    val pg = GatherScatter.build(g, nParts, hotDegree = hotDegree, weighted = true)
    val blocks = VectorSuperstep.lda(pg, k = Lda.K, iterations = iters,
      termMinId = 1000000L, gammaInit = Sgd.md5InitScalar)
    val out = blocks.flatMap(b =>
      Iterator.range(0, b.ids.length).map(i =>
        b.ids(i) -> b.vecs.slice(i * b.k, (i + 1) * b.k))).collect().toMap
    blocks.unpersist(false)
    pg.unpersist()
    g.unpersistAll()
    out
  }

  def assertClose(a: Map[Long, Array[Double]], b: Map[Long, Array[Double]],
                  tol: Double): Unit = {
    assert(a.keySet === b.keySet)
    for ((id, va) <- a; (x, y) <- va.zip(b(id)))
      assert(math.abs(x - y) < tol * math.max(1.0, math.abs(y)),
        s"vertex $id: $x vs $y")
  }

  test("CSR 3-op LDA == column-engine LDA (init + 3 iterations, allclose)") {
    val es = docTerm(60)
    assertClose(csrN(es, 3, 4, hotDegree = -1L), columnN(es, 3), 1e-8)
  }

  test("hot-vertex split leaves LDA results unchanged (hub term, forced split)") {
    // a stopword-like term used by every doc: bidirectional degree makes it
    // hot under a small threshold, exercising the K-wide hub mirror in the
    // 3-op pass AND the init pass
    val es = docTerm(50) ++ (1 to 50).map(d => Edge(d.toLong, 1999999L, 2.0 + d % 3))
    val split = csrN(es, 2, 8, hotDegree = 30)
    val plain = csrN(es, 2, 8, hotDegree = -1L)
    assertClose(split, plain, 1e-9)
    assertClose(split, columnN(es, 2), 1e-8)
  }

  test("partition count does not change the topic counts (exchange correctness)") {
    val es = docTerm(45)
    assertClose(csrN(es, 2, 2, -1L), csrN(es, 2, 8, -1L), 1e-9)
  }

  test("per-vertex topic counts conserve token mass every iteration") {
    // each edge contributes `weight` total mass to each endpoint per pass,
    // so Σ_k n_k per vertex == Σ incident weights, init and after any pass
    val es = docTerm(40)
    val mass = es.flatMap(e => Seq(e.src -> e.weight, e.dst -> e.weight))
      .groupBy(_._1).map { case (id, ws) => id -> ws.map(_._2).sum }
    for (iters <- Seq(0, 2)) {
      val n = csrN(es, iters, 4, -1L)
      for ((id, vec) <- n)
        assert(math.abs(vec.sum - mass(id)) < 1e-6 * mass(id),
          s"vertex $id iters=$iters: ${vec.sum} vs ${mass(id)}")
    }
  }
}
