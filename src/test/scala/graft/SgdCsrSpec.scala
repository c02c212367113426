package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.col

import graft.core.{Edge, LinkGraph}
import graft.engine.{GatherScatter, VectorSuperstep}
import graft.algos.Sgd

/** The 3-op vector kernel (VectorSuperstep) against the column engine's
  * Sgd program: same init, same reference constants, allclose vectors. */
class SgdCsrSpec extends AnyFunSuite {
  lazy val s = SparkTestBase.spark

  /** Deterministic bipartite ratings: users 1..nU rate items 100000+i.
    * Degrees vary (user u rates 3 + u%8 items) so partitions are uneven. */
  def ratings(nU: Int): Seq[Edge] =
    (1 to nU).flatMap { u =>
      (0 until 3 + u % 8).map { j =>
        val item = 100000L + (u * 7 + j * 13) % (nU / 2 + 10)
        Edge(u.toLong, item, ((u * 31 + item * 17) % 50).toDouble / 10.0)
      }
    }

  def bidir(es: Seq[Edge]): Seq[Edge] =
    es ++ es.map(e => Edge(e.dst, e.src, e.weight))

  def columnLv(es: Seq[Edge], iters: Int): Map[Long, Array[Double]] = {
    val g = LinkGraph.fromSeq(s, es, 4)
    val res = Sgd.run(g, iterations = iters)
    val out = res.state.select(col("id"), col("lv")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    res.state.unpersist()
    g.unpersistAll()
    out
  }

  def csrLv(es: Seq[Edge], iters: Int, nParts: Int, hotDegree: Long)
      : Map[Long, Array[Double]] = {
    val g = LinkGraph.fromSeq(s, bidir(es), nParts)
    val pg = GatherScatter.build(g, nParts, hotDegree = hotDegree, weighted = true)
    val blocks = VectorSuperstep.sgd(pg, k = Sgd.K, iterations = iters,
      init = Sgd.initLv)
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
      assert(math.abs(x - y) < tol, s"vertex $id: $x vs $y")
  }

  test("CSR 3-op SGD == column-engine SGD (5 iterations, allclose)") {
    val es = ratings(120)
    assertClose(csrLv(es, 5, 4, hotDegree = -1L), columnLv(es, 5), 1e-9)
  }

  test("hot-vertex split leaves SGD results unchanged (hub item, forced split)") {
    // plant a hub item rated by everyone: its bidirectional out-degree makes
    // it hot under a tiny threshold, exercising the K-wide hub mirror
    val es = ratings(80) ++ (1 to 80).map(u => Edge(u.toLong, 99999L, (u % 10) / 2.0))
    val split = csrLv(es, 4, 8, hotDegree = 40)
    val plain = csrLv(es, 4, 8, hotDegree = -1L)
    assertClose(split, plain, 1e-9)
    assertClose(split, columnLv(es, 4), 1e-9)
  }

  test("partition count does not change the factorization (exchange correctness)") {
    val es = ratings(100)
    assertClose(csrLv(es, 3, 2, -1L), csrLv(es, 3, 8, -1L), 1e-9)
  }

  test("RMSE decreases over iterations on the CSR path (training sanity)") {
    val es = ratings(150)
    val g = LinkGraph.fromSeq(s, es, 4)
    def rmseAt(iters: Int): Double = {
      val lv = csrLv(es, iters, 4, -1L)
      val sq = es.map { e =>
        val d = e.weight - lv(e.src).zip(lv(e.dst)).map { case (a, b) => a * b }.sum
        d * d
      }.sum
      math.sqrt(sq / es.size)
    }
    // a tiny reference step size moves slowly; amplified by iteration count
    val r0 = rmseAt(1); val r10 = rmseAt(10)
    assert(r10 < r0, s"rmse did not decrease: $r0 -> $r10")
    g.unpersistAll()
  }
}
