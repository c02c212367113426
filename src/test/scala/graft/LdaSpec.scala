package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{Edge, LinkGraph}
import graft.algos.Lda

class LdaSpec extends AnyFunSuite {
  lazy val s = SparkTestBase.spark

  // ratings7 fixture as the doc×term bipartite corpus (docs 1-4, terms 5-7)
  val corpus = Seq((1L, 5L, 1.0), (1L, 7L, 2.0), (2L, 5L, 2.0), (2L, 7L, 4.0),
                   (3L, 6L, 2.0), (3L, 7L, 3.0), (4L, 7L, 3.0))
  lazy val g = LinkGraph.fromSeq(s, corpus.map { case (a, b, w) => Edge(a, b, w) }, 4)
  lazy val types = Lda.typesByThreshold(g, ndoc = 4)

  test("init: per-vertex topic mass equals weighted degree (gamma rows are normalized)") {
    val st = Lda.init(g, types)
    val mass = st.select(col("id"), aggregate(col("n"), lit(0.0), _ + _).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val wdeg = corpus.flatMap { case (a, b, w) => Seq(a -> w, b -> w) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    for ((v, m) <- wdeg) assert(math.abs(mass(v) - m) < 1e-9, s"vertex $v")
  }

  test("lda iterations match a sequential fold with the same init and globalN schedule") {
    val iters = 3
    val alpha = 1.0; val eta = 5.0; val vocab = 3L
    val got = Lda.run(g, types, iters, alpha, eta, vocab)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getSeq[Double](2).toArray))).toMap

    // sequential oracle seeded with the engine's OWN init state
    val K = Lda.K
    var n = Lda.init(g, types).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](3).toArray).toMap
    val typeOf = Map(1L -> 'd', 2L -> 'd', 3L -> 'd', 4L -> 'd',
                     5L -> 'w', 6L -> 'w', 7L -> 'w')
    val undirected = corpus.flatMap { case (u, v, w) => Seq((u, v, w), (v, u, w)) }
    for (_ <- 0 until iters) {
      val gN = new Array[Double](K)
      for ((v, arr) <- n; if typeOf(v) == 'w'; k <- 0 until K) gN(k) += arr(k)
      val acc = scala.collection.mutable.Map[Long, Array[Double]]()
      for ((snd, rcv, w) <- undirected) {
        val msg = n(snd); val mine = n(rcv)
        val (my, oth) = if (typeOf(rcv) == 'd') (alpha, eta) else (eta, alpha)
        val gam = Array.tabulate(K)(k =>
          (mine(k) + my - 1.0) * (msg(k) + oth - 1.0) / (gN(k) + vocab * (eta - 1.0)))
        val sum = gam.sum
        val a = acc.getOrElseUpdate(rcv, new Array[Double](K))
        for (k <- 0 until K) a(k) += gam(k) / sum * w
      }
      n = n.map { case (v, cur) => v -> acc.getOrElse(v, cur) }
    }
    for (v <- typeOf.keys; k <- 0 until Lda.K)
      assert(math.abs(got(v)._2(k) - n(v)(k)) < 1e-9, s"vertex $v dim $k")
    assert(got(1L)._1 === "d" && got(7L)._1 === "w")
  }

  test("log-likelihood matches a sequential LDALLProgram fold on the final state") {
    val eta = 5.0; val vocab = 3L
    val st = Lda.run(g, types, iterations = 2, vocabSize = vocab)
    val perWord = Lda.tokenLogLik(g, st, eta, vocab)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val total = Lda.logLikelihood(g, st, eta, vocab)

    // sequential oracle: LDALLProgram semantics (`src/LDA.cpp:196-250`) —
    // along each stored doc→word edge, phi from the receiver (word) against
    // the smoothed post-run global vector, theta from the sender (doc,
    // η-offset as the reference), token contribution = count·ln(Σ phi·theta)
    val K = Lda.K
    val n = st.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2).toArray).toMap
    val gN = new Array[Double](K)
    for ((v, arr) <- n; if v >= 5L; k <- 0 until K) gN(k) += arr(k)
    val nkS = gN.map(_ + vocab * (eta - 1.0))
    val want = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
    for ((d, w, cnt) <- corpus) {
      val theta = n(d).map(_ + (eta - 1.0))
      val thetaSum = theta.sum
      val dot = (0 until K).map(k => (n(w)(k) + (eta - 1.0)) / nkS(k) * theta(k) / thetaSum).sum
      want(w) += cnt * math.log(dot)
    }
    for ((w, ll) <- want) assert(math.abs(perWord(w) - ll) < 1e-9, s"word $w")
    assert(perWord.keySet === want.keySet) // docs receive nothing along OUT edges
    assert(math.abs(total - want.values.sum) < 1e-9)
    assert(total < 0.0)
  }
}
