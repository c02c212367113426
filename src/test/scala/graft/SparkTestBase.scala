package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (sbt forks one JVM for tests). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The reference's `data/test.bin.mtx` as a literal — 8 vertices, 13
    * unit-weight edges (FIXTURES.md §2, decoded from the binary fixture). */
  val testGraphEdges: Seq[(Long, Long)] = Seq(
    (1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (3L, 6L), (3L, 8L),
    (4L, 5L), (4L, 6L), (4L, 7L), (5L, 7L), (6L, 7L), (6L, 8L))

  /** In-test oracle replicating GraphMat PageRank semantics exactly
    * (`src/PageRank.cpp`): init 0.3; pr' = α+(1−α)Σ pr/outdeg applied only to
    * message receivers; stop when no vertex moves > tol. Sequential fold. */
  def refPageRank(edges: Seq[(Long, Long)], alpha: Double = 0.3,
                  tol: Double = 1e-5): Map[Long, Double] = {
    val vs = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val outDeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size }
    val inEdges = edges.groupBy(_._2)
    var pr = vs.map(_ -> 0.3).toMap
    var done = false
    while (!done) {
      val next = vs.map { v =>
        inEdges.get(v) match {
          case Some(es) =>
            v -> (alpha + (1 - alpha) * es.map { case (u, _) => pr(u) / outDeg(u) }.sum)
          case None => v -> pr(v)
        }
      }.toMap
      done = vs.forall(v => math.abs(next(v) - pr(v)) <= tol)
      pr = next
    }
    pr
  }
}
