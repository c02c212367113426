package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorSum.vector_sum

/** Native elementwise array<double> aggregate — the ⊕ of the K-dimensional
  * vertex-state algorithms (LDA topic counts, SGD latent vectors). */
class VectorSumSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def u(id: Long, k: Int): Double = // deterministic pseudo-uniform
    ((id * 2654435761L + k * 40503L) % 10007L).toDouble / 10007.0

  test("vector_sum equals the explode->regroup fold on a seeded table") {
    val rows = for (g <- 1L to 17L; r <- 0L until (g % 5 + 1))
      yield (g, Array.tabulate(20)(k => u(g * 31 + r, k)))
    val df = rows.toDF("id", "v").repartition(4)

    val fast = df.groupBy("id").agg(vector_sum($"v").as("n"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val slow = df.select($"id", posexplode($"v").as(Seq("k", "x")))
      .groupBy("id", "k").agg(sum("x").as("x"))
      .groupBy("id")
      .agg(transform(array_sort(collect_list(struct($"k", $"x"))),
        s => s.getField("x")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

    assert(fast.keySet == slow.keySet)
    for (id <- fast.keySet; k <- 0 until 20)
      assert(math.abs(fast(id)(k) - slow(id)(k)) < 1e-12,
        s"id=$id k=$k: ${fast(id)(k)} vs ${slow(id)(k)}")
  }

  test("null rows are ignored; an all-null group yields null") {
    val df = Seq(
      (1L, Some(Array(1.0, 2.0))),
      (1L, None),
      (1L, Some(Array(0.5, 0.25))),
      (2L, None)
    ).toDF("id", "v")
    val got = df.groupBy("id").agg(vector_sum($"v").as("n"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    assert(got(1L) == Seq(1.5, 2.25))
    assert(got(2L) == null)
  }

  test("global (no-group) aggregate over many partitions merges buffers") {
    val df = (1L to 1000L).map(i => (i, Array(1.0, 2.0, 3.0)))
      .toDF("id", "v").repartition(7)
    val r = df.agg(vector_sum($"v")).head().getSeq[Double](0)
    assert(r == Seq(1000.0, 2000.0, 3000.0))
  }

  test("mixed array lengths in one group throw, never truncate") {
    val df = Seq((1L, Array(1.0, 2.0)), (1L, Array(1.0))).toDF("id", "v")
    val e = intercept[Exception] {
      df.groupBy("id").agg(vector_sum($"v")).collect()
    }
    def causes(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => c.getMessage != null &&
        c.getMessage.contains("mixed array lengths")))
  }
}
