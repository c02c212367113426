package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorArith._
import graft.functions.VectorLSum.vector_lsum

/** Native elementwise vector algebra — must be BIT-identical to the
  * zip_with/transform/aggregate higher-order forms it replaces in the
  * LDA/SGD hot paths. */
class VectorArithSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def u(id: Long, k: Int): Double =
    (((id * 2654435761L + k * 40503L) % 10007L).toDouble - 5000.0) / 997.0

  private lazy val df = (1L to 200L).map(i =>
    (i, Array.tabulate(20)(k => u(i, k)), Array.tabulate(20)(k => u(i + 5, k) + 8.0)))
    .toDF("id", "a", "b").repartition(3)

  private def bits(d: Double) = java.lang.Double.doubleToLongBits(d)

  test("array-array ops bit-match zip_with") {
    val pairs = Seq(
      vector_add($"a", $"b") -> zip_with($"a", $"b", _ + _),
      vector_sub($"a", $"b") -> zip_with($"a", $"b", _ - _),
      vector_mul($"a", $"b") -> zip_with($"a", $"b", _ * _),
      vector_div($"a", $"b") -> zip_with($"a", $"b", _ / _))
    for (((fast, slow), i) <- pairs.zipWithIndex) {
      val rows = df.select($"id", fast.as("f"), slow.as("s")).collect()
      for (r <- rows; k <- 0 until 20)
        assert(bits(r.getSeq[Double](1)(k)) == bits(r.getSeq[Double](2)(k)),
          s"op#$i id=${r.getLong(0)} k=$k")
    }
  }

  test("array-scalar ops bit-match transform, including non-commutative ones") {
    val s = $"id".cast("double") / 7.0
    val pairs = Seq(
      vector_add($"a", s) -> transform($"a", x => x + s),
      vector_sub($"a", s) -> transform($"a", x => x - s),
      vector_mul($"a", s) -> transform($"a", x => x * s),
      vector_div($"a", s) -> transform($"a", x => x / s))
    for (((fast, slow), i) <- pairs.zipWithIndex) {
      val rows = df.select($"id", fast.as("f"), slow.as("s")).collect()
      for (r <- rows; k <- 0 until 20)
        assert(bits(r.getSeq[Double](1)(k)) == bits(r.getSeq[Double](2)(k)),
          s"op#$i id=${r.getLong(0)} k=$k")
    }
  }

  test("vector_lsum bit-matches the aggregate left fold; empty array is 0") {
    val rows = df.select($"id", vector_lsum($"a").as("f"),
      aggregate($"a", lit(0.0), _ + _).as("s")).collect()
    for (r <- rows) assert(bits(r.getDouble(1)) == bits(r.getDouble(2)))
    val e = Seq((1L, Array.empty[Double])).toDF("id", "v")
      .select(vector_lsum($"v")).head().getDouble(0)
    assert(e == 0.0)
  }

  test("null semantics: null array -> null; null element -> null element / null sum") {
    val d2 = Seq(
      (1L, Some(Seq[Option[Double]](Some(1.0), None)), Some(Seq[Option[Double]](Some(2.0), Some(3.0)))),
      (2L, None, Some(Seq[Option[Double]](Some(1.0), Some(1.0))))
    ).toDF("id", "a", "b")
    val r1 = d2.filter($"id" === 1).select(vector_mul($"a", $"b")).head().getSeq[Any](0)
    assert(r1(0) == 2.0 && r1(1) == null)
    assert(d2.filter($"id" === 2).select(vector_mul($"a", $"b")).head().isNullAt(0))
    assert(d2.filter($"id" === 1).select(vector_lsum($"a")).head().isNullAt(0))
  }

  test("length mismatch pads with null like zip_with") {
    val d2 = Seq((1L, Array(1.0, 2.0, 3.0), Array(10.0))).toDF("id", "a", "b")
    val fast = d2.select(vector_add($"a", $"b")).head().getSeq[Any](0)
    val slow = d2.select(zip_with($"a", $"b", _ + _)).head().getSeq[Any](0)
    assert(fast == slow && fast.length == 3 && fast(0) == 11.0 && fast(1) == null)
  }

  test("interpreted path agrees with codegen") {
    def run() = df.select(sum(vector_lsum(vector_mul(vector_add($"a", lit(0.25)), $"b"))))
      .head().getDouble(0)
    val cg = run()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    val prevF = spark.conf.get("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(bits(run()) == bits(cg))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", prevF)
    }
  }

  test("SQL registration: vector_mul and vector_lsum callable") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT vector_lsum(vector_mul(array(1.0d, 2.0d), array(3.0d, 4.0d))) AS s")
      .head().getDouble(0)
    assert(r == 11.0)
  }
}
