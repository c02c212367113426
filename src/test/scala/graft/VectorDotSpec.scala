package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorDot.vector_dot

/** Native codegen'd dot product — must be BIT-identical to the
  * `aggregate(zip_with(...))` left fold the oracle gates replay. */
class VectorDotSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def u(id: Long, k: Int): Double =
    (((id * 2654435761L + k * 40503L) % 10007L).toDouble - 5000.0) / 997.0

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("bit-identical to the zip_with+aggregate fold on float arrays") {
    val rows = (1L to 300L).map(i =>
      (i, Array.tabulate(64)(k => u(i, k).toFloat), Array.tabulate(64)(k => u(i + 7, k).toFloat)))
    val df = rows.toDF("id", "a", "b").repartition(4)
    val got = df.select($"id", vector_dot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = df.select($"id", hofDot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (i <- 1L to 300L)
      assert(java.lang.Double.doubleToLongBits(got(i)) ==
        java.lang.Double.doubleToLongBits(want(i)), s"row $i: ${got(i)} vs ${want(i)}")
  }

  test("bit-identical on double arrays; mixed float/double sides work") {
    val rows = (1L to 100L).map(i =>
      (i, Array.tabulate(20)(k => u(i, k)), Array.tabulate(20)(k => u(i + 3, k).toFloat)))
    val df = rows.toDF("id", "a", "b")
    val got = df.select($"id", vector_dot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = df.select($"id", hofDot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (i <- 1L to 100L)
      assert(java.lang.Double.doubleToLongBits(got(i)) ==
        java.lang.Double.doubleToLongBits(want(i)))
  }

  test("null input, length mismatch, and null element all yield null") {
    val df = Seq(
      (1L, Some(Seq[Option[Double]](Some(1.0), Some(2.0))), Some(Seq[Option[Double]](Some(3.0), Some(4.0)))),
      (2L, None, Some(Seq[Option[Double]](Some(1.0)))),
      (3L, Some(Seq[Option[Double]](Some(1.0))), Some(Seq[Option[Double]](Some(1.0), Some(2.0)))),
      (4L, Some(Seq[Option[Double]](Some(1.0), None)), Some(Seq[Option[Double]](Some(1.0), Some(2.0))))
    ).toDF("id", "a", "b")
    val got = df.select($"id", vector_dot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got(1L) == 11.0)
    assert(got(2L) == null)
    assert(got(3L) == null)
    assert(got(4L) == null)
  }

  test("survives codegen AND interpreted paths with equal results") {
    val df = (1L to 50L).map(i =>
      (i, Array.tabulate(8)(k => u(i, k)), Array.tabulate(8)(k => u(i + 1, k))))
      .toDF("id", "a", "b")
    def run() = df.select(sum(vector_dot($"a", $"b"))).head().getDouble(0)
    val cg = run()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    val prevF = spark.conf.get("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(java.lang.Double.doubleToLongBits(run()) ==
        java.lang.Double.doubleToLongBits(cg))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", prevF)
    }
  }

  test("SQL registration: vector_dot callable after GraftFunctions.register") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql("SELECT vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(r == 11.0)
  }
}
